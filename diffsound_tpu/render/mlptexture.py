"""Neural volumetric texture: position -> (kd, ks/orm, perturbed normal).

Replaces the reference's tinycudann HashGrid+MLP texture
(/root/reference/src/dmtet/render/mlptexture.py:18-104), which has no TPU
port, with a sin/cos positional-encoding MLP — the same encoder family
the repo's SDF network uses (geometry/sdf_mlp.py).  Dense layers map to
MXU matmuls; for render-time sampling the (H*W, features) batch is one
fused matmul chain.

Output channels (9): kd rgb, ks (occlusion, roughness, metallic),
tangent-space normal xyz; squashed into `min_max` with a sigmoid exactly
like the reference (mlptexture.py:68-73 `_MLP` + clamp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class MLPTexture3D:
    def __init__(
        self,
        aabb,
        channels: int = 9,
        freq_num: int = 6,
        hidden: int = 64,
        layers: int = 3,
        min_max=None,
    ):
        self.aabb = (np.asarray(aabb[0], np.float32), np.asarray(aabb[1], np.float32))
        self.channels = channels
        self.freq_num = freq_num
        self.hidden = hidden
        self.layers = layers
        if min_max is None:
            # kd in [0,1]^3, ks roughness/metallic in [0,1] (occlusion 0),
            # normal in [-1,1]^3 — the nvdiffrec defaults
            min_max = (
                np.array([0, 0, 0, 0, 0.08, 0, -1, -1, -1], np.float32)[:channels],
                np.array([1, 1, 1, 0, 1, 1, 1, 1, 1], np.float32)[:channels],
            )
        self.min_max = (np.asarray(min_max[0], np.float32), np.asarray(min_max[1], np.float32))

    def _encode(self, pos):
        lo = jnp.asarray(self.aabb[0])
        hi = jnp.asarray(self.aabb[1])
        x = (pos - lo) / (hi - lo) * 2.0 - 1.0  # [-1, 1]
        freqs = 2.0 ** jnp.arange(self.freq_num, dtype=pos.dtype) * jnp.pi
        ang = x[..., None] * freqs  # (..., 3, F)
        enc = jnp.concatenate(
            [x, jnp.sin(ang).reshape(*x.shape[:-1], -1), jnp.cos(ang).reshape(*x.shape[:-1], -1)],
            axis=-1,
        )
        return enc

    def in_dim(self):
        return 3 + 2 * 3 * self.freq_num

    def init_params(self, key, dtype=jnp.float32):
        dims = [self.in_dim()] + [self.hidden] * self.layers + [self.channels]
        params = []
        for i in range(len(dims) - 1):
            key, sub = jax.random.split(key)
            scale = jnp.sqrt(2.0 / dims[i])
            params.append(
                {
                    "w": jax.random.normal(sub, (dims[i], dims[i + 1]), dtype) * scale,
                    "b": jnp.zeros((dims[i + 1],), dtype),
                }
            )
        return params

    def sample(self, params, pos):
        """pos (..., 3) world -> (..., channels) in min_max range."""
        h = self._encode(pos)
        for i, lyr in enumerate(params):
            h = h @ lyr["w"] + lyr["b"]
            if i < len(params) - 1:
                h = jax.nn.relu(h)
        lo = jnp.asarray(self.min_max[0], h.dtype)
        hi = jnp.asarray(self.min_max[1], h.dtype)
        return jax.nn.sigmoid(h) * (hi - lo) + lo
