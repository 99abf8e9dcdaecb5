"""2D textures with differentiable trilinear mip sampling.

JAX counterpart of /root/reference/src/dmtet/render/texture.py:21-186.
The texture payload is a plain pytree (list of mip arrays) so it drops
into optax; sampling is bilinear within a mip and linear across mips,
with the mip level chosen from the screen-space UV derivative the
rasterizer provides (or an explicit bias).  The reference's custom
`texture2d_mip` autograd pair is unnecessary: avg-pool downsampling is
differentiable as written.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _to_nhwc(init) -> jnp.ndarray:
    a = jnp.asarray(init, jnp.float32)
    if a.ndim == 1:  # constant color
        a = a[None, None, :]
    if a.ndim == 3:
        return a
    if a.ndim == 4:  # NHWC with N=1
        return a[0]
    raise ValueError(f"invalid texture init shape {a.shape}")


def mip_chain(tex: jnp.ndarray, max_mips: Optional[int] = None):
    """(H, W, C) -> list of mips down to 1x1 (2x2 average pooling)."""
    mips = [tex]
    while min(mips[-1].shape[0], mips[-1].shape[1]) > 1:
        if max_mips is not None and len(mips) >= max_mips:
            break
        h, w, c = mips[-1].shape
        m = mips[-1][: h - h % 2, : w - w % 2].reshape(h // 2, 2, w // 2, 2, c)
        mips.append(jnp.mean(m, axis=(1, 3)))
    return mips


def sample_bilinear(tex: jnp.ndarray, uv: jnp.ndarray, clamp: bool = True):
    """tex (H, W, C), uv (..., 2) in [0, 1] -> (..., C)."""
    H, W, _ = tex.shape
    fu = uv[..., 0] * W - 0.5
    fv = uv[..., 1] * H - 0.5
    i0 = jnp.floor(fu).astype(jnp.int32)
    j0 = jnp.floor(fv).astype(jnp.int32)
    wu = (fu - i0)[..., None]
    wv = (fv - j0)[..., None]
    if clamp:
        i0c = jnp.clip(i0, 0, W - 1)
        i1c = jnp.clip(i0 + 1, 0, W - 1)
        j0c = jnp.clip(j0, 0, H - 1)
        j1c = jnp.clip(j0 + 1, 0, H - 1)
    else:  # wrap
        i0c, i1c = jnp.mod(i0, W), jnp.mod(i0 + 1, W)
        j0c, j1c = jnp.mod(j0, H), jnp.mod(j0 + 1, H)
    c00 = tex[j0c, i0c]
    c01 = tex[j0c, i1c]
    c10 = tex[j1c, i0c]
    c11 = tex[j1c, i1c]
    return (1 - wv) * ((1 - wu) * c00 + wu * c01) + wv * ((1 - wu) * c10 + wu * c11)


class Texture2D:
    """Immutable sampler over a pytree of mips.

    Construct with `Texture2D(init)` where init is a constant color (C,),
    an image (H, W, C), or a full custom mip list.  The *parameters* are
    whatever pytree you pass to `sample(params, ...)` — call
    `tex.params` for the initial value.
    """

    def __init__(self, init, min_max=None, auto_mips: bool = True):
        if isinstance(init, (list, tuple)):
            self.params = [jnp.asarray(m, jnp.float32) for m in init]
            self.auto_mips = False
        else:
            self.params = _to_nhwc(init)
            self.auto_mips = auto_mips
        self.min_max = min_max

    # -- static helpers usable with externally-held params ------------------

    @staticmethod
    def mips_of(params, auto_mips: bool):
        if isinstance(params, (list, tuple)):
            return list(params)
        return mip_chain(params) if auto_mips else [params]

    def sample(self, params, uv, uv_deriv=None, mip_bias: Optional[jnp.ndarray] = None):
        """Trilinear sample.  uv (..., 2); uv_deriv (..., 4) screen-space
        (du/dx, dv/dx, du/dy, dv/dy) from the rasterizer selects the mip;
        mip_bias (...) adds explicit mip offset (or replaces when
        uv_deriv is None)."""
        mips = self.mips_of(params, self.auto_mips)
        n = len(mips)
        if n == 1:
            return sample_bilinear(mips[0], uv)
        H, W, _ = mips[0].shape
        if uv_deriv is not None:
            du = uv_deriv[..., 0::2] * W  # pixels per screen-x/y in u
            dv = uv_deriv[..., 1::2] * H
            rho = jnp.sqrt(jnp.clip(jnp.maximum(
                jnp.sum(du * du, -1), jnp.sum(dv * dv, -1)
            ), 1e-20, None))
            level = jnp.log2(jnp.clip(rho, 1.0, None))
        else:
            level = jnp.zeros(uv.shape[:-1], uv.dtype)
        if mip_bias is not None:
            level = level + mip_bias
        level = jnp.clip(level, 0.0, n - 1.0)
        lo = jnp.clip(jnp.floor(level).astype(jnp.int32), 0, n - 1)
        frac = (level - lo.astype(level.dtype))[..., None]
        # static unrolled mip blend (n is small, ~log2(res))
        out_lo = jnp.zeros(uv.shape[:-1] + (mips[0].shape[-1],), mips[0].dtype)
        out_hi = out_lo
        for i, m in enumerate(mips):
            s = sample_bilinear(m, uv)
            out_lo = jnp.where((lo == i)[..., None], s, out_lo)
            out_hi = jnp.where((jnp.clip(lo + 1, 0, n - 1) == i)[..., None], s, out_hi)
        return out_lo * (1 - frac) + out_hi * frac

    def clamp(self, params):
        """Project params into min_max (apply between optimizer steps)."""
        if self.min_max is None:
            return params
        lo = jnp.asarray(self.min_max[0], jnp.float32)
        hi = jnp.asarray(self.min_max[1], jnp.float32)
        clip = lambda m: jnp.clip(m, lo, hi)
        if isinstance(params, (list, tuple)):
            return [clip(m) for m in params]
        return clip(params)


def srgb_texture(img: np.ndarray) -> np.ndarray:
    from .util import srgb_to_rgb

    return np.asarray(srgb_to_rgb(jnp.asarray(img, jnp.float32)))
