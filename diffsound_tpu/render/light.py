"""Split-sum environment light with trainable cubemap.

Counterpart of /root/reference/src/dmtet/render/light.py:43-158 (whose
`diffuse_cubemap` / `specular_cubemap` pre-integrations are CUDA kernels
with hand-written backwards, c_src/cubemap.cu).  TPU-first re-design:

  * The mip pyramid is differentiable average pooling.
  * Diffuse irradiance and the coarse GGX prefilters are **constant
    linear operators** applied to the (pooled) trainable cubemap — the
    direction-dependent weights depend only on texel geometry, so they
    are precomputed once as dense matrices and each pre-integration is a
    single (N_out, N_in) x (N_in, 3) matmul on the MXU with exact
    gradients.  No cutoff-bound machinery (the CUDA kernels' `cutoff`
    exists to bound thread work; a dense matmul doesn't care).
  * Fine specular mips (above `filter_res`) keep their box-filtered
    pyramid values: at the roughness those mips serve
    (~MIN_ROUGHNESS..0.2) the GGX lobe is at or below texel scale, so
    the explicit filter is within the pyramid's own approximation error.
  * The Karis FG LUT is computed at init by GGX importance-sampled
    quadrature (replacing the reference's opaque shipped binary
    data/irrmaps/bsdf_256_256.bin) and cached.

Params pytree: {"base": (6, R, R, 3)}.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .util import cubemap_directions, dot, reflect, safe_normalize, sample_cubemap


# ---------------------------------------------------------------------------
# Precomputed constant operators
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _diffuse_operator(res: int) -> np.ndarray:
    """(N, N) cosine-lobe irradiance operator on the res cubemap."""
    dirs, dw = cubemap_directions(res)
    d = dirs.reshape(-1, 3)
    w = dw.reshape(-1)
    cos = np.clip(d @ d.T, 0.0, None)  # (N, N)
    op = cos * w[None, :] / np.pi
    # normalize rows so a constant radiance field maps to itself
    op /= np.clip(op.sum(1, keepdims=True), 1e-9, None)
    return op.astype(np.float32)


@functools.lru_cache(maxsize=32)
def _ggx_operator(res: int, roughness: float) -> np.ndarray:
    """(N, N) GGX-NDF-weighted prefilter operator at one roughness."""
    dirs, dw = cubemap_directions(res)
    d = dirs.reshape(-1, 3)
    w = dw.reshape(-1)
    alpha = max(roughness * roughness, 1e-4)
    a2 = alpha * alpha
    cos = np.clip(d @ d.T, 0.0, 1.0)
    den = cos * cos * (a2 - 1.0) + 1.0
    ndf = a2 / (np.pi * den * den)
    op = ndf * cos * w[None, :]
    op /= np.clip(op.sum(1, keepdims=True), 1e-9, None)
    return op.astype(np.float32)


def _fg_lut_path():
    return os.path.join(os.path.expanduser("~/.cache"), "diffsound_fg_lut_256.npy")


@functools.lru_cache(maxsize=1)
def fg_lut(res: int = 256, num_samples: int = 1024) -> np.ndarray:
    """Karis split-sum FG term: (res, res, 2) over (NdotV, roughness).

    Standard GGX importance-sampled pre-integration (Karis 2013,
    "Real Shading in Unreal Engine 4"); replaces the reference's shipped
    bsdf_256_256.bin."""
    path = _fg_lut_path()
    if os.path.exists(path):
        try:
            lut = np.load(path)
            if lut.shape == (res, res, 2):
                return lut
        except Exception:
            pass

    i = np.arange(num_samples)
    # Hammersley sequence
    bits = i.astype(np.uint32)
    bits = (bits << 16) | (bits >> 16)
    bits = ((bits & 0x55555555) << 1) | ((bits & 0xAAAAAAAA) >> 1)
    bits = ((bits & 0x33333333) << 2) | ((bits & 0xCCCCCCCC) >> 2)
    bits = ((bits & 0x0F0F0F0F) << 4) | ((bits & 0xF0F0F0F0) >> 4)
    bits = ((bits & 0x00FF00FF) << 8) | ((bits & 0xFF00FF00) >> 8)
    xi = np.stack([i / num_samples, bits.astype(np.float64) * 2.3283064365386963e-10], -1)

    nv = (np.arange(res) + 0.5) / res  # NdotV
    rg = (np.arange(res) + 0.5) / res  # roughness
    lut = np.zeros((res, res, 2), np.float64)
    n = np.array([0.0, 0.0, 1.0])
    for j, r in enumerate(rg):
        a = max(r * r, 1e-4)
        # GGX importance sample of the half vector around +z
        phi = 2 * np.pi * xi[:, 0]
        ct = np.sqrt((1 - xi[:, 1]) / (1 + (a * a - 1) * xi[:, 1]))
        st = np.sqrt(np.clip(1 - ct * ct, 0, None))
        h = np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)  # (S, 3)
        for k, c in enumerate(nv):
            v = np.array([np.sqrt(max(1 - c * c, 0.0)), 0.0, c])
            l = 2 * (v @ h.T)[:, None] * h - v[None, :]
            n_dot_l = np.clip(l[:, 2], 0, None)
            n_dot_h = np.clip(h[:, 2], 1e-8, None)
            v_dot_h = np.clip(v @ h.T, 1e-8, None)
            mask = n_dot_l > 0
            # height-correlated Smith visibility (Karis's G_Vis form,
            # k_IBL = alpha / 2 with alpha = roughness^2)
            k_vis = a / 2.0
            g_v = c / (c * (1 - k_vis) + k_vis)
            g_l = n_dot_l / (n_dot_l * (1 - k_vis) + k_vis)
            g = g_v * g_l
            g_vis = g * v_dot_h / (n_dot_h * max(c, 1e-8))
            fc = (1 - v_dot_h) ** 5
            lut[k, j, 0] = np.sum(np.where(mask, (1 - fc) * g_vis, 0)) / num_samples
            lut[k, j, 1] = np.sum(np.where(mask, fc * g_vis, 0)) / num_samples
    lut = lut.astype(np.float32)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.save(path, lut)
    except OSError:
        pass
    return lut


# ---------------------------------------------------------------------------
# Environment light
# ---------------------------------------------------------------------------


def _avg_pool_cube(c):
    f, h, w, ch = c.shape
    return jnp.mean(c.reshape(f, h // 2, 2, w // 2, 2, ch), axis=(2, 4))


class EnvironmentLight:
    LIGHT_MIN_RES = 16
    MIN_ROUGHNESS = 0.08
    MAX_ROUGHNESS = 0.5

    def __init__(self, base_res: int = 64, filter_res: int = 32):
        self.base_res = base_res
        self.filter_res = min(filter_res, base_res)
        # mip resolutions: base .. LIGHT_MIN_RES
        self.mip_res = [base_res]
        while self.mip_res[-1] > self.LIGHT_MIN_RES:
            self.mip_res.append(self.mip_res[-1] // 2)
        self.n_mips = len(self.mip_res)

    def init_params(self, key, scale: float = 0.5, bias: float = 0.25):
        """Random trainable env map (light.py create_trainable_env_rnd)."""
        base = jax.random.uniform(key, (6, self.base_res, self.base_res, 3)) * scale + bias
        return {"base": base}

    @staticmethod
    def from_latlong(img, base_res: int = 64):
        from .util import latlong_to_cubemap

        light = EnvironmentLight(base_res)
        params = {"base": latlong_to_cubemap(jnp.asarray(img, jnp.float32), base_res)}
        return light, params

    def _mip_roughness(self, i: int) -> float:
        if i == self.n_mips - 1:
            return 1.0
        return (i / max(self.n_mips - 2, 1)) * (
            self.MAX_ROUGHNESS - self.MIN_ROUGHNESS
        ) + self.MIN_ROUGHNESS

    def build_mips(self, params):
        """-> (diffuse (6,16,16,3), specular mip list), differentiable."""
        mips = [params["base"]]
        for _ in range(self.n_mips - 1):
            mips.append(_avg_pool_cube(mips[-1]))

        def apply_op(op_np, cube):
            f, r, _, ch = cube.shape
            op = jnp.asarray(op_np)
            return (op @ cube.reshape(-1, ch)).reshape(f, r, r, ch)

        diffuse = apply_op(_diffuse_operator(self.mip_res[-1]), mips[-1])

        specular = []
        for i, m in enumerate(mips):
            r = self.mip_res[i]
            if r <= self.filter_res:
                specular.append(apply_op(_ggx_operator(r, self._mip_roughness(i)), m))
            else:
                specular.append(m)
        return diffuse, specular

    def get_mip(self, roughness):
        """Roughness -> fractional mip level (light.py get_mip)."""
        n = self.n_mips
        return jnp.where(
            roughness < self.MAX_ROUGHNESS,
            (jnp.clip(roughness, self.MIN_ROUGHNESS, self.MAX_ROUGHNESS) - self.MIN_ROUGHNESS)
            / (self.MAX_ROUGHNESS - self.MIN_ROUGHNESS)
            * (n - 2),
            (jnp.clip(roughness, self.MAX_ROUGHNESS, 1.0) - self.MAX_ROUGHNESS)
            / (1.0 - self.MAX_ROUGHNESS)
            + n - 2,
        )

    def regularizer(self, params):
        """White-balance regularizer (light.py:86-88)."""
        base = params["base"]
        white = jnp.mean(base, axis=-1, keepdims=True)
        return jnp.mean(jnp.abs(base - white))

    def shade(self, params, gb_pos, gb_normal, kd, ks, view_pos, specular: bool = True):
        """Image-space deferred shade (light.py:90-127).  All inputs
        (..., C); view_pos broadcastable to gb_pos."""
        wo = safe_normalize(view_pos - gb_pos)
        diffuse_cube, spec_mips = self.build_mips(params)

        if specular:
            roughness = ks[..., 1:2]
            metallic = ks[..., 2:3]
            spec_col = (1.0 - metallic) * 0.04 + kd * metallic
            diff_col = kd * (1.0 - metallic)
        else:
            diff_col = kd

        nrmvec = gb_normal
        reflvec = safe_normalize(reflect(wo, gb_normal))

        diffuse = sample_cubemap(diffuse_cube, nrmvec)
        shaded = diffuse * diff_col

        if specular:
            lut = jnp.asarray(fg_lut())
            n_dot_v = jnp.clip(dot(wo, gb_normal), 1e-4, None)
            from .texture import sample_bilinear

            fg_uv = jnp.concatenate([n_dot_v, roughness], axis=-1)
            fg = sample_bilinear(lut, fg_uv)

            miplevel = self.get_mip(roughness)[..., 0]
            lo = jnp.clip(jnp.floor(miplevel).astype(jnp.int32), 0, self.n_mips - 1)
            frac = (miplevel - lo.astype(miplevel.dtype))[..., None]
            spec_lo = jnp.zeros_like(shaded)
            spec_hi = jnp.zeros_like(shaded)
            for i, m in enumerate(spec_mips):
                s = sample_cubemap(m, reflvec)
                spec_lo = jnp.where((lo == i)[..., None], s, spec_lo)
                spec_hi = jnp.where(
                    (jnp.clip(lo + 1, 0, self.n_mips - 1) == i)[..., None], s, spec_hi
                )
            spec = spec_lo * (1 - frac) + spec_hi * frac
            reflectance = spec_col * fg[..., 0:1] + fg[..., 1:2]
            shaded = shaded + spec * reflectance

        return shaded * (1.0 - ks[..., 0:1])  # modulate by visibility/occlusion
