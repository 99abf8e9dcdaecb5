"""Deferred PBR render pipeline: rasterize -> interpolate -> shade ->
composite, plus UV-space texture baking.

Functional counterpart of /root/reference/src/dmtet/render/render.py
(shade :26-110, render_layer :112-181, render_mesh :187-255, render_uv
:257-275).  Differences are TPU-native by design: the rasterizer is the
static-shape JAX sweep in rasterize.py (layer peeling re-runs it behind a
depth floor), and antialiased silhouette gradients come from the
rasterizer's straight-through soft-coverage channel instead of
dr.antialias.  Materials and lights are (module, params) pairs so the
whole render is a pure function of a parameter pytree — jit/grad
compose over it untouched.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .bsdf import prepare_shading_normal
from .light import EnvironmentLight
from .mesh import Mesh, face_normals
from .rasterize import Rast, interpolate, interpolate_face, rasterize
from .util import safe_normalize, xfm_points


def shade(
    gb_pos,
    gb_geometric_normal,
    gb_normal,
    gb_tangent,
    gb_texc,
    view_pos,
    light: EnvironmentLight,
    light_params,
    material: dict,
    mat_params: dict,
    bsdf: Optional[str] = None,
    rng_key=None,
):
    """Pixel shader on interpolated G-buffers (render.py:26-110).
    Returns {'shaded', 'kd_grad', 'occlusion'} each (..., C+1) with alpha
    slot left to the caller."""
    perturbed_nrm = None
    if "kd_ks_normal" in material:
        mlp = material["kd_ks_normal"]
        p = mat_params["kd_ks_normal"]
        all_tex = mlp.sample(p, gb_pos)
        if rng_key is not None:
            jitter = gb_pos + 0.01 * jax.random.normal(rng_key, gb_pos.shape, gb_pos.dtype)
            all_tex_jitter = mlp.sample(p, jitter)
            kd_grad = (
                jnp.sum(jnp.abs(all_tex_jitter[..., :-6] - all_tex[..., :-6]), -1, keepdims=True)
                / 3
            )
        else:
            kd_grad = jnp.zeros_like(all_tex[..., :1])
        kd, ks, perturbed_nrm = all_tex[..., :-6], all_tex[..., -6:-3], all_tex[..., -3:]
    else:
        kd = material["kd"].sample(mat_params["kd"], gb_texc)
        ks = material["ks"].sample(mat_params["ks"], gb_texc)[..., 0:3]
        if "normal" in material:
            perturbed_nrm = material["normal"].sample(mat_params["normal"], gb_texc)
        if rng_key is not None:
            jitter = gb_texc + 0.005 * jax.random.normal(rng_key, gb_texc.shape, gb_texc.dtype)
            kd_jitter = material["kd"].sample(mat_params["kd"], jitter)
            kd_grad = (
                jnp.sum(jnp.abs(kd_jitter[..., 0:3] - kd[..., 0:3]), -1, keepdims=True) / 3
            )
        else:
            kd_grad = jnp.zeros_like(kd[..., :1])

    alpha = kd[..., 3:4] if kd.shape[-1] == 4 else jnp.ones_like(kd[..., 0:1])
    kd = kd[..., 0:3]

    if material.get("no_perturbed_nrm", False):
        perturbed_nrm = None

    gb_normal = prepare_shading_normal(
        gb_pos, view_pos, perturbed_nrm, gb_normal, gb_tangent, gb_geometric_normal,
        two_sided_shading=True, opengl=True,
    )

    bsdf_name = bsdf if bsdf is not None else material.get("bsdf", "pbr")
    if bsdf_name == "pbr":
        shaded_col = light.shade(light_params, gb_pos, gb_normal, kd, ks, view_pos, specular=True)
    elif bsdf_name == "diffuse":
        shaded_col = light.shade(light_params, gb_pos, gb_normal, kd, ks, view_pos, specular=False)
    elif bsdf_name == "normal":
        shaded_col = (gb_normal + 1.0) * 0.5
    elif bsdf_name == "tangent":
        shaded_col = (gb_tangent + 1.0) * 0.5
    elif bsdf_name == "kd":
        shaded_col = kd
    elif bsdf_name == "ks":
        shaded_col = ks
    else:
        raise ValueError(f"invalid bsdf '{bsdf_name}'")

    return {
        "shaded": jnp.concatenate([shaded_col, alpha], -1),
        "kd_grad": jnp.concatenate([kd_grad, alpha], -1),
        "occlusion": jnp.concatenate([ks[..., :1], alpha], -1),
    }


def render_layer(
    rast: Rast,
    mesh: Mesh,
    mat_params: dict,
    light: EnvironmentLight,
    light_params,
    view_pos,
    bsdf: Optional[str] = None,
    rng_key=None,
):
    """Interpolate G-buffers for one depth layer and shade it
    (render.py:112-181)."""
    tris = mesh.t_pos_idx
    gb_pos = interpolate(mesh.v_pos, rast, tris)
    fn = face_normals(mesh.v_pos, tris)
    gb_geom_nrm = interpolate_face(fn, rast)
    gb_normal = interpolate(mesh.v_nrm, rast, mesh.t_nrm_idx)
    if mesh.v_tng is not None:
        gb_tangent = interpolate(mesh.v_tng, rast, mesh.t_tng_idx)
    else:
        gb_tangent = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), gb_pos.shape)
    if mesh.v_tex is not None:
        gb_texc = interpolate(mesh.v_tex, rast, mesh.t_tex_idx)
    else:
        gb_texc = gb_pos[..., :2]
    return shade(
        gb_pos, gb_geom_nrm, gb_normal, gb_tangent, gb_texc,
        view_pos, light, light_params, mesh.material, mat_params, bsdf, rng_key,
    )


def render_mesh(
    mesh: Mesh,
    mat_params: dict,
    light: EnvironmentLight,
    light_params,
    mvp,
    view_pos,
    resolution: tuple,
    num_layers: int = 1,
    background=None,
    bsdf: Optional[str] = None,
    tri_mask=None,
    rng_key=None,
    soft_sigma: float = 1.0,
    spp: int = 1,
):
    """Depth-peeled render composited over a background
    (render.py:187-255).  Returns {'shaded','kd_grad','occlusion'} as
    (H, W, 4) buffers.

    spp > 1 supersamples: rasterize + shade at (H*spp, W*spp) and box-
    filter down (the reference's spp/msaa path, render.py:187-255 via
    util.scale_img_nhwc) — edge coverage then carries sub-pixel geometry
    gradients through the average, complementing the soft-coverage
    channel."""
    H, W = resolution
    if spp > 1:
        hi = render_mesh(
            mesh, mat_params, light, light_params, mvp, view_pos,
            (H * spp, W * spp), num_layers=num_layers,
            background=None if background is None
            else jnp.repeat(jnp.repeat(background, spp, 0), spp, 1),
            bsdf=bsdf, tri_mask=tri_mask, rng_key=rng_key,
            soft_sigma=soft_sigma * spp, spp=1,
        )
        return {
            k: v.reshape(H, spp, W, spp, v.shape[-1]).mean(axis=(1, 3))
            for k, v in hi.items()
        }
    v_clip = xfm_points(mesh.v_pos, jnp.asarray(mvp))
    view_pos = jnp.asarray(view_pos).reshape(1, 1, 3)

    rasts = rasterize(
        v_clip, mesh.t_pos_idx, resolution,
        tri_mask=tri_mask, num_layers=num_layers, soft_sigma=soft_sigma,
    )
    layers = []
    for i, r in enumerate(rasts):
        key_i = None
        if rng_key is not None:
            rng_key, key_i = jax.random.split(rng_key)
        layers.append(
            (render_layer(r, mesh, mat_params, light, light_params, view_pos, bsdf, key_i), r)
        )

    if background is None:
        background = jnp.zeros((H, W, 4), jnp.float32)
    else:
        if background.shape[-1] == 3:
            background = jnp.concatenate(
                [background, jnp.zeros_like(background[..., :1])], -1
            )

    out = {}
    for key in layers[0][0].keys():
        bg = background if key == "shaded" else jnp.zeros_like(layers[0][0][key])
        accum = bg
        for buffers, r in reversed(layers):
            # rast coverage alpha: straight-through soft channel so
            # silhouette gradients reach vertex positions
            alpha = r.alpha_soft[..., None] * buffers[key][..., -1:]
            rgb = jnp.concatenate(
                [buffers[key][..., :-1], jnp.ones_like(buffers[key][..., -1:])], -1
            )
            accum = accum + alpha * (rgb - accum)
        out[key] = accum
    return out


def render_uv(mesh: Mesh, resolution: tuple, mlp_texture, mlp_params):
    """Bake the MLP texture into UV space (render.py:257-275): rasterize
    the UV atlas, interpolate world position, sample the MLP."""
    uv = mesh.v_tex * 2.0 - 1.0
    uv_clip4 = jnp.concatenate(
        [uv, jnp.zeros_like(uv[..., :1]), jnp.ones_like(uv[..., :1])], -1
    )
    rast = rasterize(uv_clip4, mesh.t_tex_idx, resolution, with_soft=False)[0]
    gb_pos = interpolate(mesh.v_pos, rast, mesh.t_pos_idx)
    all_tex = mlp_texture.sample(mlp_params, gb_pos)
    mask = (rast.tri_id > 0)[..., None].astype(jnp.float32)
    return mask, all_tex[..., :-6], all_tex[..., -6:-3], safe_normalize(all_tex[..., -3:])
