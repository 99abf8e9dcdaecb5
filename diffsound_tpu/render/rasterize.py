"""Static-shape differentiable rasterization in pure JAX.

Replaces nvdiffrast (`dr.rasterize` / `dr.interpolate` / `dr.antialias` /
`dr.DepthPeeler`, used by /root/reference/src/dmtet/render/render.py) with
a TPU-first design:

  * **Hard visibility** is a chunked z-buffer sweep under `lax.scan`:
    every chunk of triangles evaluates its edge functions against all
    pixels as dense (chunk, pixels) arrays — elementwise math XLA tiles
    onto the VPU — and the scan carry keeps the per-pixel (depth, id)
    minimum.  Triangle buffers may be capacity-padded with a mask, so
    DMTet's static-shape triangle output feeds straight in, no
    compaction required inside jit.
  * **Differentiable resolve**: the winning triangle id is detached (as
    in any z-buffer), then its barycentrics are *recomputed analytically*
    from the clip-space vertices, so gradients flow from interpolated
    attributes to vertex positions exactly like dr.interpolate.
  * **Silhouette gradients**: instead of dr.antialias's edge-stitching
    kernel, a soft-coverage channel takes the per-pixel MAX of a sigmoid
    of the signed screen-space distance to each triangle (SoftRas-style,
    but max-union instead of transmittance product — see the in-body
    comment: the product's seam factors break gradient cancellation
    under pixel-weighted losses), giving smooth d(alpha)/d(vertex) at
    silhouettes; interior pixels saturate to 1 so the hard and soft
    channels agree away from edges.
  * **Depth peeling** re-runs the sweep constrained to depths strictly
    behind the previous layer (replaces dr.DepthPeeler).

Conventions follow nvdiffrast: clip-space input (V, 4) (y flipped by the
projection), `tri_id` output is 1-based with 0 = empty, barycentrics are
perspective-correct (u, v) with w = 1 - u - v on vertex order (0, 1, 2).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Rast(NamedTuple):
    u: jax.Array  # (H, W) perspective-correct barycentric for vertex 1
    v: jax.Array  # (H, W) for vertex 2
    zw: jax.Array  # (H, W) NDC depth of the hit (inf where empty)
    tri_id: jax.Array  # (H, W) int32, 1-based, 0 = no hit
    alpha_soft: jax.Array  # (H, W) soft coverage in [0, 1]


def _pixel_grid(H: int, W: int, dtype=jnp.float32):
    """Pixel-center NDC coords; row 0 maps to y = -1 (the projection's
    y-flip makes rendered images upright, matching the reference)."""
    px = (jnp.arange(W, dtype=dtype) + 0.5) / W * 2.0 - 1.0
    py = (jnp.arange(H, dtype=dtype) + 0.5) / H * 2.0 - 1.0
    return jnp.meshgrid(px, py, indexing="xy")  # each (H, W)


def _tri_setup(v_clip, tris):
    """Per-triangle screen-space quantities (vectorized over triangles)."""
    a, b, c = (v_clip[tris[:, i]] for i in range(3))  # (T, 4)
    w_a, w_b, w_c = a[:, 3], b[:, 3], c[:, 3]
    eps = 1e-9
    valid_w = (w_a > eps) & (w_b > eps) & (w_c > eps)
    inv = lambda w: 1.0 / jnp.where(jnp.abs(w) < eps, eps, w)
    pa = a[:, :2] * inv(w_a)[:, None]  # NDC xy (T, 2)
    pb = b[:, :2] * inv(w_b)[:, None]
    pc = c[:, :2] * inv(w_c)[:, None]
    za = a[:, 2] * inv(w_a)
    zb = b[:, 2] * inv(w_b)
    zc = c[:, 2] * inv(w_c)
    area = (pb[:, 0] - pa[:, 0]) * (pc[:, 1] - pa[:, 1]) - (
        pb[:, 1] - pa[:, 1]
    ) * (pc[:, 0] - pa[:, 0])
    return pa, pb, pc, za, zb, zc, area, valid_w, (w_a, w_b, w_c)


def _edge(p0, p1, px, py):
    """Edge function (p1-p0) x (pixel-p0): (T, 1, 1) vs (H, W) -> (T, H, W)."""
    ex = (p1[:, 0] - p0[:, 0])[:, None, None]
    ey = (p1[:, 1] - p0[:, 1])[:, None, None]
    return ex * (py[None] - p0[:, 1][:, None, None]) - ey * (
        px[None] - p0[:, 0][:, None, None]
    )


@partial(jax.jit, static_argnames=("resolution", "chunk", "with_soft"))
def _sweep(
    v_clip,
    tris,
    tri_mask,
    z_floor,
    resolution,
    chunk: int,
    with_soft: bool,
    sigma: float,
):
    """One z-buffer sweep; z_floor (H, W) excludes fragments at or in
    front of it (depth peeling; -inf for the first layer)."""
    H, W = resolution
    px, py = _pixel_grid(H, W)
    T = tris.shape[0]
    pad = (-T) % chunk
    tris_p = jnp.pad(tris, ((0, pad), (0, 0)))
    mask_p = jnp.pad(tri_mask, (0, pad))
    n_chunks = (T + pad) // chunk
    tris_c = tris_p.reshape(n_chunks, chunk, 3)
    mask_c = mask_p.reshape(n_chunks, chunk)
    ids_c = jnp.arange(T + pad, dtype=jnp.int32).reshape(n_chunks, chunk)

    inf = jnp.float32(np.inf)

    def body(carry, inp):
        best_z, best_id, soft_agg = carry
        ctris, cmask, cids = inp
        pa, pb, pc, za, zb, zc, area, valid_w, _ = _tri_setup(v_clip, ctris)
        s = jnp.sign(area)
        s = jnp.where(s == 0, 1.0, s)[:, None, None]
        e0 = _edge(pb, pc, px, py) * s  # opposite vertex a
        e1 = _edge(pc, pa, px, py) * s
        e2 = _edge(pa, pb, px, py) * s
        abs_area = jnp.abs(area)[:, None, None]
        # epsilon-inclusive edge test: two triangles sharing an edge
        # evaluate its edge function with different operand orderings, so
        # a sample exactly on the seam can round to slightly-outside for
        # BOTH and the pixel drops out (a crack).  The slack is ~1e-6 of
        # the triangle area = an O(1e-6 NDC) band, far below pixel size;
        # double-claimed seam samples are resolved by the z-argmin.
        eps = 1e-6 * jnp.maximum(abs_area, 1e-3)
        cover = (e0 >= -eps) & (e1 >= -eps) & (e2 >= -eps)
        ok = (valid_w & cmask & (jnp.abs(area) > 1e-12))[:, None, None]
        cover = cover & ok
        a0 = e0 / jnp.where(abs_area < 1e-12, 1.0, abs_area)
        a1 = e1 / jnp.where(abs_area < 1e-12, 1.0, abs_area)
        a2 = 1.0 - a0 - a1
        z = a0 * za[:, None, None] + a1 * zb[:, None, None] + a2 * zc[:, None, None]
        # the z-buffer itself is non-differentiable (ids are detached and
        # barycentrics are re-derived outside); keep its graph out of AD
        z = jax.lax.stop_gradient(jnp.where(cover & (z > z_floor[None]), z, inf))
        cz = jnp.min(z, axis=0)  # (H, W)
        carg = jnp.argmin(z, axis=0)
        cid = cids[carg] + 1
        take = cz < best_z
        best_z = jnp.where(take, cz, best_z)
        best_id = jnp.where(take, cid, best_id)
        if with_soft:
            # signed pixel-space distance to the triangle boundary
            def elen(p0, p1):
                # clamp INSIDE the sqrt: degenerate (padded / zero-area)
                # triangles have exact-zero edge vectors, and sqrt'(0)=inf
                # would leak NaN through the ok-mask via 0*inf in backward
                l2 = ((p1[:, 0] - p0[:, 0]) * (0.5 * W)) ** 2 + (
                    (p1[:, 1] - p0[:, 1]) * (0.5 * H)
                ) ** 2
                return jnp.sqrt(jnp.maximum(l2, 1e-24))
            # edge funcs are in NDC^2 units; convert to pixel distance
            d0 = e0 * (0.25 * W * H) / elen(pb, pc)[:, None, None]
            d1 = e1 * (0.25 * W * H) / elen(pc, pa)[:, None, None]
            d2 = e2 * (0.25 * W * H) / elen(pa, pb)[:, None, None]
            d = jnp.minimum(jnp.minimum(d0, d1), d2)
            soft = jax.nn.sigmoid(d / sigma)
            soft = jnp.where(ok, soft, 0.0)
            # union by MAX, not transmittance product: with the product,
            # the two factors of an interior seam weight its two sides
            # differently, so seam gradients fail to cancel under any
            # pixel-weighted loss (measured: d(mean alpha^2)/d(scale) < 0
            # for a growing sphere).  With max, an interior pixel's
            # aggregate is exactly its containing triangle's sigmoid, seam
            # motion shifts equal-weighted pixels symmetrically, and only
            # true silhouette edges leave a net gradient.
            soft_agg = jnp.maximum(soft_agg, jnp.max(soft, axis=0))
        return (best_z, best_id, soft_agg), None

    init = (
        jnp.full((H, W), np.inf, jnp.float32),
        jnp.zeros((H, W), jnp.int32),
        jnp.zeros((H, W), jnp.float32),
    )
    (best_z, best_id, soft_agg), _ = jax.lax.scan(
        body, init, (tris_c, mask_c, ids_c)
    )
    alpha_soft = soft_agg if with_soft else (best_id > 0).astype(jnp.float32)
    return best_z, best_id, alpha_soft


def _resolve_bary(v_clip, tris, tri_id, resolution):
    """Differentiable barycentrics for the (detached) winning triangle."""
    H, W = resolution
    px, py = _pixel_grid(H, W)
    idx = jnp.clip(tri_id - 1, 0, tris.shape[0] - 1)  # (H, W)
    t = tris[idx]  # (H, W, 3)
    vert = v_clip[t]  # (H, W, 3, 4)
    w = jnp.clip(vert[..., 3], 1e-9, None)
    p = vert[..., :2] / w[..., None]  # (H, W, 3, 2)
    pa, pb, pc = p[..., 0, :], p[..., 1, :], p[..., 2, :]

    def edge2(p0, p1):
        return (p1[..., 0] - p0[..., 0]) * (py - p0[..., 1]) - (
            p1[..., 1] - p0[..., 1]
        ) * (px - p0[..., 0])

    e0 = edge2(pb, pc)  # screen bary (unnormalized) for vertex a
    e1 = edge2(pc, pa)
    e2 = edge2(pa, pb)
    ssum = e0 + e1 + e2
    ssum = jnp.where(jnp.abs(ssum) < 1e-12, 1e-12, ssum)
    a0, a1, a2 = e0 / ssum, e1 / ssum, e2 / ssum
    # perspective correction
    q0 = a0 / w[..., 0]
    q1 = a1 / w[..., 1]
    q2 = a2 / w[..., 2]
    qs = q0 + q1 + q2
    qs = jnp.where(jnp.abs(qs) < 1e-20, 1e-20, qs)
    u = q1 / qs  # weight of vertex 1
    v = q2 / qs  # weight of vertex 2
    zw = (
        a0 * vert[..., 0, 2] / w[..., 0]
        + a1 * vert[..., 1, 2] / w[..., 1]
        + a2 * vert[..., 2, 2] / w[..., 2]
    )
    return u, v, zw


def rasterize(
    v_clip: jax.Array,
    tris: jax.Array,
    resolution: tuple,
    tri_mask: Optional[jax.Array] = None,
    num_layers: int = 1,
    chunk: Optional[int] = None,
    soft_sigma: float = 1.0,
    with_soft: bool = True,
):
    """-> list of `Rast`, front layer first.

    v_clip (V, 4) clip-space positions (differentiable), tris (T, 3)
    int32, tri_mask optional (T,) validity for capacity-padded buffers.
    """
    H, W = resolution
    v_clip = v_clip.astype(jnp.float32)  # the sweep carries are f32
    if tri_mask is None:
        tri_mask = jnp.ones(tris.shape[0], bool)
    if chunk is None:
        chunk = max(8, min(256, (1 << 22) // max(H * W, 1)))

    layers = []
    z_floor = jnp.full((H, W), -np.inf, jnp.float32)
    for _ in range(num_layers):
        best_z, best_id, alpha_soft = _sweep(
            v_clip,
            tris,
            tri_mask,
            z_floor,
            (H, W),
            chunk,
            with_soft,
            soft_sigma,
        )
        u, v, zw = _resolve_bary(v_clip, tris, best_id, (H, W))
        empty = best_id == 0
        u = jnp.where(empty, 0.0, u)
        v = jnp.where(empty, 0.0, v)
        zw = jnp.where(empty, jnp.inf, zw)
        if with_soft:
            # Straight-through coverage: exact hard 0/1 *value* (no seam
            # dips on interior triangle boundaries) with the SoftRas
            # aggregate's smooth *gradient* at silhouettes.  Seam-edge
            # soft gradients cancel pairwise (the shared edge enters the
            # two adjacent transmittance factors with opposite signs).
            hard = (~empty).astype(jnp.float32)
            alpha = jax.lax.stop_gradient(hard - alpha_soft) + alpha_soft
        else:
            alpha = (~empty).astype(jnp.float32)
        layers.append(Rast(u=u, v=v, zw=zw, tri_id=best_id, alpha_soft=alpha))
        z_floor = jax.lax.stop_gradient(
            jnp.where(empty, z_floor, best_z * (1 + 1e-6) + 1e-7)
        )
        with_soft = False  # soft coverage only meaningful for the silhouette
    return layers


def interpolate(attr: jax.Array, rast: Rast, tris: jax.Array):
    """attr (V, C) vertex attributes -> (H, W, C) interpolated, zero where
    empty (dr.interpolate semantics)."""
    idx = jnp.clip(rast.tri_id - 1, 0, tris.shape[0] - 1)
    t = tris[idx]  # (H, W, 3)
    av = attr[t]  # (H, W, 3, C)
    w0 = (1.0 - rast.u - rast.v)[..., None]
    out = w0 * av[..., 0, :] + rast.u[..., None] * av[..., 1, :] + rast.v[..., None] * av[..., 2, :]
    return jnp.where((rast.tri_id > 0)[..., None], out, 0.0)


def interpolate_face(face_attr: jax.Array, rast: Rast):
    """face_attr (T, C) per-face attributes -> (H, W, C) flat lookup."""
    idx = jnp.clip(rast.tri_id - 1, 0, face_attr.shape[0] - 1)
    out = face_attr[idx]
    return jnp.where((rast.tri_id > 0)[..., None], out, 0.0)
