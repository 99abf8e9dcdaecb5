"""Triangle mesh container and differentiable normal/tangent generation.

JAX counterpart of /root/reference/src/dmtet/render/mesh.py:20-238: an
immutable `Mesh` record (positions, texcoords, normals, tangents, each
with its own index buffer, plus a material dict) and the smooth-normal /
MikkTSpace-style tangent builders.  Scatter-adds become `segment_sum`
with static segment counts; everything is differentiable w.r.t. vertex
positions so geometry gradients flow through shading normals exactly as
in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .util import dot, safe_normalize


@dataclass(frozen=True)
class Mesh:
    v_pos: Optional[jax.Array] = None  # (V, 3)
    t_pos_idx: Optional[jax.Array] = None  # (T, 3) int32
    v_nrm: Optional[jax.Array] = None
    t_nrm_idx: Optional[jax.Array] = None
    v_tex: Optional[jax.Array] = None  # (Vt, 2)
    t_tex_idx: Optional[jax.Array] = None
    v_tng: Optional[jax.Array] = None
    t_tng_idx: Optional[jax.Array] = None
    material: Optional[dict] = None

    def with_(self, **kw) -> "Mesh":
        return replace(self, **kw)


def aabb(mesh: Mesh):
    return jnp.min(mesh.v_pos, axis=0), jnp.max(mesh.v_pos, axis=0)


def unit_size(mesh: Mesh) -> Mesh:
    """Center on origin and scale the longest AABB side to 2."""
    vmin, vmax = aabb(mesh)
    scale = 2.0 / jnp.max(vmax - vmin)
    return mesh.with_(v_pos=(mesh.v_pos - (vmax + vmin) / 2) * scale)


def center_by_reference(mesh: Mesh, ref_aabb, scale: float) -> Mesh:
    center = (ref_aabb[0] + ref_aabb[1]) * 0.5
    s = scale / jnp.max(ref_aabb[1] - ref_aabb[0])
    return mesh.with_(v_pos=(mesh.v_pos - center[None, :]) * s)


def face_normals(v_pos, t_pos_idx, normalize: bool = True):
    v0 = v_pos[t_pos_idx[:, 0]]
    v1 = v_pos[t_pos_idx[:, 1]]
    v2 = v_pos[t_pos_idx[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)
    return safe_normalize(fn) if normalize else fn


def auto_normals(mesh: Mesh) -> Mesh:
    """Area-weighted smooth vertex normals (mesh.py auto_normals)."""
    V = mesh.v_pos.shape[0]
    fn = face_normals(mesh.v_pos, mesh.t_pos_idx, normalize=False)
    idx = mesh.t_pos_idx.reshape(-1)
    contrib = jnp.repeat(fn, 3, axis=0)
    v_nrm = jax.ops.segment_sum(contrib, idx, num_segments=V)
    v_nrm = jnp.where(
        dot(v_nrm, v_nrm) > 1e-20, v_nrm, jnp.asarray([0.0, 0.0, 1.0], v_nrm.dtype)
    )
    return mesh.with_(v_nrm=safe_normalize(v_nrm), t_nrm_idx=mesh.t_pos_idx)


def compute_tangents(mesh: Mesh) -> Mesh:
    """Per-vertex tangents from UVs (MikkTSpace-style accumulation,
    mesh.py compute_tangents)."""
    pos = [mesh.v_pos[mesh.t_pos_idx[:, i]] for i in range(3)]
    tex = [mesh.v_tex[mesh.t_tex_idx[:, i]] for i in range(3)]

    uve1 = tex[1] - tex[0]
    uve2 = tex[2] - tex[0]
    pe1 = pos[1] - pos[0]
    pe2 = pos[2] - pos[0]

    nom = pe1 * uve2[..., 1:2] - pe2 * uve1[..., 1:2]
    denom = uve1[..., 0:1] * uve2[..., 1:2] - uve1[..., 1:2] * uve2[..., 0:1]
    tang = nom / jnp.where(
        denom > 0.0, jnp.clip(denom, 1e-6, None), jnp.clip(denom, None, -1e-6)
    )

    V = mesh.v_nrm.shape[0]
    idx = mesh.t_nrm_idx.reshape(-1)
    contrib = jnp.repeat(tang, 3, axis=0)
    tangents = jax.ops.segment_sum(contrib, idx, num_segments=V)
    tangents = safe_normalize(tangents)
    tangents = safe_normalize(tangents - dot(tangents, mesh.v_nrm) * mesh.v_nrm)
    return mesh.with_(v_tng=tangents, t_tng_idx=mesh.t_nrm_idx)


def unique_edges(t_pos_idx: np.ndarray) -> np.ndarray:
    """Host-side unique undirected edge list of a triangle mesh."""
    t = np.asarray(t_pos_idx)
    e = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]], axis=0)
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0)
