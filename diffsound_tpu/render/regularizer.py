"""Geometry and image regularizers.

Counterpart of /root/reference/src/dmtet/render/regularizer.py:19-82:
jittered image gradient, umbrella Laplacian, and edge-based normal
consistency — scatter_adds become segment_sums with static counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import face_normals
from .texture import sample_bilinear
from .util import dot, length


def image_grad(buf, key, std: float = 0.01):
    """Expected local image gradient by jittered resampling
    (regularizer.py:19-26).  buf (H, W, C+1) with alpha last."""
    H, W = buf.shape[0], buf.shape[1]
    gy, gx = jnp.meshgrid(
        (jnp.arange(H) + 0.5) / H, (jnp.arange(W) + 0.5) / W, indexing="ij"
    )
    uv = jnp.stack([gx, gy], -1)
    tc = uv + std * jax.random.normal(key, uv.shape, buf.dtype)
    tap = sample_bilinear(buf, tc)
    return jnp.abs(tap[..., :-1] - buf[..., :-1]) * tap[..., -1:] * buf[..., -1:]


def avg_edge_length(v_pos, unique_edges):
    return jnp.mean(length(v_pos[unique_edges[:, 0]] - v_pos[unique_edges[:, 1]]))


def laplace_regularizer_const(v_pos, t_pos_idx):
    """Umbrella-operator Laplacian magnitude (regularizer.py:41-60)."""
    V = v_pos.shape[0]
    v0 = v_pos[t_pos_idx[:, 0]]
    v1 = v_pos[t_pos_idx[:, 1]]
    v2 = v_pos[t_pos_idx[:, 2]]
    contrib = jnp.concatenate(
        [(v1 - v0) + (v2 - v0), (v0 - v1) + (v2 - v1), (v0 - v2) + (v1 - v2)], 0
    )
    idx = jnp.concatenate([t_pos_idx[:, 0], t_pos_idx[:, 1], t_pos_idx[:, 2]])
    term = jax.ops.segment_sum(contrib, idx, num_segments=V)
    norm = jax.ops.segment_sum(
        jnp.full((idx.shape[0],), 2.0, v_pos.dtype), idx, num_segments=V
    )
    term = term / jnp.clip(norm, 1.0, None)[:, None]
    return jnp.mean(term**2)


def edge_to_face_mapping(t_pos_idx: np.ndarray):
    """Host precompute: unique edges -> the (up to) two adjacent faces
    (mesh.py compute_edge_to_face_mapping).  Boundary edges pair a face
    with itself so the consistency term vanishes there."""
    t = np.asarray(t_pos_idx)
    F = t.shape[0]
    e = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]], axis=0)
    face_of = np.tile(np.arange(F), 3)
    key = np.sort(e, axis=1)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    pairs = np.full((uniq.shape[0], 2), -1, np.int64)
    for k, f in zip(inv, face_of):
        if pairs[k, 0] < 0:
            pairs[k, 0] = f
        else:
            pairs[k, 1] = f
    pairs[:, 1] = np.where(pairs[:, 1] < 0, pairs[:, 0], pairs[:, 1])
    return pairs


def normal_consistency(v_pos, t_pos_idx, tris_per_edge):
    """Mean misalignment of adjacent face normals (regularizer.py:64-82).
    tris_per_edge from `edge_to_face_mapping` (host, static)."""
    fn = face_normals(v_pos, t_pos_idx)
    n0 = fn[tris_per_edge[:, 0]]
    n1 = fn[tris_per_edge[:, 1]]
    term = jnp.clip(dot(n0, n1), -1.0, 1.0)
    return jnp.mean(jnp.abs((1.0 - term) * 0.5))
