"""Host-side signed distance sampling of a triangle mesh.

Replaces the reference's open3d RaycastingScene usage
(/root/reference/src/dmtet/geometry/dmtet_thickness.py:301-314) with a
self-contained implementation: exact point-triangle distances (Eberly's
region decomposition, vectorized and chunked) and inside/outside sign by
ray-casting parity with a 3-direction majority vote.

Convention: INSIDE-POSITIVE (the reference negates open3d's output to get
the same convention).  Runs once per task as preprocessing — plain numpy.
"""

from __future__ import annotations

import numpy as np


def _point_triangle_dist2(P, A, B, C):
    """Squared distances of points P (Q, 3) to triangles (A, B, C) (F, 3)
    -> (Q, F).  Vectorized closest-point-on-triangle."""
    E0 = B - A  # (F, 3)
    E1 = C - A
    D = P[:, None, :] - A[None, :, :]  # (Q, F, 3)
    a = np.einsum("fd,fd->f", E0, E0)[None, :]
    b = np.einsum("fd,fd->f", E0, E1)[None, :]
    c = np.einsum("fd,fd->f", E1, E1)[None, :]
    d = np.einsum("qfd,fd->qf", D, E0)
    e = np.einsum("qfd,fd->qf", D, E1)

    det = np.maximum(a * c - b * b, 1e-30)
    s = (c * d - b * e) / det
    t = (a * e - b * d) / det
    # clamp (s, t) to the triangle domain s>=0, t>=0, s+t<=1 via the
    # standard projection: clamp barycentric then re-clamp the other
    s = np.clip(s, 0.0, 1.0)
    t = np.clip(t, 0.0, 1.0)
    over = s + t > 1.0
    # project onto the s + t = 1 edge where needed
    ss = np.where(over, np.clip((c + e - b - d) / np.maximum(a - 2 * b + c, 1e-30), 0, 1), s)
    tt = np.where(over, 1.0 - ss, t)
    # re-clamp degenerate cases onto edges s=0 / t=0
    ss = np.clip(ss, 0.0, 1.0)
    tt = np.clip(tt, 0.0, 1.0)
    # also consider the two axis edges explicitly (cheap and safe)
    cand = []
    for sv, tv in ((ss, tt),):
        Q0 = A[None] + sv[..., None] * E0[None] + tv[..., None] * E1[None]
        cand.append(np.einsum("qfd,qfd->qf", P[:, None] - Q0, P[:, None] - Q0))
    # edge s=0: t = clamp(e/c)
    t0 = np.clip(e / np.maximum(c, 1e-30), 0, 1)
    Q1 = A[None] + t0[..., None] * E1[None]
    cand.append(np.einsum("qfd,qfd->qf", P[:, None] - Q1, P[:, None] - Q1))
    # edge t=0: s = clamp(d/a)
    s0 = np.clip(d / np.maximum(a, 1e-30), 0, 1)
    Q2 = A[None] + s0[..., None] * E0[None]
    cand.append(np.einsum("qfd,qfd->qf", P[:, None] - Q2, P[:, None] - Q2))
    # edge s+t=1: param u along B->C
    u = np.clip(
        np.einsum("qfd,fd->qf", D - E0[None], (C - B))
        / np.maximum(np.einsum("fd,fd->f", C - B, C - B), 1e-30)[None],
        0, 1,
    )
    Q3 = B[None] + u[..., None] * (C - B)[None]
    cand.append(np.einsum("qfd,qfd->qf", P[:, None] - Q3, P[:, None] - Q3))
    return np.min(np.stack(cand, axis=0), axis=0)


def _ray_parity(P, A, B, C, direction):
    """Parity of ray-triangle intersection counts (Q,) via
    Moller-Trumbore."""
    d = direction / np.linalg.norm(direction)
    E1 = B - A
    E2 = C - A
    h = np.cross(d[None, :], E2)  # (F, 3)
    a = np.einsum("fd,fd->f", E1, h)[None, :]  # (1, F)
    parallel = np.abs(a) < 1e-12
    f = 1.0 / np.where(parallel, 1.0, a)
    s = P[:, None, :] - A[None, :, :]  # (Q, F, 3)
    u = f * np.einsum("qfd,fd->qf", s, h)
    q = np.cross(s, E1[None, :, :])
    v = f * np.einsum("qfd,d->qf", q, d)
    t = f * np.einsum("qfd,fd->qf", q, E2)
    hit = (
        (~parallel)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 1e-10)
    )
    return hit.sum(axis=1) % 2 == 1


def mesh_signed_distance(
    query: np.ndarray,
    verts: np.ndarray,
    faces: np.ndarray,
    chunk: int = 2048,
) -> np.ndarray:
    """Inside-positive signed distance of `query` (Q, 3) to the triangle
    mesh (verts (N, 3), faces (F, 3))."""
    A = verts[faces[:, 0]].astype(np.float64)
    B = verts[faces[:, 1]].astype(np.float64)
    C = verts[faces[:, 2]].astype(np.float64)
    query = np.asarray(query, np.float64)

    Q = query.shape[0]
    dist = np.empty(Q)
    inside = np.empty(Q, bool)
    rng = np.random.default_rng(12345)
    dirs = rng.standard_normal((3, 3))
    for i in range(0, Q, chunk):
        qs = query[i : i + chunk]
        d2 = _point_triangle_dist2(qs, A, B, C)
        dist[i : i + chunk] = np.sqrt(d2.min(axis=1))
        votes = np.stack([_ray_parity(qs, A, B, C, d) for d in dirs])
        inside[i : i + chunk] = votes.sum(axis=0) >= 2
    return np.where(inside, dist, -dist)
