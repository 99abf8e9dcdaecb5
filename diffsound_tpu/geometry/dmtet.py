"""Differentiable marching tetrahedra emitting a *tetrahedral* mesh.

TPU-first re-design of the reference DMTet family
(/root/reference/src/dmtet/geometry/dmtet_geometry.py:20-267 (solid),
dmtet_thickness.py:13-200 (shell), dmtet_interpolate.py:29-205
(morphing = solid on a blended SDF)):

  * the background grid's unique-edge structure is precomputed once on
    the host (static), so the device pass has NO dynamic shapes: every
    grid edge gets an (optionally masked) interpolated point, every
    background tet up to MAX_TETS sub-tets via the derived case tables —
    capacity-padded buffers + validity masks instead of torch.unique
    compaction inside the loop;
  * vertex positions (grid + edge points) are differentiable w.r.t. the
    SDF values and the thickness scalar exactly like the reference's
    interpolation (zero crossing of sdf, or of sdf - thickness on
    outer-shell edges);
  * host-side `compact()` extracts the concrete submesh (bucket-padded to
    bound jit recompilation) for the eigensolver; the differentiable
    vertex array is re-gathered inside jit through the static keep-index.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .tables import EDGES, MAX_TETS, MAX_TRIS, NUM_TETS_TABLE, NUM_TRIS_TABLE, TET_TABLE, TRI_TABLE


class MarchingOutput(NamedTuple):
    all_verts: jax.Array  # (V + Eg, 3) grid verts + edge points
    sub_tets: jax.Array  # (T * MAX_TETS, 4) int32, global vertex ids
    tet_mask: jax.Array  # (T * MAX_TETS,) bool
    surf_tris: jax.Array  # (T * MAX_TRIS, 3) int32
    tri_mask: jax.Array  # (T * MAX_TRIS,) bool


class MarchingTets:
    """Marching tets over a fixed background grid (static topology)."""

    def __init__(self, grid_verts: np.ndarray, grid_tets: np.ndarray):
        self.grid_verts = np.asarray(grid_verts, np.float64)
        self.grid_tets = np.asarray(grid_tets, np.int64)
        V = self.grid_verts.shape[0]

        from ..native import meshops

        self.unique_edges, self.tet_edges = meshops.unique_edges(self.grid_tets)
        self.num_grid_verts = V
        self.num_edges = self.unique_edges.shape[0]

        # constants committed to the host CPU: the detached marching pass
        # runs host-side (its outputs feed host compaction — pulling them
        # from a tunneled TPU is orders of magnitude slower than pushing),
        # while accelerator jit programs capture these as compile-time
        # constants and transfer them once
        cpu = jax.devices("cpu")[0]
        # numpy -> CPU device DIRECTLY: `jnp.asarray` first materializes
        # on the DEFAULT device (the tunneled TPU), so the old
        # device_put(jnp.asarray(a), cpu) did a multi-MB TPU round trip
        # per table at every task init — observed wedging forever when
        # the relay dropped the in-flight transfer (2026-08-20, spot)
        put = lambda a, dt=None: jax.device_put(
            np.asarray(a, dt) if dt else np.asarray(a), cpu
        )
        self._edges_j = put(self.unique_edges, jnp.int32)
        self._tets_j = put(self.grid_tets, jnp.int32)
        self._tet_edges_j = put(self.tet_edges, jnp.int32)
        self._tet_table = put(TET_TABLE)
        self._num_tets_t = put(NUM_TETS_TABLE)
        self._tri_table = put(TRI_TABLE)
        self._num_tris_t = put(NUM_TRIS_TABLE)

    def __call__(
        self,
        pos: jax.Array,
        sdf: jax.Array,
        thickness: Optional[jax.Array] = None,
    ) -> MarchingOutput:
        """pos (V, 3), sdf (V,); thickness: None for the solid occupancy
        sdf > 0, or a scalar for the shell 0 < sdf <= thickness
        (dmtet_thickness.py:106-137)."""
        V = self.num_grid_verts
        if thickness is None:
            occ = sdf > 0
        else:
            occ = (sdf > 0) & (sdf <= thickness)

        ea, eb = self._edges_j[:, 0], self._edges_j[:, 1]
        sa, sb = sdf[ea], sdf[eb]
        if thickness is not None:
            both_pos = (sa > 0) & (sb > 0)
            sa = jnp.where(both_pos, sa - thickness, sa)
            sb = jnp.where(both_pos, sb - thickness, sb)
        denom = sa - sb
        denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        t = jnp.clip(sa / denom, 0.0, 1.0)
        edge_pts = pos[ea] + t[:, None] * (pos[eb] - pos[ea])  # (Eg, 3)
        all_verts = jnp.concatenate([pos, edge_pts], axis=0)

        occ_tet = occ[self._tets_j]  # (T, 4)
        case = jnp.sum(
            occ_tet.astype(jnp.int32) * jnp.asarray([1, 2, 4, 8]), axis=1
        )  # (T,)

        # map local ids -> global: <4 grid verts, >=4 edge points (+V)
        def map_local(table_entry, tet_verts, tet_edge_ids):
            # table_entry (..., n) local ids, may be -1 padding
            is_vert = (table_entry >= 0) & (table_entry < 4)
            vert_part = jnp.take_along_axis(
                tet_verts[None, :].repeat(table_entry.shape[0], 0),
                jnp.clip(table_entry, 0, 3),
                axis=1,
            )
            edge_part = (
                jnp.take_along_axis(
                    tet_edge_ids[None, :].repeat(table_entry.shape[0], 0),
                    jnp.clip(table_entry - 4, 0, 5),
                    axis=1,
                )
                + V
            )
            return jnp.where(is_vert, vert_part, edge_part)

        tet_entries = self._tet_table[case]  # (T, MAX_TETS, 4)
        sub = jax.vmap(map_local)(tet_entries, self._tets_j, self._tet_edges_j)
        n_sub = self._num_tets_t[case]  # (T,)
        sub_mask = (
            jnp.arange(MAX_TETS)[None, :] < n_sub[:, None]
        )  # (T, MAX_TETS)

        tri_entries = self._tri_table[case]  # (T, MAX_TRIS, 3)
        tris = jax.vmap(map_local)(tri_entries, self._tets_j, self._tet_edges_j)
        n_tri = self._num_tris_t[case]
        tri_mask = jnp.arange(MAX_TRIS)[None, :] < n_tri[:, None]

        T = self._tets_j.shape[0]
        return MarchingOutput(
            all_verts=all_verts,
            sub_tets=sub.reshape(T * MAX_TETS, 4).astype(jnp.int32),
            tet_mask=sub_mask.reshape(-1),
            surf_tris=tris.reshape(T * MAX_TRIS, 3).astype(jnp.int32),
            tri_mask=tri_mask.reshape(-1),
        )

    # -- host-side compaction ----------------------------------------------

    @staticmethod
    def compact(
        out: MarchingOutput,
        largest_component: bool = True,
        tet_bucket: int = 4096,
        vert_bucket: int = 1024,
    ):
        """Extract the valid submesh on the host, keep the largest
        connected component (mass-matrix regularity,
        dmtet_geometry.py:411-443), and bucket-pad so downstream jit
        programs see a bounded set of shapes.

        Returns dict with:
          keep_idx  (Vc_pad,) int — rows of all_verts (padded: repeat 0)
          tets      (Tc_pad, 4) int — indices into keep_idx rows
          tet_mask  (Tc_pad,) bool
          num_verts, num_tets — actual (unpadded) counts
        """
        sub = np.asarray(out.sub_tets)
        mask = np.asarray(out.tet_mask)
        valid = sub[mask]  # (Tc, 4)

        # drop (near-)zero-volume slivers — cut points coinciding with grid
        # vertices create degenerate sub-tets whose dangling vertices would
        # make the mass matrix exactly singular (cf. the reference's
        # vols > 0 filter, geometry_train.py:222-223)
        av = np.asarray(out.all_verts)
        a, b, c, d = (av[valid[:, i]] for i in range(4))
        vols = np.abs(np.einsum("ij,ij->i", a - d, np.cross(b - d, c - d))) / 6.0
        if len(vols):
            valid = valid[vols > 1e-9 * vols.max()]

        from ..native import meshops

        if largest_component and len(valid):
            ncomp, labels = meshops.connected_components(
                valid, int(np.asarray(out.all_verts).shape[0])
            )
            if ncomp > 1:
                roots = labels[valid[:, 0]]
                uniq_roots, counts = np.unique(roots, return_counts=True)
                largest = uniq_roots[counts.argmax()]
                valid = valid[roots == largest]
            # refine by FACE connectivity: a chunk attached through only a
            # vertex or edge is vertex-connected but mechanically a hinge
            # (free rotation -> spurious near-zero eigenvalues beyond the
            # 6 rigid modes; observed on the grid-64 marched turtle)
            nf, tlabels = meshops.face_connected_components(valid)
            if nf > 1:
                uniq, counts = np.unique(tlabels, return_counts=True)
                valid = valid[tlabels == uniq[counts.argmax()]]

        used, tets_c = meshops.compact_tets(
            valid.astype(np.int32), np.ones(len(valid), bool)
        )
        num_verts, num_tets = len(used), len(tets_c)

        def round_up(x, b):
            return ((x + b - 1) // b) * b

        vpad = round_up(num_verts, vert_bucket)
        tpad = round_up(num_tets, tet_bucket)
        keep_idx = np.zeros(vpad, np.int64)
        keep_idx[:num_verts] = used
        tets_pad = np.zeros((tpad, 4), np.int64)
        tets_pad[:num_tets] = tets_c
        tet_mask = np.zeros(tpad, bool)
        tet_mask[:num_tets] = True
        return {
            "keep_idx": keep_idx,
            "tets": tets_pad,
            "tet_mask": tet_mask,
            "num_verts": num_verts,
            "num_tets": num_tets,
        }

    @staticmethod
    def compact_triangles(out: MarchingOutput):
        """Surface triangle mesh (host): (verts (Vs,3) f64, tris (F,3))."""
        tris = np.asarray(out.surf_tris)[np.asarray(out.tri_mask)]
        verts = np.asarray(out.all_verts)
        used, inv = np.unique(tris.reshape(-1), return_inverse=True)
        return verts[used], inv.reshape(-1, 3)

    @staticmethod
    def compact_triangles_padded(out: MarchingOutput, tri_bucket: int = 2048):
        """Surface triangles for the render path (host): triangles keep
        their *global* vertex ids into `all_verts` so the differentiable
        vertex array gathers straight in under jit; bucket-padded so the
        per-iteration jit program count stays bounded.

        Returns dict: tris (F_pad, 3) int, tri_mask (F_pad,), face_gidx
        (F_pad,) original slot index (drives the UV atlas), num_tris."""
        mask = np.asarray(out.tri_mask)
        slots = np.nonzero(mask)[0]
        tris = np.asarray(out.surf_tris)[slots]
        n = len(slots)
        pad = ((n + tri_bucket - 1) // tri_bucket) * tri_bucket
        tris_p = np.zeros((pad, 3), np.int64)
        tris_p[:n] = tris
        gidx = np.zeros(pad, np.int64)
        gidx[:n] = slots
        m = np.zeros(pad, bool)
        m[:n] = True
        return {"tris": tris_p, "tri_mask": m, "face_gidx": gidx, "num_tris": n}


def map_uv(face_gidx: np.ndarray, total_slots: int):
    """Per-face UV atlas for marching-tets surfaces (host, static).

    Same tile scheme as the reference (dmtet.py:102-131): each background
    tet owns one of N x N texture tiles (N = ceil(sqrt(total_slots / 2))),
    its (up to) two triangles split the tile's corner quad.  Returns
    (v_tex (F*3, 2) float32, t_tex_idx (F, 3) int32) — per-face texcoords
    (no sharing; UV islands are per-face by construction)."""
    face_gidx = np.asarray(face_gidx)
    n_tris_per_tet = MAX_TRIS
    N = int(np.ceil(np.sqrt((total_slots + 1) // n_tris_per_tet)))
    tet_idx = face_gidx // n_tris_per_tet
    tri_idx = face_gidx % n_tris_per_tet
    tile = tet_idx % (N * N)
    tx = (tile % N).astype(np.float64) / N
    ty = (tile // N).astype(np.float64) / N
    pad = 0.9 / N
    corners = np.stack(
        [
            np.stack([tx, ty], -1),
            np.stack([tx + pad, ty], -1),
            np.stack([tx + pad, ty + pad], -1),
            np.stack([tx, ty + pad], -1),
        ],
        axis=1,
    )  # (F, 4, 2)
    c1 = np.clip(tri_idx + 1, 0, 3)
    c2 = np.clip(tri_idx + 2, 0, 3)
    F = len(face_gidx)
    ar = np.arange(F)
    v_tex = np.stack(
        [corners[ar, 0], corners[ar, c1], corners[ar, c2]], axis=1
    ).reshape(F * 3, 2)
    t_tex_idx = np.arange(F * 3, dtype=np.int32).reshape(F, 3)
    return v_tex.astype(np.float32), t_tex_idx


def sdf_reg_loss(sdf: jax.Array, unique_edges: jax.Array):
    """BCE sign-agreement regularizer on grid edges crossing the surface
    (dmtet_geometry.py:275-286)."""
    s0 = sdf[unique_edges[:, 0]]
    s1 = sdf[unique_edges[:, 1]]
    crossing = jnp.sign(s0) != jnp.sign(s1)
    bce = jax.nn.softplus(-s0) * (s1 > 0) + jax.nn.softplus(s0) * (s1 <= 0)
    bce = bce + jax.nn.softplus(-s1) * (s0 > 0) + jax.nn.softplus(s1) * (s0 <= 0)
    denom = jnp.maximum(jnp.sum(crossing), 1)
    return jnp.sum(jnp.where(crossing, bce, 0.0)) / denom
