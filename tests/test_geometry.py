"""Marching-tets geometry stack tests: derived tables cover clip volumes,
grid marching reproduces sphere volume, gradients flow through edge
interpolation, signed-distance sampling matches analytic values."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffsound_tpu.geometry.tables import (
    EDGES,
    NUM_TETS_TABLE,
    NUM_TRIS_TABLE,
    TET_TABLE,
)
from diffsound_tpu.geometry.dmtet import MarchingTets
from diffsound_tpu.geometry.grid import generate_background_grid, load_background_grid
from diffsound_tpu.geometry.sdf_host import mesh_signed_distance


def icosphere(subdiv=2, radius=1.0):
    """Unit icosphere triangle mesh."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ]
    )
    for _ in range(subdiv):
        mid = {}
        new_faces = []
        verts = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2
                verts.append(m)
                mid[key] = len(verts) - 1
            return mid[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.array(new_faces)
        verts = np.array(verts)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True) * radius
    return verts, faces


def tet_volume(verts, tets):
    a = verts[tets[:, 0]]
    b = verts[tets[:, 1]]
    c = verts[tets[:, 2]]
    d = verts[tets[:, 3]]
    return np.abs(np.einsum("ij,ij->i", a - d, np.cross(b - d, c - d))) / 6.0


class TestTables:
    def test_counts(self):
        # |S| of case c: popcount; tets 0/1/3/3/1, tris 0/1/2/1/0
        for case in range(16):
            s = bin(case).count("1")
            assert NUM_TETS_TABLE[case] == {0: 0, 1: 1, 2: 3, 3: 3, 4: 1}[s]
            assert NUM_TRIS_TABLE[case] == {0: 0, 1: 1, 2: 2, 3: 1, 4: 0}[s]

    @pytest.mark.parametrize("case", range(1, 15))
    def test_clip_volume_matches_montecarlo(self, case):
        """Sub-tet volumes sum to the exact clipped-region volume of the
        linear SDF inside one random tet."""
        rng = np.random.default_rng(case)
        tet = rng.standard_normal((4, 3))
        inside = np.array([bool(case >> v & 1) for v in range(4)])
        sdf = np.where(inside, 1.0, -1.0) * rng.uniform(0.3, 1.5, 4)

        # vertex list: 4 corners + 6 edge points at the sdf zero crossing
        pts = list(tet)
        for (a, b) in EDGES:
            sa, sb = sdf[a], sdf[b]
            t = sa / (sa - sb) if (sa > 0) != (sb > 0) else 0.5
            pts.append(tet[a] + t * (tet[b] - tet[a]))
        pts = np.array(pts)

        vol = 0.0
        for i in range(NUM_TETS_TABLE[case]):
            ids = TET_TABLE[case, i]
            vol += tet_volume(pts, ids[None])[0]

        # Monte Carlo volume of {x : linear interp of sdf > 0}
        n = 200000
        bary = rng.dirichlet(np.ones(4), n)
        s = bary @ sdf
        frac = (s > 0).mean()
        total = tet_volume(np.array(pts), np.array([[0, 1, 2, 3]]))[0]
        assert abs(vol - frac * total) < 0.02 * total


class TestMarchingTets:
    def test_sphere_volume(self):
        verts, tets = generate_background_grid(20)
        mt = MarchingTets(verts, tets)
        r = 0.35
        sdf = r - np.linalg.norm(verts, axis=1)  # inside-positive
        out = mt(jnp.asarray(verts, jnp.float64), jnp.asarray(sdf))
        comp = MarchingTets.compact(out)
        v = np.asarray(out.all_verts)[comp["keep_idx"]]
        t = comp["tets"][comp["tet_mask"][: len(comp["tets"])]]
        t = comp["tets"][: comp["num_tets"]]
        vol = tet_volume(v, t).sum()
        exact = 4.0 / 3.0 * np.pi * r**3
        assert abs(vol - exact) < 0.05 * exact

    def test_shell_volume(self):
        verts, tets = generate_background_grid(24)
        mt = MarchingTets(verts, tets)
        r = 0.4
        sdf = r - np.linalg.norm(verts, axis=1)
        th = 0.15
        out = mt(jnp.asarray(verts, jnp.float64), jnp.asarray(sdf), jnp.asarray(th))
        comp = MarchingTets.compact(out)
        v = np.asarray(out.all_verts)[comp["keep_idx"]]
        t = comp["tets"][: comp["num_tets"]]
        vol = tet_volume(v, t).sum()
        exact = 4.0 / 3.0 * np.pi * (r**3 - (r - th) ** 3)
        assert abs(vol - exact) < 0.08 * exact

    def test_volume_gradient_wrt_radius(self):
        """d(volume)/d(r) through the masked marched mesh ~ 4 pi r^2."""
        verts, tets = generate_background_grid(16)
        mt = MarchingTets(verts, tets)
        pos = jnp.asarray(verts, jnp.float64)
        dist = jnp.linalg.norm(pos, axis=1)

        def volume(r):
            out = mt(pos, r - dist)
            v = out.all_verts
            t = out.sub_tets
            a, b, c, d = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]], v[t[:, 3]]
            vols = jnp.abs(
                jnp.einsum("ij,ij->i", a - d, jnp.cross(b - d, c - d))
            ) / 6.0
            return jnp.sum(jnp.where(out.tet_mask, vols, 0.0))

        r0 = 0.33
        g = jax.grad(volume)(jnp.asarray(r0))
        assert abs(float(g) - 4 * np.pi * r0**2) < 0.15 * 4 * np.pi * r0**2

    def test_surface_triangles(self):
        verts, tets = generate_background_grid(16)
        mt = MarchingTets(verts, tets)
        sdf = 0.35 - np.linalg.norm(verts, axis=1)
        out = mt(jnp.asarray(verts, jnp.float64), jnp.asarray(sdf))
        sv, st = MarchingTets.compact_triangles(out)
        # surface verts lie near the r=0.35 sphere
        rr = np.linalg.norm(sv, axis=1)
        assert np.all(np.abs(rr - 0.35) < 0.08)
        assert len(st) > 100


class TestSignedDistance:
    def test_sphere_sdf(self):
        verts, faces = icosphere(3, radius=0.5)
        rng = np.random.default_rng(0)
        q = rng.uniform(-0.9, 0.9, (300, 3))
        sd = mesh_signed_distance(q, verts, faces)
        analytic = 0.5 - np.linalg.norm(q, axis=1)  # inside-positive
        # icosphere(3) approximates the sphere to ~0.3% radius
        np.testing.assert_allclose(sd, analytic, atol=0.01)
