"""Unit tests for quadrature, shape functions, mesh preprocessing, and the
matrix-free FEM operators — validated against analytic integrals and dense
numpy assembly (SURVEY.md section 4: shape functions/quadrature vs analytic
integrals, element matrices vs reference values)."""

import numpy as np
import pytest

from diffsound_tpu.fem.quadrature import gauss_tet_quadrature
from diffsound_tpu.fem.shape_func import shape_function, shape_function_grad
from diffsound_tpu.fem.mesh import TetMesh, cube_tet_mesh
from diffsound_tpu.fem import assembly
from diffsound_tpu.fem.material import lame_params

import jax.numpy as jnp

from math import factorial


def bary_integral(a, b, c, d):
    """Exact integral of L1^a L2^b L3^c L4^d over the reference tet:
    a! b! c! d! * 3! / (a+b+c+d+3)!  (volume = 1/6)."""
    return (
        factorial(a)
        * factorial(b)
        * factorial(c)
        * factorial(d)
        * 6
        / factorial(a + b + c + d + 3)
        / 6.0
    )


class TestQuadrature:
    def test_weights_sum_to_volume(self):
        for order in (2, 3, 4, 5):
            _, w = gauss_tet_quadrature(order)
            assert abs(w.sum() - 1.0 / 6.0) < 1e-12

    def test_monomial_exactness(self):
        pts, w = gauss_tet_quadrature(4)
        for exps in [(1, 0, 0, 0), (2, 1, 0, 0), (1, 1, 1, 1), (2, 2, 0, 0), (0, 0, 3, 1)]:
            val = np.sum(w * np.prod(pts**np.array(exps), axis=1))
            assert abs(val - bary_integral(*exps)) < 1e-12


class TestShapeFunctions:
    @pytest.mark.parametrize("order", [1, 2, 3])
    def test_partition_of_unity(self, order):
        pts, _ = gauss_tet_quadrature(3)
        N = shape_function(pts, order)
        np.testing.assert_allclose(N.sum(axis=1), 1.0, atol=1e-12)

    @pytest.mark.parametrize("order", [1, 2, 3])
    def test_kronecker_delta_at_nodes(self, order):
        # nodal barycentric coordinates for each order
        if order == 1:
            nodes = np.eye(4)
        elif order == 2:
            c = np.eye(4)
            m = lambda i, j: 0.5 * (c[i] + c[j])
            nodes = np.stack(
                [c[0], m(0, 1), c[1], m(1, 2), c[2], m(0, 2), m(0, 3), m(1, 3), m(2, 3), c[3]]
            )
        else:
            c = np.eye(4)
            t = lambda i, j, w: (1 - w) * c[i] + w * c[j]
            nodes = np.stack(
                [
                    c[0], t(0, 1, 1 / 3), t(0, 1, 2 / 3), c[1],
                    t(1, 2, 1 / 3), t(1, 2, 2 / 3), c[2],
                    t(2, 0, 1 / 3), t(2, 0, 2 / 3),
                    (c[0] + c[1] + c[2]) / 3,
                    t(0, 3, 1 / 3), t(1, 3, 1 / 3), t(2, 3, 1 / 3),
                    t(0, 3, 2 / 3), t(1, 3, 2 / 3), t(2, 3, 2 / 3),
                    c[3],
                    (c[1] + c[2] + c[3]) / 3,
                    (c[0] + c[2] + c[3]) / 3,
                    (c[0] + c[1] + c[3]) / 3,
                ]
            )
        N = shape_function(nodes, order)
        np.testing.assert_allclose(N, np.eye(len(nodes)), atol=1e-12)

    @pytest.mark.parametrize("order", [1, 2, 3])
    def test_grad_matches_finite_difference(self, order):
        rng = np.random.default_rng(0)
        L = rng.dirichlet(np.ones(4), size=5)
        g = shape_function_grad(L, order)
        eps = 1e-6
        for d in range(4):
            Lp, Lm = L.copy(), L.copy()
            Lp[:, d] += eps
            Lm[:, d] -= eps
            fd = (shape_function(Lp, order) - shape_function(Lm, order)) / (2 * eps)
            np.testing.assert_allclose(g[:, :, d], fd, atol=1e-6)


class TestMesh:
    def test_cube_mesh_volume(self):
        m = cube_tet_mesh(3, size=2.0)
        assert abs(m.volumes().sum() - 8.0) < 1e-10

    def test_high_order_promotion(self):
        m = cube_tet_mesh(2).to_high_order(2)
        assert m.order == 2
        assert m.tets.shape[1] == 10
        # edge midpoints must be shared between adjacent tets (deduped)
        n_lin = cube_tet_mesh(2).num_vertices
        # unique edges of the linear mesh
        lin = cube_tet_mesh(2)
        pairs = lin.tets[:, [[0, 1], [1, 2], [0, 2], [0, 3], [1, 3], [2, 3]]].reshape(-1, 2)
        n_edges = len(np.unique(np.sort(pairs, axis=1), axis=0))
        assert m.num_vertices == n_lin + n_edges
        # midpoint positions correct
        c = m.tets
        v = m.vertices
        np.testing.assert_allclose(v[c[:, 1]], 0.5 * (v[c[:, 0]] + v[c[:, 2]]), atol=1e-12)
        np.testing.assert_allclose(v[c[:, 8]], 0.5 * (v[c[:, 4]] + v[c[:, 9]]), atol=1e-12)

    def test_msh_roundtrip(self, tmp_path):
        m = cube_tet_mesh(2)
        path = str(tmp_path / "cube.msh")
        m.export(path)
        m2 = TetMesh.from_file(path)
        assert m2.num_tets == m.num_tets
        assert abs(m2.volumes().sum() - m.volumes().sum()) < 1e-9

    def test_largest_connected_component(self):
        a = cube_tet_mesh(1)
        b = cube_tet_mesh(2)
        verts = np.concatenate([a.vertices, b.vertices + 10.0])
        tets = np.concatenate([a.tets, b.tets + a.num_vertices])
        m = TetMesh(verts, tets).largest_connected_component()
        assert m.num_tets == b.num_tets


def dense_assemble_reference(mesh, mu, lam, density):
    """Slow per-gauss-point dense assembly, independent of fem.assembly."""
    from diffsound_tpu.fem.shape_func import CORNER_NODES

    pts, wts = gauss_tet_quadrature(mesh.order + 2)
    dNdL = shape_function_grad(pts, mesh.order)  # (G, N, 4)
    dLdx = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, -1, -1]], dtype=np.float64)
    dndx_ref = dNdL @ dLdx  # (G, N, 3)
    Nfun = shape_function(pts, mesh.order)  # (G, N)

    V = mesh.num_vertices
    K = np.zeros((3 * V, 3 * V))
    M = np.zeros((3 * V, 3 * V))
    C = np.zeros((3, 3, 3, 3))
    eye = np.eye(3)
    C += mu * (np.einsum("ik,jl->ijkl", eye, eye) + np.einsum("il,jk->ijkl", eye, eye))
    C += lam * np.einsum("ij,kl->ijkl", eye, eye)

    corners = list(CORNER_NODES[mesh.order])
    for e in range(mesh.num_tets):
        conn = mesh.tets[e]
        c = mesh.vertices[conn[corners]]
        A = np.stack([c[0] - c[3], c[1] - c[3], c[2] - c[3]], axis=-1)
        absdet = abs(np.linalg.det(A))
        Ainv = np.linalg.inv(A)
        B = dndx_ref @ Ainv  # (G, N, 3)
        n = len(conn)
        Ke = np.zeros((n, 3, n, 3))
        Me = np.zeros((n, 3, n, 3))
        for g in range(len(wts)):
            w = wts[g] * absdet
            # K_e[(a,i),(b,k)] = w * B[g,a,j] C[i,j,k,l] B[g,b,l]
            Ke += w * np.einsum("aj,ijkl,bl->aibk", B[g], C, B[g])
            Me += w * density * np.einsum("a,b,ik->aibk", Nfun[g], Nfun[g], eye)
        dof = (conn[:, None] * 3 + np.arange(3)).reshape(-1)
        K[np.ix_(dof, dof)] += Ke.reshape(3 * n, 3 * n)
        M[np.ix_(dof, dof)] += Me.reshape(3 * n, 3 * n)
    return K, M


class TestAssembly:
    @pytest.mark.parametrize("order", [1, 2])
    def test_matvec_matches_dense_reference(self, order):
        mesh = cube_tet_mesh(2).to_high_order(order) if order == 2 else cube_tet_mesh(2)
        mu, lam = lame_params(2.1e7, 0.3)
        density = 2.7
        Kd, Md = dense_assemble_reference(mesh, mu, lam, density)

        ops = assembly.build_element_ops(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), order, dtype=jnp.float64
        )
        rng = np.random.default_rng(1)
        X = rng.standard_normal((3 * mesh.num_vertices, 3))
        np.testing.assert_allclose(
            np.asarray(assembly.k_matvec(ops, jnp.asarray(X), mu, lam)),
            Kd @ X,
            rtol=1e-9,
            atol=1e-9 * np.abs(Kd @ X).max(),
        )
        np.testing.assert_allclose(
            np.asarray(assembly.m_matvec(ops, jnp.asarray(X), density)),
            Md @ X,
            rtol=1e-9,
            atol=1e-12,
        )

    def test_scipy_assembly_matches_dense(self):
        mesh = cube_tet_mesh(2)
        mu, lam = lame_params(1e6, 0.25)
        Kd, Md = dense_assemble_reference(mesh, mu, lam, 1.0)
        ops = assembly.build_element_ops(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), 1, dtype=jnp.float64
        )
        K, M = assembly.assemble_scipy(ops, mu, lam, 1.0)
        np.testing.assert_allclose(K.toarray(), Kd, rtol=1e-9, atol=1e-6)
        np.testing.assert_allclose(M.toarray(), Md, rtol=1e-9, atol=1e-12)

    def test_diag_helpers(self):
        mesh = cube_tet_mesh(2)
        mu, lam = lame_params(1e6, 0.25)
        ops = assembly.build_element_ops(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), 1, dtype=jnp.float64
        )
        K, M = assembly.assemble_scipy(ops, mu, lam, 1.3)
        np.testing.assert_allclose(
            np.asarray(assembly.k_diag(ops, mu, lam)), K.diagonal(), rtol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(assembly.m_diag(ops, 1.3)), M.diagonal(), rtol=1e-9
        )

    def test_tet_mask_zeroes_contribution(self):
        mesh = cube_tet_mesh(2)
        sub = TetMesh(mesh.vertices, mesh.tets[:20], order=1)
        mu, lam = lame_params(1e6, 0.25)
        mask = np.zeros(mesh.num_tets)
        mask[:20] = 1.0
        ops_masked = assembly.build_element_ops(
            jnp.asarray(mesh.vertices),
            jnp.asarray(mesh.tets),
            1,
            dtype=jnp.float64,
            tet_mask=jnp.asarray(mask),
        )
        ops_sub = assembly.build_element_ops(
            jnp.asarray(sub.vertices), jnp.asarray(sub.tets), 1, dtype=jnp.float64
        )
        rng = np.random.default_rng(2)
        X = jnp.asarray(rng.standard_normal((3 * mesh.num_vertices, 2)))
        np.testing.assert_allclose(
            np.asarray(assembly.k_matvec(ops_masked, X, mu, lam)),
            np.asarray(assembly.k_matvec(ops_sub, X, mu, lam)),
            rtol=1e-9,
            atol=1e-9,
        )

    def test_masked_degenerate_padding_is_finite_and_inert(self):
        """Exactly-degenerate padded tets ((0,0,0,0) rows, as produced by
        MarchingTets.compact bucket padding) must yield FINITE element
        blocks and contribute nothing to the matvec.

        Regression: this environment's XLA CPU build constant-folds f64
        scalars through f32, so inv3x3's old `finfo.tiny*1e3` guard
        threshold flushed to 0 and never fired — degenerate tets divided
        0/0 and the NaN scattered into REAL vertex 0's operator rows,
        silently corrupting every padded shape-task gradient (the round-3
        thickness divergence; benchmarks/diagnostics/
        thickness_sign_probe.py)."""
        # the constant-folding bug itself: keep a canary so a regression
        # (or a new backend with the same behavior) is caught directly
        zero = jnp.zeros((1,), jnp.float64)
        assert bool(jnp.all(jnp.abs(zero) < 1e-25)), (
            "XLA miscompiles comparisons against 1e-25: inv3x3's guard "
            "threshold must be raised"
        )

        mesh = cube_tet_mesh(2)
        mu, lam = lame_params(1e6, 0.25)
        # bucket-pad exactly like MarchingTets.compact: repeat vertex 0,
        # (0,0,0,0) tet rows, mask off the pads
        vpad, tpad = mesh.num_vertices + 7, mesh.num_tets + 5
        verts_p = np.zeros((vpad, 3))
        verts_p[: mesh.num_vertices] = mesh.vertices
        verts_p[mesh.num_vertices:] = mesh.vertices[0]
        tets_p = np.zeros((tpad, 4), np.int64)
        tets_p[: mesh.num_tets] = mesh.tets
        mask = np.zeros(tpad)
        mask[: mesh.num_tets] = 1.0

        ops_p = assembly.build_element_ops(
            jnp.asarray(verts_p), jnp.asarray(tets_p), 1,
            dtype=jnp.float64, tet_mask=jnp.asarray(mask),
        )
        for name in ("k_mu", "k_lam", "mass_scale"):
            assert bool(jnp.isfinite(getattr(ops_p, name)).all()), name

        ops = assembly.build_element_ops(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), 1,
            dtype=jnp.float64,
        )
        rng = np.random.default_rng(3)
        X = rng.standard_normal((3 * mesh.num_vertices, 2))
        Xp = np.zeros((3 * vpad, 2))
        Xp[: 3 * mesh.num_vertices] = X
        got = np.asarray(assembly.k_matvec(ops_p, jnp.asarray(Xp), mu, lam))
        want = np.asarray(assembly.k_matvec(ops, jnp.asarray(X), mu, lam))
        np.testing.assert_allclose(
            got[: 3 * mesh.num_vertices], want, rtol=1e-9,
            atol=1e-9 * np.abs(want).max(),
        )
        np.testing.assert_allclose(got[3 * mesh.num_vertices:], 0.0, atol=1e-12)
        gotm = np.asarray(assembly.m_matvec(ops_p, jnp.asarray(Xp), 1.0))
        wantm = np.asarray(assembly.m_matvec(ops, jnp.asarray(X), 1.0))
        np.testing.assert_allclose(
            gotm[: 3 * mesh.num_vertices], wantm, rtol=1e-9, atol=1e-12
        )

    def test_rigid_body_modes_in_kernel(self):
        """K annihilates translations and infinitesimal rotations."""
        mesh = cube_tet_mesh(2).to_high_order(2)
        mu, lam = lame_params(1e6, 0.25)
        ops = assembly.build_element_ops(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), 2, dtype=jnp.float64
        )
        V = mesh.num_vertices
        # translations
        T = np.zeros((3 * V, 3))
        for i in range(3):
            T[i::3, i] = 1.0
        # rotations: u = omega x r
        R = np.zeros((3 * V, 3))
        r = mesh.vertices
        for k, omega in enumerate(np.eye(3)):
            u = np.cross(np.tile(omega, (V, 1)), r)
            R[:, k] = u.reshape(-1)
        KX = np.asarray(assembly.k_matvec(ops, jnp.asarray(np.hstack([T, R])), mu, lam))
        assert np.abs(KX).max() < 1e-6 * mu


class TestGatherTranspose:
    def test_gather_scatter_equivalence(self):
        """The gather-transpose reduction equals segment_sum exactly."""
        from diffsound_tpu.fem.assembly import (
            build_element_ops,
            build_element_ops_jit,
            build_gather_transpose,
            k_matvec,
            m_matvec,
        )

        mesh = cube_tet_mesh(3).to_high_order(2)
        mu, lam = lame_params(2.1e7, 0.3)
        ops_plain = assembly.build_element_ops(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), 2, dtype=jnp.float64
        )
        assert ops_plain.gather_idx is None
        ops_fast = build_element_ops_jit(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), 2, dtype=jnp.float64
        )
        assert ops_fast.gather_idx is not None
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.standard_normal((3 * mesh.num_vertices, 5)))
        np.testing.assert_allclose(
            np.asarray(k_matvec(ops_fast, X, mu, lam)),
            np.asarray(k_matvec(ops_plain, X, mu, lam)),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(m_matvec(ops_fast, X, 1.3)),
            np.asarray(m_matvec(ops_plain, X, 1.3)),
            rtol=1e-12,
        )

    def test_transpose_indices_cover_all(self):
        from diffsound_tpu.fem.assembly import build_gather_transpose

        mesh = cube_tet_mesh(2)
        idx = build_gather_transpose(mesh.tets, mesh.num_vertices)
        EN = mesh.tets.size
        real = idx[idx < EN]
        assert len(real) == EN  # every element-node row appears exactly once
        assert len(np.unique(real)) == EN


class TestOrder3:
    """Order-3 (tetra20) mesh layer: promotion, IO, assembly consistency
    (parity: /root/reference/src/diffelastic/mesh.py:101-223 +
    shape_func.py order-3 tables)."""

    def _mesh3(self, n=2):
        return cube_tet_mesh(n, size=1.0).to_high_order(3)

    def test_promotion_node_positions(self):
        """Every node of every tet sits at its shape-function barycentric
        location relative to the tet's corners (dedup is exact)."""
        from diffsound_tpu.fem.shape_func import CORNER_NODES

        m1 = cube_tet_mesh(2, size=1.0)
        m3 = m1.to_high_order(3)
        assert m3.tets.shape[1] == 20
        c = m3.tets[:, list(CORNER_NODES[3])]
        corners = m3.vertices[c]  # (E, 4, 3)
        # barycentric coordinates of the 20 nodes in shape_func layout
        bary = np.zeros((20, 4))
        bary[[0, 3, 6, 16], [0, 1, 2, 3]] = 1.0
        edge = {1: (0, 1, 1), 2: (0, 1, 2), 4: (1, 2, 1), 5: (1, 2, 2),
                7: (2, 0, 1), 8: (2, 0, 2), 10: (0, 3, 1), 13: (0, 3, 2),
                11: (1, 3, 1), 14: (1, 3, 2), 12: (2, 3, 1), 15: (2, 3, 2)}
        for s, (a, b, f) in edge.items():
            bary[s, a] = (3 - f) / 3.0
            bary[s, b] = f / 3.0
        for s, f in {9: (0, 1, 2), 17: (1, 2, 3), 18: (0, 2, 3), 19: (0, 1, 3)}.items():
            bary[s, list(f)] = 1.0 / 3.0
        expect = np.einsum("na,eac->enc", bary, corners)
        np.testing.assert_allclose(m3.vertices[m3.tets], expect, atol=1e-12)
        # shared nodes are deduped: count = V + 2 edges + faces
        from diffsound_tpu.native import meshops
        ue, _ = meshops.unique_edges(m1.tets)
        face_c = np.array([[0, 1, 2], [1, 2, 3], [0, 2, 3], [0, 1, 3]])
        nf = len(np.unique(np.sort(m1.tets[:, face_c], -1).reshape(-1, 3), axis=0))
        assert m3.num_vertices == m1.num_vertices + 2 * len(ue) + nf

    def test_tetra20_roundtrip(self, tmp_path):
        m3 = self._mesh3()
        p = str(tmp_path / "c3.msh")
        m3.export(p)
        back = TetMesh.from_file(p, keep_order=True)
        assert back.order == 3
        np.testing.assert_allclose(
            np.sort(back.vertices, 0), np.sort(m3.vertices, 0), atol=1e-12
        )
        # order-1 reduction path
        m1 = TetMesh.from_file(p)
        assert m1.order == 1 and m1.tets.shape[1] == 4

    @pytest.mark.parametrize("order", [1, 2, 3])
    def test_constant_strain_energy_exact(self, order):
        """Patch test: for u = G x the discrete energy u^T K u equals the
        analytic V (mu (|G|^2 + tr(GG)) + lam tr(G)^2) at every order, and
        u^T M u for a translation equals rho V."""
        mesh = cube_tet_mesh(2, size=1.0)
        if order > 1:
            mesh = mesh.to_high_order(order)
        mu, lam = lame_params(2.1e7, 0.3)
        rho = 2.7
        ops = assembly.build_element_ops(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), order,
            dtype=jnp.float64,
        )
        G = np.array([[0.3, 0.1, -0.2], [0.0, -0.4, 0.25], [0.15, 0.05, 0.1]])
        u = (mesh.vertices @ G.T).reshape(-1, 1)
        ku = assembly.k_matvec(ops, jnp.asarray(u), mu, lam)
        energy = float(u[:, 0] @ np.asarray(ku)[:, 0])
        Vtot = mesh.volumes().sum() if order == 1 else 1.0
        expect = Vtot * (
            mu * ((G * G).sum() + np.trace(G @ G)) + lam * np.trace(G) ** 2
        )
        np.testing.assert_allclose(energy, expect, rtol=1e-10)

        t = np.tile([1.0, 0.0, 0.0], mesh.num_vertices).reshape(-1, 1)
        mt = assembly.m_matvec(ops, jnp.asarray(t), rho)
        np.testing.assert_allclose(float(t[:, 0] @ np.asarray(mt)[:, 0]), rho * 1.0, rtol=1e-10)

    def test_order3_modes_converge_to_order2(self):
        """Free-free modal frequencies at ord 3 within a few % of ord 2 on
        a coarse cube (and at or below: richer space => stiffer bound
        relaxed)."""
        import scipy.sparse.linalg as spl

        mu, lam = lame_params(2.1e7, 0.3)
        freqs = {}
        for order in (2, 3):
            mesh = cube_tet_mesh(2, size=1.0).to_high_order(order)
            ops = assembly.build_element_ops(
                jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), order,
                dtype=jnp.float64,
            )
            K, M = assembly.assemble_scipy(ops, mu, lam, 2.7)
            vals = spl.eigsh(K, k=12, M=M, sigma=0.0, which="LM")[0]
            freqs[order] = np.sqrt(np.abs(vals[6:]))
        rel = np.abs(freqs[3] - freqs[2]) / freqs[2]
        assert rel.max() < 0.05, rel
        # ord-3 Rayleigh quotients should not exceed ord-2 appreciably
        assert np.all(freqs[3] <= freqs[2] * 1.001)


class TestStressPath:
    """General stress-path K action (reference stiff_func /
    Deform.stress_to_force_batch) + TinyNN learned material."""

    def test_linear_stress_matches_factored_path(self):
        from diffsound_tpu.fem.material import linear_stress

        mesh = cube_tet_mesh(2, size=1.0).to_high_order(2)
        youngs, poisson = 2.1e7, 0.3
        mu, lam = lame_params(youngs, poisson)
        v, t = jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets)
        ops = assembly.build_element_ops(v, t, 2, dtype=jnp.float64)
        dops = assembly.build_deform_ops(v, t, 2, dtype=jnp.float64)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(3 * mesh.num_vertices, 5)))
        y_fact = assembly.k_matvec(ops, x, mu, lam)
        y_stress = assembly.k_matvec_stress(
            dops, lambda F: linear_stress(F, youngs, poisson), x
        )
        np.testing.assert_allclose(
            np.asarray(y_stress), np.asarray(y_fact),
            rtol=1e-9, atol=1e-9 * float(jnp.abs(y_fact).max()),
        )

    def test_tinynn_stress_path_runs_and_differentiates(self):
        import jax
        from diffsound_tpu.fem.material import TinyNN

        mesh = cube_tet_mesh(2, size=1.0)
        v, t = jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets)
        dops = assembly.build_deform_ops(v, t, 1, dtype=jnp.float64)
        nn = TinyNN(mid_dim=16, stress_scale=1e5)
        params = nn.init_params(jax.random.PRNGKey(0), dtype=jnp.float64)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(3 * mesh.num_vertices, 3)))

        def quad(p):
            y = assembly.k_matvec_stress(dops, nn.stress_fn(p), x)
            return jnp.sum(x * y)

        val, g = jax.value_and_grad(quad)(params)
        assert np.isfinite(float(val))
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))
        assert max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g)) > 0
        # the 9x9 elasticity jacobian at F=0 exists and is finite
        C = nn.jacobian_F(params)
        assert C.shape == (9, 9) and bool(jnp.all(jnp.isfinite(C)))


class TestTransforms:
    def test_round_trip_and_barycentric(self):
        """World <-> reference maps invert each other and recover exact
        barycentric coordinates at the corners
        (parity: /root/reference/src/diffelastic/transform.py:2-27)."""
        from diffsound_tpu.fem.transform import (
            barycentric_coordinates,
            compute_inv_transform_coord,
            compute_transform_coord,
        )

        rng = np.random.default_rng(0)
        mesh = cube_tet_mesh(2, size=1.0)
        c = mesh.corner_tets()
        A = jnp.asarray(mesh.transform_matrices())
        b = jnp.asarray(mesh.vertices[c[:, 3]])
        # random reference points inside each tet
        r = rng.dirichlet([1, 1, 1, 1], size=len(c))[:, :3]
        p = compute_inv_transform_coord(jnp.asarray(r), A, b)
        back = compute_transform_coord(p, A, b)
        np.testing.assert_allclose(np.asarray(back), r, atol=1e-12)
        # corner v1 has barycentric (1, 0, 0, 0)
        p1 = jnp.asarray(mesh.vertices[c[:, 0]])
        bc = barycentric_coordinates(p1, A, b)
        np.testing.assert_allclose(
            np.asarray(bc), np.tile([1.0, 0, 0, 0], (len(c), 1)), atol=1e-12
        )
