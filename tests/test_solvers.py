"""LOBPCG vs scipy dense/sparse reference; Rayleigh-correction gradients vs
finite differences (SURVEY.md section 4 / section 7.2 exit tests)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffsound_tpu.fem import assembly
from diffsound_tpu.fem.mesh import cube_tet_mesh
from diffsound_tpu.fem.material import lame_params
from diffsound_tpu.solvers.lobpcg import lobpcg, jacobi_preconditioner
from diffsound_tpu.solvers.diff_eigs import rayleigh_corrected_eigenvalues
from diffsound_tpu.solvers.arpack import eigsh_shift_invert


def make_problem(order=1, n=3, youngs=2.1e7, poisson=0.3, density=2.7):
    mesh = cube_tet_mesh(n)
    if order == 2:
        mesh = mesh.to_high_order(2)
    mu, lam = lame_params(youngs, poisson)
    ops = assembly.build_element_ops(
        jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), order, dtype=jnp.float64
    )
    return mesh, ops, mu, lam, density


class TestLobpcg:
    def test_random_spd_pencil(self):
        """Small dense SPD pencil vs scipy.linalg.eigh."""
        import scipy.linalg

        rng = np.random.default_rng(0)
        n, m = 120, 8
        Q = rng.standard_normal((n, n))
        A = Q @ np.diag(rng.uniform(1.0, 1e3, n)) @ Q.T
        A = 0.5 * (A + A.T)
        R = rng.standard_normal((n, n)) * 0.1
        B = np.eye(n) + R @ R.T

        ref = scipy.linalg.eigh(A, B, eigvals_only=True)[:m]
        res = lobpcg(
            lambda x: jnp.asarray(A) @ x,
            lambda x: jnp.asarray(B) @ x,
            jnp.asarray(rng.standard_normal((n, m))),
            precond_fn=jacobi_preconditioner(jnp.asarray(np.diag(A))),
            max_iters=300,
            tol=1e-9,
        )
        np.testing.assert_allclose(np.asarray(res.eigenvalues), ref, rtol=1e-7)

    @pytest.mark.parametrize("order", [1, 2])
    def test_fem_modes_vs_arpack(self, order):
        """Smallest modes of the FEM pencil match scipy shift-invert."""
        mesh, ops, mu, lam, density = make_problem(order=order, n=3)
        K, M = assembly.assemble_scipy(ops, mu, lam, density)
        k = 16
        ref_vals, _ = eigsh_shift_invert(K, M, k=k, sigma=100.0)

        a_fn = lambda x: assembly.k_matvec(ops, x, mu, lam)
        b_fn = lambda x: assembly.m_matvec(ops, x, density)
        pc = jacobi_preconditioner(assembly.k_diag(ops, mu, lam))
        rng = np.random.default_rng(1)
        x0 = jnp.asarray(rng.standard_normal((3 * mesh.num_vertices, k)))
        res = lobpcg(a_fn, b_fn, x0, precond_fn=pc, max_iters=500, tol=1e-8)
        vals = np.asarray(res.eigenvalues)
        # first 6 are rigid-body (near zero wrt spectrum scale)
        assert np.all(np.abs(vals[:6]) < 1e-5 * abs(ref_vals[-1]))
        np.testing.assert_allclose(vals[6:], ref_vals[6:], rtol=1e-5)

    def test_warm_start_converges_fast(self):
        mesh, ops, mu, lam, density = make_problem(order=1, n=3)
        a_fn = lambda x: assembly.k_matvec(ops, x, mu, lam)
        b_fn = lambda x: assembly.m_matvec(ops, x, density)
        pc = jacobi_preconditioner(assembly.k_diag(ops, mu, lam))
        rng = np.random.default_rng(2)
        x0 = jnp.asarray(rng.standard_normal((3 * mesh.num_vertices, 10)))
        res = lobpcg(a_fn, b_fn, x0, precond_fn=pc, max_iters=400, tol=1e-8)

        # perturb material slightly, warm-start from previous vectors
        mu2, lam2 = mu * 1.02, lam * 1.02
        a2 = lambda x: assembly.k_matvec(ops, x, mu2, lam2)
        res2 = lobpcg(
            a2, b_fn, res.eigenvectors, precond_fn=pc, max_iters=400, tol=1e-8
        )
        assert int(res2.iterations) < int(res.iterations) / 2

    def test_reuse_products_warm_refresh(self):
        """The carried-products body (reuse_products=True, the training-loop
        hot path) reaches the same Ritz values as the recompute body on a
        warm-started refresh at the production tolerance."""
        mesh, ops, mu, lam, density = make_problem(order=1, n=3)
        a_fn = lambda x: assembly.k_matvec(ops, x, mu, lam)
        b_fn = lambda x: assembly.m_matvec(ops, x, density)
        pc = jacobi_preconditioner(assembly.k_diag(ops, mu, lam))
        rng = np.random.default_rng(4)
        x0 = jnp.asarray(rng.standard_normal((3 * mesh.num_vertices, 10)))
        cold = lobpcg(a_fn, b_fn, x0, precond_fn=pc, max_iters=400, tol=1e-8)

        mu2, lam2 = mu * 1.02, lam * 1.02
        a2 = lambda x: assembly.k_matvec(ops, x, mu2, lam2)
        ref = lobpcg(
            a2, b_fn, cold.eigenvectors, precond_fn=pc, max_iters=40, tol=1e-6
        )
        fast = lobpcg(
            a2, b_fn, cold.eigenvectors, precond_fn=pc, max_iters=40,
            tol=1e-6, reuse_products=True,
        )
        scale = float(np.abs(np.asarray(ref.eigenvalues)).max())
        np.testing.assert_allclose(
            np.asarray(fast.eigenvalues) / scale,
            np.asarray(ref.eigenvalues) / scale,
            atol=1e-6,
        )

    def test_f32_modes_accurate(self):
        """f32 solve (TPU production dtype) reaches ~1e-4 relative accuracy."""
        mesh = cube_tet_mesh(3)
        mu, lam = lame_params(2.1e7, 0.3)
        density = 2.7
        ops64 = assembly.build_element_ops(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), 1, dtype=jnp.float64
        )
        K, M = assembly.assemble_scipy(ops64, mu, lam, density)
        ref_vals, _ = eigsh_shift_invert(K, M, k=12, sigma=100.0)

        ops = assembly.build_element_ops(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), 1, dtype=jnp.float32
        )
        a_fn = lambda x: assembly.k_matvec(ops, x, mu, lam)
        b_fn = lambda x: assembly.m_matvec(ops, x, density)
        pc = jacobi_preconditioner(assembly.k_diag(ops, mu, lam))
        rng = np.random.default_rng(3)
        x0 = jnp.asarray(
            rng.standard_normal((3 * mesh.num_vertices, 12)), dtype=jnp.float32
        )
        res = lobpcg(a_fn, b_fn, x0, precond_fn=pc, max_iters=600, tol=3e-6)
        vals = np.asarray(res.eigenvalues)
        np.testing.assert_allclose(vals[6:], ref_vals[6:], rtol=2e-3)


class TestDifferentiableEigenvalues:
    def test_value_matches_solver(self):
        mesh, ops, mu, lam, density = make_problem(order=1, n=2)
        K, M = assembly.assemble_scipy(ops, mu, lam, density)
        vals, vecs = eigsh_shift_invert(K, M, k=10, sigma=100.0)
        lam_t = rayleigh_corrected_eigenvalues(
            lambda x: assembly.k_matvec(ops, x, mu, lam),
            lambda x: assembly.m_matvec(ops, x, density),
            jnp.asarray(vals),
            jnp.asarray(vecs),
        )
        # rigid modes are ~0: compare with an absolute tolerance scaled to
        # the spectrum (the correction is exact only at convergence)
        np.testing.assert_allclose(
            np.asarray(lam_t), vals, rtol=1e-6, atol=1e-7 * np.abs(vals).max()
        )

    def test_material_gradient_matches_fd(self):
        """d lambda / d E via Rayleigh correction == finite differences of
        the true eigenvalues."""
        mesh = cube_tet_mesh(2)
        density = 2.7
        E0, nu = 2.1e7, 0.3
        ops = assembly.build_element_ops(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), 1, dtype=jnp.float64
        )

        def true_eigs(E):
            mu, lam = lame_params(E, nu)
            K, M = assembly.assemble_scipy(ops, mu, lam, density)
            vals, _ = eigsh_shift_invert(K, M, k=10, sigma=100.0)
            return vals

        mu0, lam0 = lame_params(E0, nu)
        K, M = assembly.assemble_scipy(ops, mu0, lam0, density)
        vals, vecs = eigsh_shift_invert(K, M, k=10, sigma=100.0)
        vecs_j = jnp.asarray(vecs)
        vals_j = jnp.asarray(vals)

        def corrected(E):
            mu, lam = lame_params(E, nu)
            return rayleigh_corrected_eigenvalues(
                lambda x: assembly.k_matvec(ops, x, mu, lam),
                lambda x: assembly.m_matvec(ops, x, density),
                vals_j,
                vecs_j,
            )

        grad = jax.jacobian(corrected)(E0)
        h = E0 * 1e-5
        fd = (true_eigs(E0 + h) - true_eigs(E0 - h)) / (2 * h)
        # compare non-rigid modes (rigid eigenvalues stay ~0)
        np.testing.assert_allclose(np.asarray(grad)[6:], fd[6:], rtol=1e-4)

    def test_vertex_gradient_matches_fd(self):
        """d lambda / d vertex via the differentiable assembly path."""
        mesh = cube_tet_mesh(2)
        # break the cube's symmetry so eigenvalues are simple (degenerate
        # eigenvalues have no well-defined per-mode derivative)
        rng0 = np.random.default_rng(11)
        jig = mesh.vertices + 0.06 * rng0.standard_normal(mesh.vertices.shape)
        mesh = type(mesh)(jig, mesh.tets, order=1)
        density = 2.7
        mu, lam = lame_params(2.1e7, 0.3)
        verts0 = jnp.asarray(mesh.vertices)
        tets = jnp.asarray(mesh.tets)

        import scipy.linalg

        def true_eigs(verts):
            # dense eigh: FD ground truth must be far more accurate than
            # the ARPACK solve tolerance
            ops = assembly.build_element_ops(verts, tets, 1, dtype=jnp.float64)
            K, M = assembly.assemble_scipy(ops, mu, lam, density)
            return scipy.linalg.eigh(K.toarray(), M.toarray(), eigvals_only=True)[:8]

        ops0 = assembly.build_element_ops(verts0, tets, 1, dtype=jnp.float64)
        K, M = assembly.assemble_scipy(ops0, mu, lam, density)
        w, V = scipy.linalg.eigh(K.toarray(), M.toarray())
        vals_j, vecs_j = jnp.asarray(w[:8]), jnp.asarray(V[:, :8])

        def corrected_mode7(verts):
            ops = assembly.build_element_ops(verts, tets, 1, dtype=jnp.float64)
            lams = rayleigh_corrected_eigenvalues(
                lambda x: assembly.k_matvec(ops, x, mu, lam),
                lambda x: assembly.m_matvec(ops, x, density),
                vals_j,
                vecs_j,
            )
            return lams[7]

        g = jax.grad(corrected_mode7)(verts0)
        rng = np.random.default_rng(4)
        gmax = np.abs(np.asarray(g)).max()
        for _ in range(3):
            vi = rng.integers(0, mesh.num_vertices)
            d = rng.integers(0, 3)
            h = 1e-6
            vp = np.array(verts0).copy()
            vp[vi, d] += h
            vm = np.array(verts0).copy()
            vm[vi, d] -= h
            fd = (true_eigs(jnp.asarray(vp))[7] - true_eigs(jnp.asarray(vm))[7]) / (
                2 * h
            )
            assert abs(np.asarray(g)[vi, d] - fd) < 1e-5 * gmax


class TestRitzRefinedEigenvalues:
    """ritz_refined_eigenvalues: value + gradient correctness under the
    warm-basis corruption that broke the round-3 thickness run (in-
    subspace rotation of clustered columns, results/r4/
    thickness_warm_grad.txt: per-column gradient -8.57 vs exact +2.33)."""

    def _setup(self):
        from diffsound_tpu.solvers.diff_eigs import ritz_refined_eigenvalues

        mesh = cube_tet_mesh(2)
        rng = np.random.default_rng(11)
        verts0 = jnp.asarray(
            np.asarray(mesh.vertices) * (1 + 0.05 * rng.standard_normal(3))
        )
        tets = jnp.asarray(mesh.tets)
        density = 2.7
        mu, lam = lame_params(2.1e7, 0.3)
        ops = assembly.build_element_ops(verts0, tets, 1, dtype=jnp.float64)
        K, M = assembly.assemble_scipy(ops, mu, lam, density)
        vals, vecs = eigsh_shift_invert(K, M, k=12, sigma=100.0)
        return ritz_refined_eigenvalues, verts0, tets, density, mu, lam, ops, vals, vecs

    def _corrupt(self, vecs, rng):
        """In-subspace rotation + small out-of-subspace noise: the state a
        nominally-converged warm f32 solve leaves a clustered basis in."""
        import scipy.linalg

        k = vecs.shape[1]
        Q = scipy.linalg.qr(rng.standard_normal((k, k)))[0]
        U = vecs @ Q
        U = U + 1e-4 * rng.standard_normal(U.shape) * np.abs(U).max()
        return U

    def test_values_survive_basis_rotation(self):
        rrf, verts0, tets, density, mu, lam, ops, vals, vecs = self._setup()
        rng = np.random.default_rng(5)
        U = self._corrupt(vecs, rng)
        theta = rrf(
            lambda x: assembly.k_matvec(ops, x, mu, lam),
            lambda x: assembly.m_matvec(ops, x, density),
            jnp.asarray(U),
        )
        # per-column correction on the same rotated basis is garbage;
        # the Ritz refinement recovers the true eigenvalues
        np.testing.assert_allclose(
            np.asarray(theta)[6:], vals[6:], rtol=1e-5
        )

    def test_exact_basis_reduces_to_rayleigh(self):
        rrf, verts0, tets, density, mu, lam, ops, vals, vecs = self._setup()
        theta = rrf(
            lambda x: assembly.k_matvec(ops, x, mu, lam),
            lambda x: assembly.m_matvec(ops, x, density),
            jnp.asarray(vecs),
        )
        np.testing.assert_allclose(
            np.asarray(theta), vals, rtol=1e-8, atol=1e-7 * np.abs(vals).max()
        )

    def test_vertex_gradient_survives_basis_rotation(self):
        """The round-3 failure mode: gradient w.r.t. geometry through a
        rotated basis.  Per-column correction flips signs; the Ritz
        refinement matches finite differences of the true loss."""
        rrf, verts0, tets, density, mu, lam, ops, vals, vecs = self._setup()
        rng = np.random.default_rng(9)
        U = jnp.asarray(self._corrupt(vecs, rng))
        tgt = jnp.asarray(vals[6:] * 1.1)

        def loss(verts, basis):
            ops_v = assembly.build_element_ops(verts, tets, 1, dtype=jnp.float64)
            th = rrf(
                lambda x: assembly.k_matvec(ops_v, x, mu, lam),
                lambda x: assembly.m_matvec(ops_v, x, density),
                basis,
            )[6:]
            return jnp.mean((th - tgt) ** 2 / tgt**2)

        def true_loss(verts):
            ops_v = assembly.build_element_ops(verts, tets, 1, dtype=jnp.float64)
            Kv, Mv = assembly.assemble_scipy(ops_v, mu, lam, density)
            w, _ = eigsh_shift_invert(Kv, Mv, k=12, sigma=100.0)
            return float(np.mean((w[6:] - np.asarray(tgt)) ** 2 / np.asarray(tgt) ** 2))

        g = jax.grad(loss)(verts0, U)
        gmax = np.abs(np.asarray(g)).max()
        for vi, d in [(3, 0), (7, 2), (12, 1)]:
            h = 1e-6
            vp = np.array(verts0).copy(); vp[vi, d] += h
            vm = np.array(verts0).copy(); vm[vi, d] -= h
            fd = (true_loss(jnp.asarray(vp)) - true_loss(jnp.asarray(vm))) / (2 * h)
            assert abs(np.asarray(g)[vi, d] - fd) < 2e-3 * gmax, (vi, d)


class TestSolverExtras:
    def _pencil(self):
        rng = np.random.default_rng(7)
        n, m = 80, 10
        Q = rng.standard_normal((n, n))
        A = Q @ np.diag(rng.uniform(1.0, 1e3, n)) @ Q.T
        A = 0.5 * (A + A.T)
        B = np.eye(n)
        x0 = rng.standard_normal((n, m))
        return A, B, x0

    def test_record_history(self):
        A, B, x0 = self._pencil()
        res = lobpcg(
            lambda x: jnp.asarray(A) @ x,
            lambda x: jnp.asarray(B) @ x,
            jnp.asarray(x0),
            max_iters=200,
            tol=1e-9,
            record_history=True,
        )
        hist = np.asarray(res.history)
        it = int(res.iterations)
        assert hist.shape == (200,)
        assert np.all(np.isfinite(hist[:it]))
        assert np.all(np.isnan(hist[it:]))
        # converged: last recorded residual at or below a loose multiple of tol
        assert hist[it - 1] < 1e-6

    def test_profiled_loop_matches_while_loop(self, tmp_path):
        A, B, x0 = self._pencil()
        kw = dict(max_iters=60, tol=1e-9)
        r1 = lobpcg(
            lambda x: jnp.asarray(A) @ x, lambda x: jnp.asarray(B) @ x,
            jnp.asarray(x0), **kw,
        )
        r2 = lobpcg(
            lambda x: jnp.asarray(A) @ x, lambda x: jnp.asarray(B) @ x,
            jnp.asarray(x0), profiler=str(tmp_path / "trace"), **kw,
        )
        np.testing.assert_allclose(
            np.asarray(r1.eigenvalues), np.asarray(r2.eigenvalues), rtol=1e-8
        )

    def test_freq_cutoff_wrapper(self):
        """lobpcg_solver_freq parity: drops rigid block + cutoff mask
        (/root/reference/src/utils/utils.py:80-90)."""
        from diffsound_tpu.solvers.lobpcg import lobpcg_solver_freq
        import scipy.linalg

        A, B, x0 = self._pencil()
        ref = scipy.linalg.eigh(A, B, eigvals_only=True)
        # cutoff above the 8th eigenvalue: freq = sqrt(lam)/2pi
        lim = float(np.sqrt(ref[7]) / (2 * np.pi)) + 1e-9
        vals, vecs = lobpcg_solver_freq(
            lambda x: jnp.asarray(A) @ x,
            lambda x: jnp.asarray(B) @ x,
            jnp.asarray(x0),
            freq_limit=lim,
            rigid_modes=2,
            max_iters=300,
            tol=1e-10,
        )
        np.testing.assert_allclose(vals, ref[2:8], rtol=1e-6)
        assert vecs.shape[1] == len(vals)
