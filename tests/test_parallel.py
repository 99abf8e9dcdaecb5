"""Multi-device sharding tests on the 8-way CPU-emulated mesh: sharded
operators must equal single-device results exactly (SURVEY.md section 4:
N-chip results tolerance-equal to 1-chip)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffsound_tpu.fem import assembly
from diffsound_tpu.fem.mesh import cube_tet_mesh
from diffsound_tpu.fem.material import lame_params
from diffsound_tpu.parallel.mesh import make_device_mesh
from diffsound_tpu.parallel.ops import ShardedFEM, pad_element_ops


@pytest.fixture(scope="module")
def problem():
    mesh = cube_tet_mesh(3)
    mu, lam = lame_params(2.1e7, 0.3)
    ops = assembly.build_element_ops(
        jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), 1, dtype=jnp.float64
    )
    return mesh, ops, mu, lam


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("ep", [2, 4, 8])
def test_sharded_k_matvec_matches(problem, ep):
    mesh, ops, mu, lam = problem
    dmesh = make_device_mesh(dp=8 // ep, ep=ep)
    sharded = ShardedFEM(ops, dmesh, axis="ep")
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((3 * mesh.num_vertices, 4)))
    ref = np.asarray(assembly.k_matvec(ops, X, mu, lam))
    out = np.asarray(sharded.k_matvec(X, mu, lam))
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-9)


def test_sharded_m_matvec_matches(problem):
    mesh, ops, mu, lam = problem
    dmesh = make_device_mesh(dp=2, ep=4)
    sharded = ShardedFEM(ops, dmesh, axis="ep")
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal((3 * mesh.num_vertices, 3)))
    ref = np.asarray(assembly.m_matvec(ops, X, 2.7))
    out = np.asarray(sharded.m_matvec(X, 2.7))
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)


def test_sharded_k_diag_matches(problem):
    mesh, ops, mu, lam = problem
    dmesh = make_device_mesh(dp=1, ep=8)
    sharded = ShardedFEM(ops, dmesh, axis="ep")
    ref = np.asarray(assembly.k_diag(ops, mu, lam))
    out = np.asarray(sharded.k_diag(mu, lam))
    np.testing.assert_allclose(out, ref, rtol=1e-12)


def test_pad_element_ops_preserves_matvec(problem):
    mesh, ops, mu, lam = problem
    padded = pad_element_ops(ops, 7)
    assert padded.num_tets % 7 == 0
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.standard_normal((3 * mesh.num_vertices, 2)))
    np.testing.assert_allclose(
        np.asarray(assembly.k_matvec(padded, X, mu, lam)),
        np.asarray(assembly.k_matvec(ops, X, mu, lam)),
        rtol=1e-12,
    )


def test_sharded_lobpcg_eigensolve(problem):
    """Full eigensolve through the sharded operators matches ARPACK."""
    from diffsound_tpu.solvers.lobpcg import lobpcg, jacobi_preconditioner
    from diffsound_tpu.solvers.arpack import eigsh_shift_invert

    mesh, ops, mu, lam = problem
    K, M = assembly.assemble_scipy(ops, mu, lam, 1.0)
    ref_vals, _ = eigsh_shift_invert(K, M, k=10, sigma=100.0)

    dmesh = make_device_mesh(dp=1, ep=8)
    sharded = ShardedFEM(ops, dmesh, axis="ep")
    pc = jacobi_preconditioner(sharded.k_diag(mu, lam))
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.standard_normal((3 * mesh.num_vertices, 10)))
    res = lobpcg(
        lambda x: sharded.k_matvec(x, mu, lam),
        lambda x: sharded.m_matvec(x, 1.0),
        x0,
        precond_fn=pc,
        max_iters=400,
        tol=1e-9,
    )
    vals = np.asarray(res.eigenvalues)
    np.testing.assert_allclose(vals[6:], ref_vals[6:], rtol=1e-6)
