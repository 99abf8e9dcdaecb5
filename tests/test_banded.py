"""Block-banded operators: matvec parity with the element path, and a
full LOBPCG solve driven through the banded pencil."""

import numpy as np
import jax
import jax.numpy as jnp

from diffsound_tpu.fem import assembly
from diffsound_tpu.fem.banded import build_banded_pencil
from diffsound_tpu.fem.material import lame_params
from diffsound_tpu.fem.mesh import cube_tet_mesh


def setup(order=2, n=2):
    mesh = cube_tet_mesh(n, size=0.1)
    if order == 2:
        mesh = mesh.to_high_order(2)
    ops = assembly.build_element_ops(
        jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), order, dtype=jnp.float64
    )
    return mesh, ops


def test_banded_matvec_matches_element_path():
    mesh, ops = setup()
    mu, lam = lame_params(7.2e10 / 2700, 0.19)
    pencil = build_banded_pencil(ops)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((3 * mesh.num_vertices, 5)).astype(np.float32))

    ref_k = np.asarray(assembly.k_matvec(ops, X.astype(jnp.float64), mu, lam))
    out_k = np.asarray(
        pencil.unpermute(pencil.k_matvec(pencil.permute(X), mu, lam))
    )
    rel = np.abs(out_k - ref_k).max() / np.abs(ref_k).max()
    assert rel < 5e-5, rel  # terms=2 split: ~1e-5-grade operator

    ref_m = np.asarray(assembly.m_matvec(ops, X.astype(jnp.float64), 1.0))
    out_m = np.asarray(pencil.unpermute(pencil.m_matvec(pencil.permute(X))))
    rel_m = np.abs(out_m - ref_m).max() / np.abs(ref_m).max()
    assert rel_m < 5e-5, rel_m


def test_banded_lobpcg_solve():
    """LOBPCG driven by the banded pencil finds the same modes (to the
    banded operator's accuracy) as ARPACK on the exact matrices."""
    from diffsound_tpu.solvers.arpack import eigsh_shift_invert
    from diffsound_tpu.solvers.lobpcg import jacobi_preconditioner, lobpcg

    mesh, ops = setup(order=1, n=3)
    mu, lam = lame_params(7.2e10 / 2700, 0.19)
    K, M = assembly.assemble_scipy(ops, mu, lam, 1.0)
    ref_vals, _ = eigsh_shift_invert(K, M, k=12, sigma=1e5)

    pencil = build_banded_pencil(ops)
    d = assembly.k_diag(ops, mu, lam).astype(jnp.float32)
    pc_diag = jnp.asarray(np.asarray(d))[pencil.perm]
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(
        rng.standard_normal((3 * mesh.num_vertices, 12)).astype(np.float32)
    )
    res = lobpcg(
        lambda x: pencil.k_matvec(x, mu, lam),
        lambda x: pencil.m_matvec(x),
        pencil.permute(x0),
        precond_fn=jacobi_preconditioner(pc_diag),
        max_iters=500,
        tol=1e-5,
        gram_dtype=jnp.float64,
    )
    vals = np.asarray(res.eigenvalues)
    np.testing.assert_allclose(vals[6:], ref_vals[6:], rtol=5e-4)


def test_bandwidth_sanity():
    mesh, ops = setup(order=1, n=3)
    pencil = build_banded_pencil(ops)
    n = 3 * mesh.num_vertices
    assert pencil.k_mu.bandwidth < n // 2  # RCM actually reduced the band
    # permutation is a bijection
    p = np.asarray(pencil.perm)
    assert len(np.unique(p)) == n
