"""Per-iteration cost breakdown of the warm-refresh LOBPCG body at the
grid-64 thickness scale (VERDICT r3 weak #6: the ~120-300 ms iteration
body is the shape-task refresh floor).

Builds the same diagonally-scaled padded operators WarmShapeEigensolver
uses (warm_eigs.py::_solve_fn), then times, jitted and synced:

  * a_fn / b_fn on the full (n, 3m) search block and the (n, m) block
  * _b_orthonormalize on (n, 3m)
  * _sym_eigh on the (3m, 3m) Gram matrix
  * end-to-end lobpcg per-iteration cost in recompute and carried-products
    modes ((t[N2] - t[N1]) / (N2 - N1) with tol=0 so no early exit)

Run: python benchmarks/diagnostics/refresh_profile.py [grid_res]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def timed(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax

    from diffsound_tpu.config import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from diffsound_tpu.fem import assembly
    from diffsound_tpu.fem.mesh import read_obj
    from diffsound_tpu.geometry.dmtet import MarchingTets
    from diffsound_tpu.geometry.tasks import ThicknessTask
    from diffsound_tpu.solvers.lobpcg import lobpcg, _b_orthonormalize, _sym_eigh

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    task = ThicknessTask(grid_res=grid, scale=1.5, mat="Steel", mode_num=32)
    mverts, mfaces = read_obj("/root/reference/data/mesh/frog.obj")
    task.apply_sdf(mverts * 1.5, mfaces)

    out = task._march_coef(jnp.asarray(0.5))
    comp = MarchingTets.compact(out)
    kg = task.warm.kg
    dtype = jnp.float32
    mu, lam = task._lame()

    # the production refresh operator, via the same prep solve() uses
    args, (vpad, tpad, D) = task.warm._prep_args(
        out, comp, float(mu), float(lam)
    )
    (_, _, verts_dev, tets_dev, tet_mask_dev, gidx_dev, dmask,
     mu_dev, lam_dev) = args

    ops = assembly.build_element_ops(
        verts_dev, tets_dev, 1, dtype=dtype, tet_mask=tet_mask_dev,
    )
    ops = ops._replace(gather_idx=gidx_dev)
    d = assembly.k_diag(ops, mu, lam)
    d = jnp.where(dmask > 0, d, 1.0)
    dsc = jax.lax.rsqrt(jnp.maximum(d, jnp.finfo(dtype).tiny))
    fz = assembly.freeze_stiffness(ops, mu, lam)
    a_fn = jax.jit(lambda y: dsc[:, None] * assembly.k_matvec_frozen(
        ops, fz, dsc[:, None] * y))
    b_fn = jax.jit(lambda y: dsc[:, None] * assembly.m_matvec(
        ops, dsc[:, None] * y, 1.0))

    n, m = 3 * vpad, kg
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (n, m), dtype) * dmask[:, None]
    S3 = jax.random.normal(key, (n, 3 * m), dtype) * dmask[:, None]

    rep = {
        "grid": grid, "vpad": vpad, "tpad": tpad, "n": n, "m": m,
        "num_verts": int(comp["num_verts"]), "num_tets": int(comp["num_tets"]),
        "backend": jax.default_backend(),
    }
    rep["a_fn_3m_ms"] = timed(a_fn, S3) * 1e3
    rep["a_fn_m_ms"] = timed(a_fn, X) * 1e3
    rep["b_fn_3m_ms"] = timed(b_fn, S3) * 1e3
    rep["b_fn_m_ms"] = timed(b_fn, X) * 1e3

    bortho = jax.jit(lambda s, bs: _b_orthonormalize(s, bs, jnp.float32)[0])
    BS3 = b_fn(S3)
    rep["b_ortho_3m_ms"] = timed(bortho, S3, BS3) * 1e3

    G = jax.random.normal(key, (3 * m, 3 * m), dtype)
    G = G @ G.T + 3 * m * jnp.eye(3 * m, dtype=dtype)
    eigh_j = jax.jit(lambda g: _sym_eigh(g)[0])
    rep["sym_eigh_3m_ms"] = timed(eigh_j, G) * 1e3

    for reuse in (False, True):
        def run(nit):
            f = jax.jit(lambda x: lobpcg(
                a_fn, b_fn, x, max_iters=nit, tol=0.0,
                reuse_products=reuse, row_mask=dmask,
                num_wanted=task.warm.k,
            ).eigenvalues)
            return timed(f, X, reps=3)

        t2, t12 = run(2), run(12)
        rep[f"lobpcg_iter_ms_{'reuse' if reuse else 'recompute'}"] = (
            (t12 - t2) / 10 * 1e3)

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in rep.items()}))


if __name__ == "__main__":
    main()
