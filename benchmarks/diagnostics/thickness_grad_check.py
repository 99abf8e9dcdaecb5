"""Diagnose the thickness-gradient sign at reference config (frog, grid
64, Steel, 32 modes, ord 1).

Round-3 evidence (results/r3/thickness_grid64_target0.3_run.txt) shows
the loss landscape is exactly monotone toward the 0.3 target, yet Adam
walks the coef UP from ~0.475 and asymptotically freezes at 0.4890 even
after warm refreshes converge in <25 iterations.  That trajectory is the
signature of a *deterministic* autodiff gradient that is negative (or
zero) where the true slope is positive — not of early-iteration noise.

This script measures, at several coefficients around the freeze point:
  * d(loss)/d(coef) by autodiff through the Rayleigh correction, with an
    EXACT host-ARPACK basis at the same coefficient (isolates the
    differentiable-march formulation from basis quality),
  * the same autodiff gradient in f32 vs f64 (isolates precision),
  * the true slope by central finite differences of the exact loss
    (fresh eigensolves at c +- h).

Run: JAX_PLATFORMS=cpu python benchmarks/diagnostics/thickness_grad_check.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from diffsound_tpu.fem import assembly
    from diffsound_tpu.fem.mesh import read_obj
    from diffsound_tpu.geometry.dmtet import MarchingTets
    from diffsound_tpu.geometry.tasks import ThicknessTask
    from diffsound_tpu.solvers.diff_eigs import rayleigh_corrected_eigenvalues

    verts, faces = read_obj("/root/reference/data/mesh/frog.obj")
    task = ThicknessTask(grid_res=64, scale=1.5, mat="Steel", mode_num=32)
    task.apply_sdf(verts * 1.5, faces)

    t0 = time.perf_counter()
    target = np.asarray(task.eigenvalues(0.3))
    print(f"# target(0.3) in {time.perf_counter()-t0:.0f}s", flush=True)

    def exact_loss(c):
        vals = np.asarray(task.eigenvalues(c))
        return float(np.mean((vals - target) ** 2 / target**2))

    def autodiff_grad(c, dtype):
        """d loss / d coef with an exact basis at c, via the same
        differentiable pass as ThicknessTask._loss_core."""
        th = jnp.asarray(c * task.max_thickness)
        out = task._march(task.sdf, th)
        comp = MarchingTets.compact(out)
        lam, U = task._eigensolve_host(out, comp)

        keep_idx = jnp.asarray(comp["keep_idx"])
        tets_c = jnp.asarray(comp["tets"])
        tet_mask = jnp.asarray(comp["tet_mask"], dtype)
        lam_j = jnp.asarray(lam, dtype)
        U_j = jnp.asarray(U, dtype)
        tgt = jnp.asarray(target, dtype)
        mu, lame_l = task._lame()

        def f(coef):
            th = coef * task.max_thickness
            o = task._march(task.sdf.astype(dtype), th)
            verts_c = o.all_verts[keep_idx]
            ops = assembly.build_element_ops(
                verts_c, tets_c, 1, dtype=dtype, tet_mask=tet_mask
            )
            vals = rayleigh_corrected_eigenvalues(
                lambda x: assembly.k_matvec(ops, x, mu, lame_l),
                lambda x: assembly.m_matvec(ops, x, 1.0),
                lam_j,
                U_j,
            )[task.extra_modes:]
            return jnp.mean((vals - tgt) ** 2 / tgt**2)

        v, g = jax.value_and_grad(f)(jnp.asarray(c, dtype))
        return float(v), float(g)

    h = 0.004
    for c in [0.45, 0.475, 0.489]:
        t0 = time.perf_counter()
        v64, g64 = autodiff_grad(c, jnp.float64)
        v32, g32 = autodiff_grad(c, jnp.float32)
        lp, lm = exact_loss(c + h), exact_loss(c - h)
        fd = (lp - lm) / (2 * h)
        print(json.dumps({
            "coef": c,
            "autodiff_f64": {"loss": v64, "grad": g64},
            "autodiff_f32": {"loss": v32, "grad": g32},
            "fd_exact": fd,
            "loss_pm": [lm, lp],
            "dt_s": round(time.perf_counter() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
