"""Measure the thickness gradient THROUGH THE WARM BASIS on the TPU,
replicating the round-3 run state (frog, grid 64, Steel, 32 modes).

thickness_grad_check.py proved the autodiff gradient is exact with an
exact host basis (f64 matches FD to 4 digits, f32 within 3%, all
positive/downhill).  The r3 run walked uphill at warm/1-iteration
refreshes — so the warm f32 LOBPCG basis must corrupt the gradient.
This script anchors cold at 0.4755 (like the run), walks the coef in
r3-trajectory-sized steps exercising the warm path, then at each probe
point compares d(loss)/d(coef) with (a) the warm basis vs (b) a fresh
exact host basis, plus the warm residual actually reached.

Run (TPU): python benchmarks/diagnostics/thickness_warm_grad.py
"""

import json
import os
import sys
import time

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

    print(f"# backend: {jax.default_backend()}", flush=True)
    verts, faces = read_obj("/root/reference/data/mesh/frog.obj")
    task = ThicknessTask(grid_res=64, scale=1.5, mat="Steel", mode_num=32)
    task.apply_sdf(verts * 1.5, faces)

    t0 = time.perf_counter()
    target = np.asarray(task.eigenvalues(0.3))
    print(f"# target(0.3) in {time.perf_counter()-t0:.0f}s", flush=True)
    tgt64 = np.asarray(target, np.float64)

    dtype = task.dtype
    mu, lame_l = task._lame()

    def grad_with_basis(c, lam, U, comp):
        keep_idx = jnp.asarray(comp["keep_idx"])
        tets_c = jnp.asarray(comp["tets"])
        tet_mask = jnp.asarray(comp["tet_mask"], dtype)
        lam_j = jnp.asarray(lam, dtype)
        U_j = jnp.asarray(U, dtype)
        tgt = jnp.asarray(target, dtype)

        def f(coef):
            th = coef * task.max_thickness
            o = task._march(task.sdf.astype(dtype), th)
            vc = o.all_verts[keep_idx]
            ops = assembly.build_element_ops(
                vc, tets_c, 1, dtype=dtype, tet_mask=tet_mask
            )
            vals = rayleigh_corrected_eigenvalues(
                lambda x: assembly.k_matvec(ops, x, mu, lame_l),
                lambda x: assembly.m_matvec(ops, x, 1.0),
                lam_j, U_j,
            )[task.extra_modes:]
            return jnp.mean((vals - tgt) ** 2 / tgt**2)

        v, g = jax.value_and_grad(f)(jnp.asarray(c, dtype))
        return float(v), float(g)

    # replicate the r3 trajectory shape: anchor at 0.4755, walk up
    path = [0.4755, 0.4738, 0.4770, 0.4822, 0.4856, 0.4869, 0.4880, 0.4890]
    probes = {0.4738, 0.4822, 0.4869, 0.4890}
    for i, c in enumerate(path):
        th = jnp.asarray(float(c * task.max_thickness))
        out = task._march(task.sdf, th)
        comp = MarchingTets.compact(out)
        t0 = time.perf_counter()
        lam_w, U_w = task._eigensolve(out, comp)
        dt = time.perf_counter() - t0
        rec = {
            "step": i, "coef": c,
            "eig_mode": task.warm.last_mode,
            "eig_iters": task.warm.last_iterations,
            "eig_dt_s": round(dt, 1),
        }
        if c in probes or i == 0:
            v_w, g_w = grad_with_basis(c, lam_w, U_w, comp)
            lam_e, U_e = task._eigensolve_host(out, comp)
            v_e, g_e = grad_with_basis(c, lam_e, U_e, comp)
            # eigenvalue agreement: warm vs exact
            lw = np.asarray(lam_w, np.float64)
            le = np.asarray(lam_e, np.float64)
            rec.update({
                "warm": {"loss": v_w, "grad": g_w},
                "exact_basis": {"loss": v_e, "grad": g_e},
                "max_val_relerr": float(np.max(np.abs(lw - le) / np.abs(le))),
            })
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
