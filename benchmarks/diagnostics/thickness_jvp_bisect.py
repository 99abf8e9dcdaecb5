"""Bisect the wrong Gauss-Newton direction seen on the TPU at grid 64
(thickness, cold exact basis, c=0.5 stepped UP 0.5 -> 0.5126).

Axes: {reverse-mode, forward-mode(jvp)} x {ritz_refined, rayleigh} x
{f32-cast sdf, raw f64 sdf} — all with the SAME exact host basis.
The known-good point is (reverse, rayleigh, f32): +2.26 at c=0.4755
(results/r4/thickness_warm_grad.txt step 0).

Run (TPU): python benchmarks/diagnostics/thickness_jvp_bisect.py
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
    from diffsound_tpu.solvers.diff_eigs import (
        rayleigh_corrected_eigenvalues, ritz_refined_eigenvalues,
    )

    print(f"# backend: {jax.default_backend()}", flush=True)
    verts, faces = read_obj("/root/reference/data/mesh/frog.obj")
    task = ThicknessTask(grid_res=64, scale=1.5, mat="Steel", mode_num=32)
    task.apply_sdf(verts * 1.5, faces)

    t0 = time.perf_counter()
    target = np.asarray(task.eigenvalues(0.3))
    print(f"# target(0.3) in {time.perf_counter()-t0:.0f}s", flush=True)

    c = 0.5
    dtype = task.dtype
    mu, lame_l = task._lame()
    th = jnp.asarray(float(c * task.max_thickness))
    out = task._march(task.sdf, th)
    comp = MarchingTets.compact(out)
    lam, U = task._eigensolve_host(out, comp)

    keep_idx = jnp.asarray(comp["keep_idx"])
    tets_c = jnp.asarray(comp["tets"])
    tet_mask = jnp.asarray(comp["tet_mask"], dtype)
    lam_j = jnp.asarray(lam, dtype)
    U_j = jnp.asarray(U, dtype)
    tgt = jnp.asarray(target, dtype)

    def make_loss(correction, cast_sdf):
        sdf = task.sdf.astype(dtype) if cast_sdf else task.sdf

        def f(coef):
            o = task._march(sdf, coef * task.max_thickness)
            vc = o.all_verts[keep_idx]
            ops = assembly.build_element_ops(
                vc, tets_c, 1, dtype=dtype, tet_mask=tet_mask
            )
            k_fn = lambda x: assembly.k_matvec(ops, x, mu, lame_l)
            m_fn = lambda x: assembly.m_matvec(ops, x, 1.0)
            if correction == "ritz":
                vals = ritz_refined_eigenvalues(k_fn, m_fn, U_j)
            else:
                vals = rayleigh_corrected_eigenvalues(k_fn, m_fn, lam_j, U_j)
            vals = vals[task.extra_modes:]
            return jnp.mean((vals - tgt) ** 2 / tgt**2)

        return f

    for correction in ("rayleigh", "ritz"):
        for cast_sdf in (True, False):
            f = make_loss(correction, cast_sdf)
            cj = jnp.asarray(c, dtype)
            t0 = time.perf_counter()
            v_r, g_r = jax.jit(jax.value_and_grad(f))(cj)
            v_f, g_f = jax.jit(
                lambda x: jax.jvp(f, (x,), (jnp.ones((), x.dtype),))
            )(cj)
            print(json.dumps({
                "correction": correction,
                "sdf_dtype": "f32" if cast_sdf else "f64",
                "loss_rev": float(v_r), "grad_rev": float(g_r),
                "loss_fwd": float(v_f), "grad_fwd": float(g_f),
                "dt_s": round(time.perf_counter() - t0, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
