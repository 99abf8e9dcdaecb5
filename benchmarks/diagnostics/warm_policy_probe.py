"""Refresh-policy probe for the post-jump warm solves that hit the
240-iteration cap in every round-4 shape run (e.g. thickness newton
iter 0->1, coef 0.5 -> 0.42: warm/240, 28-113 s).

Reproduces the exact scenario — cold anchor at c=0.50, then ONE 0.08
coef jump — and solves the jumped geometry from the SAME stored basis
under competing policies:

  * reuse240      one carried-products round, cap 240 (round-4 round 1)
  * recompute240  one recompute round, cap 240 (round-4 escalation body)
  * reuse60x4     up to 4 carried-products rounds of 60 — every re-entry
                  rebuilds the products from the current basis, so
                  rotation drift resets at 1/4 the horizon while the
                  body stays the cheap 2m-column one
  * reuse120+120  two rounds of 120

Each policy reports wall-clock per round, final max residual, and the
relative eigenvalue error vs a host ARPACK solve of the jumped mesh.

Run: python benchmarks/diagnostics/warm_policy_probe.py [grid_res]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import jax

    from diffsound_tpu.config import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from diffsound_tpu.fem.mesh import read_obj
    from diffsound_tpu.geometry.dmtet import MarchingTets
    from diffsound_tpu.geometry.tasks import ThicknessTask

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    task = ThicknessTask(grid_res=grid, scale=1.5, mat="Steel", mode_num=32)
    mverts, mfaces = read_obj("/root/reference/data/mesh/frog.obj")
    task.apply_sdf(mverts * 1.5, mfaces)
    warm = task.warm
    mu, lam = task._lame()

    # cold anchor at c = 0.50
    out0 = task._march_coef(jnp.asarray(0.5))
    comp0 = MarchingTets.compact(out0)
    t0 = time.perf_counter()
    task._eigensolve(out0, comp0)
    print(json.dumps({"stage": "cold_anchor", "dt_s": round(
        time.perf_counter() - t0, 1), "mode": warm.last_mode}), flush=True)

    # the jumped geometry + host truth
    out1 = task._march_coef(jnp.asarray(0.42))
    comp1 = MarchingTets.compact(out1)
    t0 = time.perf_counter()
    vals_ref, _ = task._eigensolve_host(out1, comp1)
    print(json.dumps({"stage": "host_truth", "dt_s": round(
        time.perf_counter() - t0, 1)}), flush=True)

    warm._fill_new_slots(out1, comp1)
    args, (vpad, tpad, D) = warm._prep_args(out1, comp1, float(mu), float(lam))
    U_saved = warm.U_global + 0.0  # snapshot (solve donates U_global)
    jax.block_until_ready(U_saved)

    policies = {
        "reuse240": [(True, 240)],
        "recompute240": [(False, 240)],
        "reuse60x4": [(True, 60)] * 4,
        "reuse120x2": [(True, 120)] * 2,
        "reuse30x8": [(True, 30)] * 8,
    }
    k = warm.k
    save_cap = warm.max_iters

    def run_policy(rounds, record):
        """One pass over the policy's rounds from the saved basis.
        record=False is the compile pass (programs cached per (reuse,
        cap) signature); record=True is the timed pass."""
        warm.U_global = U_saved + 0.0
        jax.block_until_ready(warm.U_global)
        entries = []
        for reuse, cap in rounds:
            key = (reuse, cap)
            if key not in fns:
                warm.max_iters = cap
                warm._solve_cache.pop((vpad, tpad, D, reuse), None)
                fns[key] = warm._solve_fn(vpad, tpad, D, reuse)
                warm._solve_cache.pop((vpad, tpad, D, reuse), None)
            t0 = time.perf_counter()
            vals, U, warm.U_global, iters, resid = fns[key](
                warm.U_global, *args)
            resid = np.asarray(resid)
            dt = time.perf_counter() - t0
            if record:
                err = float(np.max(np.abs(
                    (np.asarray(vals[6:k], np.float64) - vals_ref[6:k])
                    / vals_ref[6:k])))
                entries.append({
                    "reuse": reuse, "cap": cap, "iters": int(iters),
                    "dt_s": round(dt, 2),
                    "max_resid": round(float(resid.max()), 5),
                    "max_val_relerr": round(err, 6),
                })
            if float(resid.max()) <= warm.tol:
                break
        return entries

    fns = {}
    for name, rounds in policies.items():
        run_policy(rounds, record=False)  # compile pass
        entries = run_policy(rounds, record=True)
        rec = {"policy": name, "rounds": entries,
               "total_iters": sum(r["iters"] for r in entries),
               "total_dt_s": round(sum(r["dt_s"] for r in entries), 2),
               "final_resid": entries[-1]["max_resid"],
               "final_val_relerr": entries[-1]["max_val_relerr"]}
        print(json.dumps(rec), flush=True)
    warm.max_iters = save_cap


if __name__ == "__main__":
    main()
