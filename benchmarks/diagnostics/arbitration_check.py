"""End-to-end check of the multi-scheme peak-extraction arbitration in
train_newton (fit only, no polish): for each requested flagship pair,
run the default candidate schemes and report the ARBITRATED winner's
E/nu error vs the target.

Known per-scheme behavior this must beat (window_arbitration.py):
pair 1 needs bh_4096, pairs 3/4 need hann_4096 (bh locks 5x off),
pair 6 needs bh (hann misses the nu bar).

Run: JAX_PLATFORMS=cpu python benchmarks/diagnostics/arbitration_check.py [pair ...]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import jax

    from diffsound_tpu.experiments.material_sync import (
        MaterialSyncTask, random_material_pairs,
    )
    from diffsound_tpu.fem.mesh import TetMesh

    pair_ids = [int(a) for a in sys.argv[1:]] or [1, 3, 4, 6]
    mesh = TetMesh.from_file("/root/reference/data/mesh/bowl/bowl.obj_.msh")
    task = MaterialSyncTask(mesh=mesh)
    pairs = random_material_pairs(jax.random.PRNGKey(0), 16)

    n_pass = 0
    for pid in pair_ids:
        init_mat, gt_mat = pairs[pid]
        t0 = time.perf_counter()
        gt_audio, _ = task.make_gt(gt_mat)
        res = task.train_newton(init_mat, gt_audio, polish_epochs=0,
                                verbose=True)
        rec = {
            "pair": pid,
            "E": res["youngs"], "nu": res["poisson"],
            "E_relerr": abs(res["youngs"] - gt_mat[1]) / gt_mat[1],
            "nu_abserr": abs(res["poisson"] - gt_mat[2]),
            "dt_s": round(time.perf_counter() - t0, 1),
        }
        ok = rec["E_relerr"] <= 0.10 and rec["nu_abserr"] <= 0.05
        rec["pass"] = ok
        n_pass += ok
        print(json.dumps(rec), flush=True)
    print(f"# {n_pass}/{len(pair_ids)} pass (E<=10%, nu<=0.05)")


if __name__ == "__main__":
    main()
