"""End-to-end retrain of round-2's worst pair (9: target E=8.86e10
nu=0.211, stalled at 6.23e10/0.123) with the new freq-chamfer recipe at
reduced epochs on CPU."""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/benchmarks", 1)[0])

import jax

from diffsound_tpu.experiments.material_sync import (
    MaterialSyncTask, random_material_pairs,
)
from diffsound_tpu.fem.mesh import TetMesh

PAIR = int(sys.argv[1]) if len(sys.argv) > 1 else 9
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
EARLY = int(sys.argv[3]) if len(sys.argv) > 3 else 600

pairs = random_material_pairs(jax.random.PRNGKey(0), 16)
init_mat, gt_mat = pairs[PAIR]
print(f"pair {PAIR}: init E={init_mat[1]:.4g} nu={init_mat[2]:.4f} "
      f"target E={gt_mat[1]:.4g} nu={gt_mat[2]:.4f}", flush=True)

bowl = TetMesh.from_file("/root/reference/data/mesh/bowl/bowl.obj_.msh")
task = MaterialSyncTask(mesh=bowl, mode_num=16, exp_mode=3)
gt_audio, gt_freqs = task.make_gt(gt_mat)

t0 = time.time()
res = task.train(
    init_mat, gt_audio, max_epoch=EPOCHS, early_loss_epoch=EARLY,
    seed=PAIR, verbose=True, log_every=30,
)
relE = abs(res["youngs"] - gt_mat[1]) / gt_mat[1]
dnu = abs(res["poisson"] - gt_mat[2])
print(f"RESULT pair {PAIR}: E {res['youngs']:.4g} (target {gt_mat[1]:.4g}, "
      f"rel {relE:.3%}) nu {res['poisson']:.4f} (target {gt_mat[2]:.4f}, "
      f"abs {dnu:.4f}) rmse {res['rmse']:.3f} "
      f"[{time.time()-t0:.0f}s, {res['iters_per_sec']:.2f} it/s]")
