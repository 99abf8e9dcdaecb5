"""Test the closed-form modal-Newton fit on failing pairs, cold from init."""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/benchmarks", 1)[0])

import jax
import jax.numpy as jnp

from diffsound_tpu.audio.freq_loss import extract_spectral_peaks
from diffsound_tpu.experiments.material_sync import (
    MaterialSyncTask, random_material_pairs,
)
from diffsound_tpu.fem.material import lame_params
from diffsound_tpu.fem.mesh import TetMesh
from diffsound_tpu.models.modal_fit import ModalNewtonFitter
from diffsound_tpu.models.sound_obj import build_model

pairs = random_material_pairs(jax.random.PRNGKey(0), 16)
bowl = TetMesh.from_file("/root/reference/data/mesh/bowl/bowl.obj_.msh")
task = MaterialSyncTask(mesh=bowl, mode_num=16, exp_mode=3)

for idx in [int(a) for a in sys.argv[1:]] or [9]:
    init_mat, gt_mat = pairs[idx]
    gt_audio, _ = task.make_gt(gt_mat)
    peaks, wts = extract_spectral_peaks(np.asarray(gt_audio), task.sample_rate)
    model = build_model(mesh=bowl, mode_num=16, order=2, mat=init_mat,
                        task="material", dtype=jnp.float32)
    fitter = ModalNewtonFitter(
        model, peaks, wts, task.sample_rate, init_mat[3], init_mat[4]
    )
    mu0, lam0 = lame_params(init_mat[1] / init_mat[0], init_mat[2])
    t0 = time.time()
    res = fitter.fit(float(mu0), float(lam0), rounds=20, verbose=False)
    relE = abs(res["E"] - gt_mat[1]) / gt_mat[1]
    dnu = abs(res["nu"] - gt_mat[2])
    print(f"PAIR {idx}: E {res['E']:.4g} (target {gt_mat[1]:.4g}, rel "
          f"{relE:.3%}) nu {res['nu']:.4f} (target {gt_mat[2]:.4f}, abs "
          f"{dnu:.4f}) in {time.time()-t0:.0f}s / {len(res['history'])} rounds",
          flush=True)
