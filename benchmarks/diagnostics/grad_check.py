"""Gradient diagnostic at pair 9's frozen point: the 2-D landscape shows
clear descent toward higher E at (E=6.23e10, nu=0.123), yet training sat
there for 2000 epochs.  Recompute the EXACT train-time gradient (cached
modal path, late L1 loss, f32) at the restored checkpoint and compare
with a finite-difference probe of the same jitted loss.
"""

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/benchmarks", 1)[0])

import jax
import jax.numpy as jnp

from diffsound_tpu.audio.mss_loss import MSSLoss
from diffsound_tpu.audio.oscillator import TraditionalOscillatorParams
from diffsound_tpu.experiments.material_sync import (
    MaterialSyncTask, impulse_forces, random_material_pairs,
)
from diffsound_tpu.fem.material import Material
from diffsound_tpu.fem.mesh import TetMesh
from diffsound_tpu.models.sound_obj import build_model

pairs = random_material_pairs(jax.random.PRNGKey(0), 16)
init_mat, gt_mat = pairs[9]
print("init", init_mat[1:3], "target", gt_mat[1:3])

bowl = TetMesh.from_file("/root/reference/data/mesh/bowl/bowl.obj_.msh")
task = MaterialSyncTask(mesh=bowl, mode_num=16, exp_mode=3)
gt_audio, gt_freqs = task.make_gt(gt_mat)

model = build_model(mesh=bowl, mode_num=16, order=2, mat=init_mat,
                    task="material", dtype=jnp.float32)
osc = TraditionalOscillatorParams(1, 16, 8000, 32000.0, Material.of(init_mat))
forces = impulse_forces(1, 150, jnp.float32)
late = MSSLoss([1024, 512, 256, 128, 64], 32000.0, loss_type="l1_loss")

z = np.load("/root/repo/out/material_sync_r2/ckpt_pair9/ckpt_params.npz")
params = {"poisson_logits": jnp.asarray(z["leaf_0"]),
          "youngs_logits": jnp.asarray(z["leaf_1"])}
print("E at ckpt:", float(model.bins.youngs(params)),
      "nu:", float(model.bins.poisson(params)))

eig = model.eigen_decomposition(params, method="arpack")
cache = model.modal_cache(eig)

freqs_now = model.get_undamped_freqs_cached(params, cache)
print("freqs at ckpt:", np.round(np.asarray(freqs_now)).astype(int).tolist())


def loss_fn(p):
    freqs = model.get_undamped_freqs_cached(p, cache)
    sig, damped = osc(freqs, forces, dtype=jnp.float32)
    return late(sig, gt_audio, damped, 1.0)


loss, g = jax.jit(jax.value_and_grad(loss_fn))(params)
print("loss:", float(loss))
np.set_printoptions(precision=4, suppress=False)
print("grad youngs_logits:", np.asarray(g["youngs_logits"]))
print("grad poisson_logits:", np.asarray(g["poisson_logits"]))

# directional derivative along dE: bump every logit by its dE/dlogit sign
# FD probe: scale E up 2% by logit perturbation along +grad of E
E_fn = lambda p: model.bins.youngs(p)
gE = jax.grad(E_fn)(params)["youngs_logits"]
dirn = gE / (np.linalg.norm(gE) + 1e-30)
jl = jax.jit(loss_fn)
for eps in (0.01, 0.05, 0.2):
    p2 = dict(params)
    p2["youngs_logits"] = params["youngs_logits"] + eps * dirn
    dE = float(E_fn(p2)) - float(E_fn(params))
    dl = float(jl(p2)) - float(loss)
    pred = float(jnp.vdot(g["youngs_logits"], eps * dirn))
    print(f"eps {eps}: dE {dE:.4g}  dloss(FD) {dl:.6f}  dloss(grad) {pred:.6f}")

# ALSO: the loss with EXACT freqs at a 5% higher E (re-solve) vs cached
# extrapolation — how far does the cache's linearization let us see?
