"""2-D (E, nu) loss-landscape sweep for pair 9 (target E=8.86e10 nu=0.211;
round 2 froze at E=6.23e10 nu=0.123).

nu changes mode shapes, so each nu gets its own eigensolve at a fixed
E_ref; within a nu row the freqs scale as sqrt(E/E_ref).  Prints the late
L1 MSS loss over the grid; reveals whether the training point sits in a
flat valley / local minimum of the joint landscape.
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/benchmarks", 1)[0])

import jax
import jax.numpy as jnp

from diffsound_tpu.audio.mss_loss import MSSLoss
from diffsound_tpu.audio.oscillator import TraditionalOscillatorParams
from diffsound_tpu.fem.material import Material
from diffsound_tpu.fem.mesh import TetMesh
from diffsound_tpu.models.sound_obj import build_model

SR, T = 32000.0, 8000
E_TGT, NU_TGT = 8.8557e10, 0.2111
MODES = 16
E_REF = 7.0e10

bowl = TetMesh.from_file("/root/reference/data/mesh/bowl/bowl.obj_.msh")
mat_t = (2700.0, E_TGT, NU_TGT, 6.0, 1e-7)
m = build_model(mesh=bowl, mode_num=MODES, order=2, mat=mat_t, task="gt",
                dtype=jnp.float64)
eig = m.eigen_decomposition(method="arpack")
f_tgt = np.asarray(m.get_undamped_freqs({}, eig))

osc = TraditionalOscillatorParams(1, MODES, T, SR, Material.of(mat_t))
forces = jnp.zeros((1, 150), jnp.float32).at[0, 0].set(1.0)
gt_audio, _ = osc(jnp.asarray(f_tgt, jnp.float32), forces)

late = MSSLoss([1024, 512, 256, 128, 64], SR, loss_type="l1_loss")


@jax.jit
def l1_at(freqs):
    sig, damped = osc(freqs, forces)
    return late(sig, gt_audio, damped, 1.0)


nu_grid = [0.05, 0.09, 0.123, 0.16, 0.211, 0.26, 0.31, 0.36]
E_grid = np.linspace(5.0e10, 1.1e11, 25)

print("rows: nu, cols: E(1e10) =", (E_grid / 1e10).round(2).tolist(), flush=True)
for nu in nu_grid:
    mat_nu = (2700.0, E_REF, nu, 6.0, 1e-7)
    mn = build_model(mesh=bowl, mode_num=MODES, order=2, mat=mat_nu,
                     task="gt", dtype=jnp.float64)
    en = mn.eigen_decomposition(method="arpack")
    f_ref = np.asarray(mn.get_undamped_freqs({}, en))
    row = []
    for E in E_grid:
        s = float(np.sqrt(E / E_REF))
        row.append(float(l1_at(jnp.asarray(f_ref * s, jnp.float32))))
    print(f"nu={nu:5.3f}: " + " ".join(f"{v:7.2f}" for v in row), flush=True)
