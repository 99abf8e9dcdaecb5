"""Loss-landscape sweep for the high-E ceiling (pair 9: target E=8.86e10,
nu=0.211, round 2 recovered 6.23e10).

At fixed nu, lambda scales linearly in E, so modal freqs scale as sqrt(E).
One eigensolve at the target gives the whole 1-D landscape: for each E on
a grid, synthesize audio at freqs*sqrt(E/E_tgt) and evaluate the late L1
MSS loss and early Sinkhorn loss against the GT audio.  If the L1 curve
has a local minimum near 6.3e10 separated from the global minimum at
8.86e10 by a barrier, the round-2 stall is a landscape problem (aliased
over-Nyquist modes), not an optimizer bug.
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
E_TGT, NU = 8.8557e10, 0.2111
MODES = 16

mat = (2700.0, E_TGT, NU, 6.0, 1e-7)
bowl = TetMesh.from_file("/root/reference/data/mesh/bowl/bowl.obj_.msh")
m = build_model(mesh=bowl, mode_num=MODES, order=2, mat=mat, task="gt",
                dtype=jnp.float64)
eig = m.eigen_decomposition(method="arpack")
f_tgt = np.asarray(m.get_undamped_freqs({}, eig))
print("target freqs:", np.round(f_tgt).astype(int).tolist(), flush=True)

osc = TraditionalOscillatorParams(1, MODES, T, SR, Material.of(mat))
forces = jnp.zeros((1, 150), jnp.float32).at[0, 0].set(1.0)
gt_audio, _ = osc(jnp.asarray(f_tgt, jnp.float32), forces)

late = MSSLoss([1024, 512, 256, 128, 64], SR, loss_type="l1_loss")
early = MSSLoss([2048, 1024], SR, loss_type="geomloss")


@jax.jit
def losses_at(scale):
    f = jnp.asarray(f_tgt, jnp.float32) * scale
    sig, damped = osc(f, forces)
    return late(sig, gt_audio, damped, 1.0), early(sig, gt_audio, damped, 1.0)


E_grid = np.linspace(4.0e10, 1.25e11, 35)
print(f"{'E':>12} {'L1':>10} {'sinkhorn':>10}")
for E in E_grid:
    s = float(np.sqrt(E / E_TGT))
    l1, sk = losses_at(s)
    print(f"{E:12.4g} {float(l1):10.5f} {float(sk):10.5f}", flush=True)
