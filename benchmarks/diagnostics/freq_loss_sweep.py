"""Validate the freq-chamfer early loss on pair 9's landscape.

Checks: (1) peaks extracted from GT audio match the true modal freqs
(folded); (2) loss(E) is smooth at FINE scale (0.1% steps) where the MSS
L1 ripples; (3) loss(E) is monotone toward the target from the round-2
stall point at both the stalled nu and the target nu; (4) loss(nu) at
target E pulls toward the target nu.
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/benchmarks", 1)[0])

import jax
import jax.numpy as jnp

from diffsound_tpu.audio.freq_loss import (
    extract_spectral_peaks, fold_nyquist, freq_chamfer_loss,
)
from diffsound_tpu.audio.mss_loss import MSSLoss
from diffsound_tpu.audio.oscillator import TraditionalOscillatorParams
from diffsound_tpu.fem.material import Material
from diffsound_tpu.fem.mesh import TetMesh
from diffsound_tpu.models.sound_obj import build_model

SR, T = 32000.0, 8000
E_TGT, NU_TGT = 8.8557e10, 0.2111
NU_STALL = 0.123
MODES = 16

bowl = TetMesh.from_file("/root/reference/data/mesh/bowl/bowl.obj_.msh")
mat_t = (2700.0, E_TGT, NU_TGT, 6.0, 1e-7)
m = build_model(mesh=bowl, mode_num=MODES, order=2, mat=mat_t, task="gt",
                dtype=jnp.float64)
eig = m.eigen_decomposition(method="arpack")
f_tgt = np.asarray(m.get_undamped_freqs({}, eig))

osc = TraditionalOscillatorParams(1, MODES, T, SR, Material.of(mat_t))
forces = jnp.zeros((1, 150), jnp.float32).at[0, 0].set(1.0)
gt_audio, _ = osc(jnp.asarray(f_tgt, jnp.float32), forces)

peaks, wts = extract_spectral_peaks(np.asarray(gt_audio), SR)
print("true folded freqs:",
      np.sort(np.asarray(fold_nyquist(jnp.asarray(f_tgt), SR))).round(1).tolist())
print("extracted peaks  :", peaks.round(1).tolist())
print("peak weights     :", wts.round(3).tolist())

late = MSSLoss([1024, 512, 256, 128, 64], SR, loss_type="l1_loss")


@jax.jit
def chamfer_at(freqs):
    return freq_chamfer_loss(freqs, jnp.asarray(peaks), jnp.asarray(wts), SR)


@jax.jit
def l1_at(freqs):
    sig, damped = osc(freqs, forces)
    return late(sig, gt_audio, damped, 1.0)


# nu rows: freqs at nu come from their own eigensolve at E_REF then scale
E_REF = 7.0e10
rows = {}
for nu in (NU_STALL, NU_TGT):
    mn = build_model(mesh=bowl, mode_num=MODES, order=2,
                     mat=(2700.0, E_REF, nu, 6.0, 1e-7), task="gt",
                     dtype=jnp.float64)
    en = mn.eigen_decomposition(method="arpack")
    rows[nu] = np.asarray(mn.get_undamped_freqs({}, en))

print("\n-- coarse E sweep (chamfer | L1), both nus --")
E_grid = np.linspace(5.0e10, 1.1e11, 25)
for nu, f_ref in rows.items():
    vals = []
    for E in E_grid:
        s = float(np.sqrt(E / E_REF))
        vals.append(float(chamfer_at(jnp.asarray(f_ref * s, jnp.float32))))
    print(f"nu={nu:.3f} chamfer: "
          + " ".join(f"{v:7.4f}" for v in vals))

print("\n-- fine E sweep near the stall (6.1e10..6.6e10, 0.25% steps) --")
f_ref = rows[NU_STALL]
for E in np.linspace(6.1e10, 6.6e10, 21):
    s = float(np.sqrt(E / E_REF))
    fr = jnp.asarray(f_ref * s, jnp.float32)
    print(f"E {E:.4g}: chamfer {float(chamfer_at(fr)):.5f} "
          f"l1 {float(l1_at(fr)):.4f}")

print("\n-- gradient direction at the stall --")
g = jax.grad(lambda s: chamfer_at(jnp.asarray(f_ref, jnp.float32) * s))(
    jnp.float32(np.sqrt(6.23e10 / E_REF))
)
print("d(chamfer)/d(scale) at stall:", float(g), "(negative = push E up)")
