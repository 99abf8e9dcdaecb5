"""Round-3 diagnostic: are the failing high-E pairs' GT modal frequencies
pushed out of the STFT band / over Nyquist (hypothesis a of VERDICT item 2)?

Computes ord-2 bowl modal frequencies for the 4 failing targets and for the
values round 2 actually recovered, prints them side by side plus damping
times, and checks Nyquist coverage.
"""

import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/benchmarks", 1)[0])

import jax
import jax.numpy as jnp

from diffsound_tpu.experiments.material_sync import random_material_pairs
from diffsound_tpu.fem.mesh import TetMesh
from diffsound_tpu.models.sound_obj import build_model

SR = 32000.0
NYQ = SR / 2

pairs = random_material_pairs(jax.random.PRNGKey(0), 16)
bowl = TetMesh.from_file("/root/reference/data/mesh/bowl/bowl.obj_.msh")

# (pair index, recovered E, recovered nu) from out/material_sync_r2/result.txt
recovered = {
    0: (2.4988e10, 0.4262),
    1: (6.4672e10, 0.2081),
    2: (6.5347e10, 0.0684),
    7: (6.2765e10, 0.1930),
    9: (6.2333e10, 0.1233),
}


def freqs_of(E, nu, alpha=6.0, beta=1e-7, rho=2700.0):
    mat = (rho, E, nu, alpha, beta)
    m = build_model(mesh=bowl, mode_num=16, order=2, mat=mat, task="gt",
                    dtype=jnp.float64)
    eig = m.eigen_decomposition(method="arpack")
    f = np.asarray(m.get_undamped_freqs({}, eig))
    lam = (2 * np.pi * f) ** 2
    damp = 0.5 * (alpha + beta * lam)  # Rayleigh damping rate (1/s)
    return f, damp


for i in sorted(recovered):
    init_mat, tgt = pairs[i]
    ft, dt = freqs_of(tgt[1], tgt[2])
    fr, dr = freqs_of(*recovered[i])
    print(f"\n=== pair {i}: target E={tgt[1]:.3g} nu={tgt[2]:.3f} | "
          f"recovered E={recovered[i][0]:.3g} nu={recovered[i][1]:.3f} | "
          f"init E={init_mat[1]:.3g} nu={init_mat[2]:.3f}")
    print("  target freqs   :", np.round(ft).astype(int).tolist())
    print("  recovered freqs:", np.round(fr).astype(int).tolist())
    print(f"  target modes over Nyquist({NYQ:.0f}): {(ft > NYQ).sum()}/16 ; "
          f"over 0.9*Nyq: {(ft > 0.9 * NYQ).sum()}/16")
    print(f"  target damping 1/e time (ms): "
          f"{np.round(1000.0 / dt, 1).tolist()}")
