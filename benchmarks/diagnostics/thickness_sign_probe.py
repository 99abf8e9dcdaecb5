"""Isolate the thickness-gradient sign flip (results/r4/thickness_jvp_bisect.txt):

the fixed-topology derivative (autodiff AND central differences of the
frozen-connectivity Ritz program) is ~-2.7 at c=0.5 while the remeshed
landscape slope is +2.66 (results/r3/thickness_grid64_landscape.txt) —
exactly mirrored.  Three measurements at grid 32, CPU, f64:

  A. true remeshed eigenvalues λ(c) at a sweep of c (full march+compact+
     ARPACK each time) — the ground-truth landscape;
  B. SAME-topology ARPACK eigenvalues: march at c±h, but verify the
     compaction is identical to c's, then ARPACK on the moved vertices —
     the exact discrete fixed-grid derivative, no Ritz, no detached U;
  C. the _coef_vals fixed-topology Ritz program's λ(c±h) with U from c —
     what the optimizer consumes.

If B ≈ C but both disagree in sign with A, the frozen-topology discrete
derivative itself is wrong(ly signed) vs the remeshed physics.  If C ≠ B,
the Ritz program has a bug.

Run: JAX_PLATFORMS=cpu python benchmarks/diagnostics/thickness_sign_probe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from diffsound_tpu.fem.mesh import read_obj
from diffsound_tpu.geometry.dmtet import MarchingTets
from diffsound_tpu.geometry.tasks import ThicknessTask

GRID = int(os.environ.get("PROBE_GRID", "32"))
C0 = float(os.environ.get("PROBE_C0", "0.5"))
H = float(os.environ.get("PROBE_H", "2e-3"))


def main():
    mverts, mfaces = read_obj("/root/reference/data/mesh/frog.obj")
    task = ThicknessTask(grid_res=GRID, scale=1.5, mat="Steel", mode_num=32,
                         eig_method="host")
    task.apply_sdf(mverts * 1.5, mfaces)

    def march_comp(c):
        out = task._march_coef(jnp.asarray(c))
        comp = MarchingTets.compact(out)
        return out, comp

    # --- A: remeshed landscape around c0 -------------------------------
    print("# A: remeshed ARPACK landscape")
    sweep = [C0 - 0.04, C0 - 0.02, C0, C0 + 0.02, C0 + 0.04]
    lamA = {}
    for c in sweep:
        out, comp = march_comp(c)
        vals, _ = task._eigensolve_host(out, comp)
        lamA[c] = np.asarray(vals)[task.extra_modes:]
        print(json.dumps({"c": c, "vals4": lamA[c][:4].tolist(),
                          "num_tets": comp["num_tets"]}))
    slopeA = (lamA[C0 + 0.02] - lamA[C0 - 0.02]) / 0.04
    print("# A slope (remeshed, h=0.02), first 6:", (slopeA[:6]).tolist())

    # --- B: same-topology ARPACK derivative ----------------------------
    print("# B: frozen-topology ARPACK derivative")
    out0, comp0 = march_comp(C0)
    lam0, U0 = task._eigensolve_host(out0, comp0)

    def frozen_vals(c):
        out = task._march_coef(jnp.asarray(c))
        # reuse comp0's keep_idx/tets: identical discretization, moved verts
        vals, _ = task._eigensolve_host(out, comp0)
        return np.asarray(vals)[task.extra_modes:]

    # verify the compaction at c0±h is actually identical (topology safe)
    for c in (C0 - H, C0 + H):
        _, comph = march_comp(c)
        same = (comph["num_tets"] == comp0["num_tets"]
                and comph["num_verts"] == comp0["num_verts"]
                and np.array_equal(comph["keep_idx"], comp0["keep_idx"])
                and np.array_equal(comph["tets"], comp0["tets"]))
        print(f"# topology at c={c}: identical_to_c0={same}")

    vB_p = frozen_vals(C0 + H)
    vB_m = frozen_vals(C0 - H)
    slopeB = (vB_p - vB_m) / (2 * H)
    print("# B slope (frozen topo, exact ARPACK), first 6:", slopeB[:6].tolist())

    # --- C: FD of the Ritz program (historical — frozen-basis curvature
    # contaminates it; kept to document why autodiff replaced it) -------
    print("# C: central differences of the Ritz program (detached U)")

    def fd(c, h):
        vals = task._coef_vals(c, comp0, U0)
        vp = task._coef_vals(c + h, comp0, U0)
        vm = task._coef_vals(c - h, comp0, U0)
        return vals, (vp - vm) / (2 * h)

    vals0, slopeC = fd(C0, H)
    print("# C vals0 vs lam0 rel diff:",
          float(np.max(np.abs(vals0 - np.asarray(lam0)[task.extra_modes:])
                       / vals0)))
    print("# C slope, first 6:", slopeC[:6].tolist())

    # --- D: reverse-mode autodiff of the same program -------------------
    valsD, slopeD = task._coef_vals_jac(C0, comp0, U0)
    print("# D slope (rev-mode autodiff), first 6:", slopeD[:6].tolist())

    tgt = task.eigenvalues(0.3)
    r = (vals0 - np.asarray(tgt)) / np.asarray(tgt)
    for name, sl in (("A", slopeA), ("B", slopeB), ("C", slopeC), ("D", slopeD)):
        dl = float(2 * np.mean(r * sl / np.asarray(tgt)))
        print(f"# dL/dc via slope {name}: {dl:+.4f}")


if __name__ == "__main__":
    main()
