"""Probe the TRUE thickness-loss landscape at reference config (frog,
dmtet grid 64, Steel, 32 modes, ord 1) with exact host eigensolves.

Question (continuation session): the grid-64 Adam run walks the coef
AWAY from a 0.3 target from the ~0.475 init.  Is the landscape itself
non-monotone on [0.30, 0.52], or is the training-time gradient noisy?
loss(c) = mean((vals(c) - vals(0.3))^2 / vals(0.3)^2) -- exactly the
training loss (tasks.py::ThicknessTask._loss_core) but with exact
eigenvalues at both ends.

Run: JAX_PLATFORMS=cpu python benchmarks/diagnostics/thickness_landscape.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    from diffsound_tpu.fem.mesh import read_obj
    from diffsound_tpu.geometry.tasks import ThicknessTask

    verts, faces = read_obj("/root/reference/data/mesh/frog.obj")
    task = ThicknessTask(grid_res=64, scale=1.5, mat="Steel", mode_num=32)
    task.apply_sdf(verts * 1.5, faces)

    target_coef = 0.3
    t0 = time.perf_counter()
    target = np.asarray(task.eigenvalues(target_coef))
    print(f"# target({target_coef}) in {time.perf_counter()-t0:.0f}s "
          f"vals[:4]={target[:4]}", flush=True)

    rows = []
    for c in [0.30, 0.36, 0.42, 0.45, 0.475, 0.49, 0.52]:
        t0 = time.perf_counter()
        vals = np.asarray(task.eigenvalues(c))
        loss = float(np.mean((vals - target) ** 2 / target**2))
        dt = time.perf_counter() - t0
        rows.append({"coef": c, "loss": loss, "dt_s": round(dt, 1)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"landscape": rows}))


if __name__ == "__main__":
    main()
