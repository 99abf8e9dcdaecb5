"""Morphing-coefficient inference experiment CLI.

Parity with /root/reference/experiments/morphing_generate.py +
morphing_train.py: for each target coefficient in morphing_list, build
GT eigenvalues of the blended shape sdf = c sdf1 + (1-c) sdf2 and recover
c by gradient descent through the marching-tets + FEM eigenvalue path.

Run: python -m diffsound_tpu.experiments.morphing --config configs/morphing_train.json
"""

from __future__ import annotations

import os
import time

import jax.numpy as jnp
import numpy as np

from ..fem.mesh import read_obj
from ..geometry.tasks import MorphingTask
from ..utils.logging import MetricLogger


def main(argv=None):
    from ..config import parse_flags

    flags = parse_flags(
        "morphing (diffsound-tpu)",
        defaults={"mode_num": 16, "order": 1, "mat": "Steel",
                  "optimizer": "adam"},
        argv=argv,
    )
    os.makedirs(flags.out_dir, exist_ok=True)
    logger = MetricLogger(flags.out_dir)

    v1, f1 = read_obj(os.path.join(flags.init_mesh_dir, flags.mesh_name1 + ".obj"))
    v2, f2 = read_obj(os.path.join(flags.init_mesh_dir, flags.mesh_name2 + ".obj"))

    result_path = os.path.join(
        flags.out_dir, f"result_{flags.mesh_name1}_{flags.mesh_name2}.txt"
    )
    total_error = 0.0
    for coef in flags.morphing_list:
        task = MorphingTask(
            grid_res=flags.dmtet_grid, scale=flags.mesh_scale, mat=flags.mat,
            mode_num=flags.mode_num,
            eig_method=getattr(flags, "eig_method", "warm"),
        )
        task.apply_sdf2(
            v1 * flags.mesh_scale, f1, v2 * flags.mesh_scale, f2
        )
        target = task.eigenvalues(coef)
        print(f"target coef {coef}: gt vals[:4] = {np.asarray(target)[:4]}")
        t0 = time.perf_counter()
        if getattr(flags, "optimizer", "adam") == "newton":
            # scalar Gauss-Newton (tasks.py::newton_optimize)
            result, history = task.newton_optimize(
                np.asarray(target), iters=max(flags.iter, 25), c0=0.5,
                verbose=True,
            )
        else:
            params, history = task.optimize(
                jnp.asarray(target), iters=flags.iter, lr=flags.learning_rate,
                verbose=True, init_coef=0.5,
            )
            result = history[-1]["coef"]
        wall = time.perf_counter() - t0
        total_error += (result - coef) ** 2 / len(flags.morphing_list)
        its = len(history) / wall
        print(f"target:{coef} result:{result} ({its:.2f} it/s)")
        with open(result_path, "a") as f:
            f.write(f"target:{coef} result:{result} iters_per_sec:{its:.3f}\n")
    with open(result_path, "a") as f:
        f.write(f"total error:{total_error}\n")
    print(f"total error:{total_error}")


if __name__ == "__main__":
    main()
