"""End-to-end shape inference: thickness and morphing coefficients are
recovered from modal eigenvalue targets on small grids (the reference's
thickness_train / morphing_train loops in miniature)."""

import numpy as np
import pytest
import jax.numpy as jnp

from diffsound_tpu.geometry.tasks import MorphingTask, ThicknessTask
from tests.test_geometry import icosphere


MAT = (2700, 2.0e11, 0.29, 20, 3e-8)  # Steel (parity with thickness config)


def test_thickness_recovery():
    verts, faces = icosphere(2, radius=0.42)
    task = ThicknessTask(
        grid_res=12, scale=1.0, mat=MAT, mode_num=8, tets_dir="/nonexistent"
    )
    task.apply_sdf(verts, faces)

    target_coef = 0.6
    target = task.eigenvalues(target_coef)
    assert np.all(target > 0)

    params, history = task.optimize(
        jnp.asarray(target), iters=40, lr=5e-2, verbose=False
    )
    final = history[-1]["coef"]
    init = history[0]["coef"]
    assert abs(final - target_coef) < 0.1, history[-5:]
    assert abs(final - target_coef) < abs(init - target_coef)


def test_morphing_recovery():
    v1, f1 = icosphere(2, radius=0.45)
    v2, f2 = icosphere(2, radius=0.30)
    task = MorphingTask(
        grid_res=12, scale=1.0, mat=MAT, mode_num=6, tets_dir="/nonexistent"
    )
    task.apply_sdf2(v1, f1, v2, f2)

    target_coef = 0.7
    target = task.eigenvalues(target_coef)
    params, history = task.optimize(
        jnp.asarray(target), iters=40, lr=1e-1, verbose=False, init_coef=0.4
    )
    final = history[-1]["coef"]
    assert abs(final - target_coef) < 0.12, history[-5:]
    # monotone-ish improvement
    assert history[-1]["loss"] < 0.25 * history[0]["loss"]
