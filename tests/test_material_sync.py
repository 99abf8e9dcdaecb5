"""End-to-end slice (SURVEY.md section 7.2 step 5): the full loop
assemble -> eigensolve -> Rayleigh correction -> oscillator -> Sinkhorn
MSS loss -> Adam recovers Young's modulus on a small matched-order
problem."""

import numpy as np
import jax
import jax.numpy as jnp

from diffsound_tpu.fem.mesh import cube_tet_mesh
from diffsound_tpu.experiments.material_sync import (
    MaterialSyncTask,
    random_material_pairs,
)


def test_material_sync_learns_youngs():
    # exp_mode=1: order-2 model matching the order-2 GT discretization so
    # the material offset is the only discrepancy; early Sinkhorn-OT phase
    # carries the 10% frequency gap (the late L1 loss alone cannot, which
    # is exactly why the reference runs a 1000-epoch geomloss phase first)
    mesh = cube_tet_mesh(3, size=0.5)
    task = MaterialSyncTask(
        mesh=mesh,
        mode_num=6,
        sample_rate=32000.0,
        frame_num=2000,
        force_frame_num=50,
        exp_mode=1,
        dtype=jnp.float64,
    )
    base = (2700, 7.2e10, 0.19, 6, 1e-7)
    gt_mat = (2700, 6.0e10, 0.19, 6, 1e-7)
    gt_audio, gt_freqs = task.make_gt(gt_mat)
    assert gt_audio.shape == (1, 2000)
    assert np.all(np.isfinite(np.asarray(gt_audio)))
    assert 20 < gt_freqs[0] < 16000

    res = task.train(
        base,
        gt_audio,
        max_epoch=30,
        early_loss_epoch=30,
        pretrain=True,
        verbose=False,
        log_every=29,
        lr_early=2e-2,
        early_loss_type="geomloss",  # the reference-parity Sinkhorn recipe
    )
    init_err = abs(7.2e10 - gt_mat[1])
    final_err = abs(res["youngs"] - gt_mat[1])
    assert final_err < 0.5 * init_err, (res["youngs"], res["history"])

    # the default freq-chamfer early phase must also move E toward the
    # target (it converges along a different trajectory; full-accuracy
    # coverage is tests/test_modal_fit.py)
    res2 = task.train(
        base, gt_audio, max_epoch=30, early_loss_epoch=30, pretrain=True,
        verbose=False, log_every=29, lr_early=2e-2,
    )
    assert abs(res2["youngs"] - gt_mat[1]) < init_err, res2["youngs"]


def test_random_material_pairs_in_range():
    pairs = random_material_pairs(jax.random.PRNGKey(0), 8)
    assert len(pairs) == 8
    for init, tgt in pairs:
        for m in (init, tgt):
            assert 1e10 <= m[1] <= 1e11
            assert 0.1 <= m[2] <= 0.4
