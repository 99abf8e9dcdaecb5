"""Real-audio material inference: two-stage pipeline.

Parity with /root/reference/experiments/material_real_train.py:

  stage 1: fit a fully-trainable GT oscillator (freqs + wide-bin damping +
           amplitudes + filtered noise) directly to the recorded audio
           (2001 Adam iterations, late-L1 loss), then extract a per-band
           damping curve from the fitted (freq, damping) pairs;
  stage 2: material inference exactly like material_sync, but synthesizing
           through `forward_curve` (damping from the extracted curve) and
           with the recorded audio as target.

Run: python -m diffsound_tpu.experiments.material_real --config configs/material_real_train.json
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..audio.damping import DampingCurve
from ..audio.io import load_real_audio_dir, write_wav
from ..audio.mss_loss import MSSLoss
from ..audio.oscillator import GTOscillatorBank, OscillatorBank
from ..fem.material import Material, MatSet
from ..fem.mesh import TetMesh
from ..models.sound_obj import build_model
from ..utils.logging import MetricLogger

EIGEN_DECOMPOSE_CYCLE = 15


def fit_gt_oscillator(
    gt_audio: jnp.ndarray,
    forces: jnp.ndarray,
    mode_num: int,
    sample_rate: float,
    mat: Material,
    iters: int = 2001,
    lr: float = 5e-3,
    noise_rate: float = 2e-4,
    non_linear_rate: float = 0.0,
    seed: int = 0,
    verbose: bool = True,
):
    """Stage 1 (material_real_train.py:113-133).  `non_linear_rate` > 0
    enables the per-sample nonlinear frequency term (the reference's
    `freq_nonlinear`, oscillator.py:186-188,218-224)."""
    A, T = gt_audio.shape
    bank = GTOscillatorBank(
        A, mode_num, T, sample_rate, mat, use_nonlinear=non_linear_rate > 0.0
    )
    params = bank.init_params(jax.random.PRNGKey(seed))
    loss_fn = MSSLoss([512, 256, 128, 64, 32], sample_rate, loss_type="l1_loss")
    sched = optax.exponential_decay(lr, 100, 0.99, staircase=True)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key, gt, fz):
        def lf(p):
            sig, _ = bank(
                p, fz, noise_rate=noise_rate, key=key,
                non_linear_rate=non_linear_rate,
            )
            return loss_fn(sig, gt)

        loss, g = jax.value_and_grad(lf)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(seed + 1)
    for i in range(iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub, gt_audio, forces)
        if verbose and i % 250 == 0:
            print(f"  pre-osc iter {i}: loss {float(loss):.5f}")
    return bank, params


def extract_damping_curve(bank: GTOscillatorBank, params) -> DampingCurve:
    """material_real_train.py:134-151."""
    damps = np.asarray(bank.damping(params)).reshape(-1)
    freqs = np.asarray(bank.freq_linear(params)).reshape(-1)
    return DampingCurve(freqs, damps)


def train_material_real(
    mesh: TetMesh,
    gt_audio: np.ndarray,
    damping_curve: DampingCurve,
    init_mat,
    exp_mode: int = 3,
    mode_num: int = 16,
    sample_rate: float = 32000.0,
    force_frame_num: int = 150,
    max_epoch: int = 3000,
    early_loss_epoch: int = 1000,
    solver: str = "auto",
    logger: MetricLogger = None,
    verbose: bool = True,
    seed: int = 0,
    newton_init: bool = True,
):
    """Stage 2 (material_real_train.py:154-243).

    newton_init: seed the bins with the closed-form modal-Newton fit
    (models/modal_fit.py) on the recordings' spectral peaks, using the
    stage-1 extracted damping curve to invert damped -> undamped
    eigenvalues; the epoch loop then only polishes."""
    mesh_order = 2 if exp_mode in (1, 3) else 1
    task = "material" if exp_mode in (2, 3) else "mat_baseline"
    A, T = gt_audio.shape
    gt_audio_j = jnp.asarray(gt_audio, jnp.float32)
    forces = jnp.zeros((A, force_frame_num), jnp.float32).at[:, 0].set(1.0)

    model = build_model(
        mesh=mesh, mode_num=mode_num, order=mesh_order, mat=init_mat, task=task
    )
    osc = OscillatorBank(A, mode_num, T, sample_rate, Material.of(init_mat))
    osc_params = osc.init_params(jax.random.PRNGKey(seed))
    osc_params = osc.pretrain_damps(osc_params)

    early_loss = MSSLoss([2048, 1024], sample_rate, loss_type="geomloss")
    late_loss = MSSLoss([1024, 512, 256, 128, 64], sample_rate, loss_type="l1_loss")
    rmse_loss = MSSLoss([1024, 512, 256, 128, 64], sample_rate, loss_type="rmse_loss")

    params = model.init_params(jax.random.PRNGKey(seed), pretrain=True)
    if newton_init:
        from ..audio.freq_loss import extract_spectral_peaks
        from ..fem.material import lame_params
        from ..models.modal_fit import ModalNewtonFitter

        m = Material.of(init_mat)
        peaks, wts = extract_spectral_peaks(np.asarray(gt_audio), sample_rate)
        fitter = ModalNewtonFitter(
            model, peaks, wts, sample_rate, m.alpha, m.beta,
            damping_curve=damping_curve,
        )
        mu0, lam0 = lame_params(m.youngs / m.density, m.poisson)
        fit = fitter.fit(float(mu0), float(lam0), rounds=12, verbose=verbose)
        if verbose:
            print(f"  newton init: E {fit['E']:.4g} nu {fit['nu']:.4f}")
        params = model.bins.fit_to(params, fit["E"], fit["nu"])

    def make_opt(lr, gamma):
        return optax.adam(
            optax.exponential_decay(lr, 100, gamma, staircase=True)
        )

    opt = make_opt(1e-3, 0.9)
    opt_state = opt.init(params)
    opt2 = make_opt(2e-3, 0.95)

    def make_step(loss_fn, optimizer):
        @jax.jit
        def step(params, opt_state, eig, curve_damp, gt, fz):
            def lf(p):
                freqs = model.get_undamped_freqs(p, eig)
                sig, damped = osc.forward_curve(osc_params, freqs, curve_damp, fz)
                return loss_fn(sig, gt, damped, 1.0)

            loss, g = jax.value_and_grad(lf)(params)
            g = model.bins.mask_grads(g)
            updates, opt_state = optimizer.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    step_early = make_step(early_loss, opt)
    step_late = make_step(late_loss, opt2)
    rmse_eval = jax.jit(
        lambda p, eig, cd, gt, fz: (
            lambda freqs: rmse_loss(
                osc.forward_curve(osc_params, freqs, cd, fz)[0], gt
            )
        )(model.get_undamped_freqs(p, eig))
    )

    eig = None
    history = []
    curve_damp = None
    t0 = time.perf_counter()
    for epoch in range(max_epoch):
        if epoch % EIGEN_DECOMPOSE_CYCLE == 0:
            eig = model.eigen_decomposition(params, prev=eig, method=solver)
            # damping looked up host-side per eigensolve (parity:
            # oscillator.py:143-154 evaluates the scipy interp curve)
            freqs_now = np.asarray(model.get_undamped_freqs(params, eig))
            curve_damp = jnp.asarray(damping_curve(freqs_now), jnp.float32)
        if epoch == early_loss_epoch:
            opt_state = opt2.init(params)
        if epoch < early_loss_epoch:
            params, opt_state, loss = step_early(
                params, opt_state, eig, curve_damp, gt_audio_j, forces
            )
        else:
            params, opt_state, loss = step_late(
                params, opt_state, eig, curve_damp, gt_audio_j, forces
            )
        if epoch % EIGEN_DECOMPOSE_CYCLE == 0:
            rec = {
                "epoch": epoch,
                "loss": float(loss),
                "youngs": float(model.bins.youngs(params)),
                "poisson": float(model.bins.poisson(params)),
                "rmse": float(rmse_eval(params, eig, curve_damp, gt_audio_j, forces)),
            }
            history.append(rec)
            if logger:
                logger.scalars({k: v for k, v in rec.items() if k != "epoch"}, epoch)
            if verbose:
                print(
                    f"epoch {epoch}: loss {rec['loss']:.5f} rmse {rec['rmse']:.4f} "
                    f"E {rec['youngs']:.4g} nu {rec['poisson']:.4f}"
                )
    wall = time.perf_counter() - t0
    return {
        "params": params,
        "youngs": float(model.bins.youngs(params)),
        "poisson": float(model.bins.poisson(params)),
        "history": history,
        "iters_per_sec": max_epoch / wall,
    }


def main(argv=None):
    from ..config import parse_flags

    flags = parse_flags("material_real (diffsound-tpu)", argv=argv)
    os.makedirs(flags.out_dir, exist_ok=True)
    logger = MetricLogger(flags.out_dir)

    mesh_path = flags.mesh_dir
    mesh = (
        TetMesh.from_triangle_mesh(mesh_path)
        if mesh_path.endswith(".obj")
        else TetMesh.from_file(mesh_path)
    )
    mat = Material.of(getattr(MatSet, flags.material))

    gt_audio, _ = load_real_audio_dir(
        flags.audio_dir, flags.sample_rate, flags.frame_num, flags.audio_num
    )
    forces = jnp.zeros((len(gt_audio), flags.force_frame_num), jnp.float32)
    forces = forces.at[:, 0].set(1.0)

    print("stage 1: GT oscillator fit")
    # stage 1 is ~1e4 device dispatches; cache its (freq, damping) result
    # so a restarted run goes straight to stage 2
    stage1_cache = os.path.join(flags.out_dir, "stage1_fit.npz")
    if os.path.exists(stage1_cache):
        print(f"  (cached: {stage1_cache})")
        d = np.load(stage1_cache)
        curve = DampingCurve(d["freqs"], d["damps"])
    else:
        bank, pre_params = fit_gt_oscillator(
            jnp.asarray(gt_audio, jnp.float32), forces,
            flags.mode_num * 16, flags.sample_rate, mat,
            iters=getattr(flags, "gt_iters", 2001),
            non_linear_rate=getattr(flags, "non_linear_rate", 0.0),
        )
        damps = np.asarray(bank.damping(pre_params)).reshape(-1)
        freqs = np.asarray(bank.freq_linear(pre_params)).reshape(-1)
        np.savez(stage1_cache, freqs=freqs, damps=damps)
        curve = DampingCurve(freqs, damps)

    print("stage 2: material inference")
    res = train_material_real(
        mesh, gt_audio, curve, mat,
        exp_mode=flags.exp_mode,
        mode_num=flags.mode_num,
        sample_rate=flags.sample_rate,
        force_frame_num=flags.force_frame_num,
        max_epoch=flags.max_epoch,
        early_loss_epoch=flags.early_loss_epoch,
        logger=logger,
    )
    with open(os.path.join(flags.out_dir, "result.txt"), "a") as f:
        f.write(f"youngs:{res['youngs']}\npoisson:{res['poisson']}\n")
    print(f"recovered E={res['youngs']:.4g} nu={res['poisson']:.4f}")


if __name__ == "__main__":
    main()
