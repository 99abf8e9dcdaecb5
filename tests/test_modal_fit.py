"""Closed-form modal-Newton material fit (models/modal_fit.py): damping
inversion, the 2-parameter LSQ, and the full iterated fit on a small
mesh recovering (E, nu) from synthesized audio alone."""

import numpy as np
import jax
import jax.numpy as jnp

from diffsound_tpu.audio.freq_loss import extract_spectral_peaks
from diffsound_tpu.audio.oscillator import (
    TraditionalOscillatorParams, damped_frequency, rayleigh_damping,
)
from diffsound_tpu.fem.material import Material, lame_params
from diffsound_tpu.fem.mesh import cube_tet_mesh
from diffsound_tpu.models.modal_fit import (
    ModalNewtonFitter, lambda_from_damped_freq, lame_to_E_nu, modal_lsq_fit,
)
from diffsound_tpu.models.sound_obj import build_model


def test_lambda_from_damped_freq_inverts():
    alpha, beta = 6.0, 1e-7
    lam = np.logspace(5, 10.5, 40)
    d = np.asarray(rayleigh_damping(alpha, beta, jnp.asarray(lam)))
    fd = np.asarray(damped_frequency(np.sqrt(lam) / (2 * np.pi), jnp.asarray(d)))
    lam_rec = lambda_from_damped_freq(fd, alpha, beta)
    np.testing.assert_allclose(lam_rec, lam, rtol=1e-10)


def test_lambda_from_damped_freq_beta_zero():
    lam = np.asarray([1e6, 1e8])
    fd = np.sqrt(lam - 9.0) / (2 * np.pi)  # d = alpha/2 = 3
    np.testing.assert_allclose(
        lambda_from_damped_freq(fd, 6.0, 0.0), lam, rtol=1e-12
    )


def test_modal_lsq_exact_recovery():
    rng = np.random.default_rng(3)
    k = 12
    q_mu = rng.uniform(1e5, 1e7, k)
    q_lam = rng.uniform(1e4, 1e6, k)
    q_m = np.ones(k) + rng.normal(0, 1e-6, k)
    lam0 = rng.uniform(1e6, 1e9, k)
    mu_t, lam_t = 2.5e7, 1.4e7
    tgt = lam0 * (1 - q_m) + mu_t * q_mu + lam_t * q_lam
    mu, lam = modal_lsq_fit(lam0, q_mu, q_lam, q_m, tgt, np.ones(k))
    np.testing.assert_allclose([mu, lam], [mu_t, lam_t], rtol=1e-8)


def test_modal_lsq_nu_clamp():
    """Targets implying nu > 0.499 must clamp and refit mu on the ray."""
    rng = np.random.default_rng(4)
    k = 8
    q_mu = rng.uniform(1e5, 1e6, k)
    q_lam = rng.uniform(1e5, 1e6, k)
    lam0 = np.zeros(k)
    q_m = np.ones(k)
    # lam/mu = 1000 -> nu ~ 0.4995 (outside)
    tgt = 1e4 * q_mu + 1e7 * q_lam
    mu, lam = modal_lsq_fit(lam0, q_mu, q_lam, q_m, tgt, np.ones(k))
    _, nu = lame_to_E_nu(mu, lam)
    assert 0.0099 <= nu <= 0.4991
    assert mu > 0


def test_newton_fit_recovers_material_from_audio():
    """Full loop on a small cube: GT audio synthesized at an unknown
    material; the fitter recovers (E, nu) from the audio's spectral peaks
    cold-started at a 40%-off material, in a few eigensolves."""
    mesh = cube_tet_mesh(3, size=0.4)
    sr, T, modes = 32000.0, 6000, 10
    gt = (2700.0, 6.1e10, 0.31, 6.0, 1e-7)
    init = (2700.0, 3.7e10, 0.15, 6.0, 1e-7)

    gt_model = build_model(mesh=mesh, mode_num=modes, order=1, mat=gt,
                           task="gt", dtype=jnp.float64)
    eig = gt_model.eigen_decomposition(method="arpack", sigma=1e6)
    freqs = gt_model.get_undamped_freqs({}, eig)
    osc = TraditionalOscillatorParams(1, modes, T, sr, Material.of(gt))
    forces = jnp.zeros((1, 50)).at[0, 0].set(1.0)
    audio, _ = osc(freqs, forces, dtype=jnp.float64)

    peaks, wts = extract_spectral_peaks(np.asarray(audio), sr)
    model = build_model(mesh=mesh, mode_num=modes, order=1, mat=init,
                        task="material", dtype=jnp.float64)
    fitter = ModalNewtonFitter(model, peaks, wts, sr, gt[3], gt[4])
    mu0, lam0 = lame_params(init[1] / init[0], init[2])
    res = fitter.fit(float(mu0), float(lam0), rounds=15)
    assert abs(res["E"] - gt[1]) / gt[1] < 0.02, res["history"][-3:]
    assert abs(res["nu"] - gt[2]) < 0.03, res["history"][-3:]


def test_bins_exact_projection():
    """fit_to(exact=True) represents arbitrary in-range (E, nu) to ~1e-6
    relative — including values near the LOW end of the log-spaced range
    where the Adam-only projection measurably overshoots (+55% observed
    for a target at bin 2 of 16: softplus floor mass on the big bins)."""
    from diffsound_tpu.models.material_model import MaterialBins

    bins = MaterialBins(Material.of((2700, 9.73e10, 0.296, 6, 1e-7)),
                        learn_poisson=True)
    p0 = bins.init_params(jax.random.PRNGKey(0))
    for tgt_E, tgt_nu in [(1.726e10, 0.3252), (8.86e10, 0.2111),
                          (9.73e9, 0.01), (9.7e11, 0.499), (5e10, 0.25)]:
        p = bins.fit_to(p0, tgt_E, tgt_nu)
        assert abs(float(bins.youngs(p)) - tgt_E) / tgt_E < 1e-4
        assert abs(float(bins.poisson(p)) - tgt_nu) < 1e-4
    # the Adam-only path (gradient-recipe init) keeps all logits live
    p = bins.fit_to(p0, 7.2e10, 0.19, exact=False, steps=5000, lr=5e-3)
    assert abs(float(bins.youngs(p)) - 7.2e10) / 7.2e10 < 0.02
    assert float(jnp.min(p["youngs_logits"])) > -10.0  # not saturated
