"""Real-audio pipeline tests: WAV IO, preprocessing, GT oscillator fit +
damping-curve extraction on synthetic 'recordings'."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffsound_tpu.audio.damping import DampingCurve
from diffsound_tpu.audio.io import (
    highpass_biquad,
    load_real_audio_dir,
    read_wav,
    resample,
    write_wav,
)
from diffsound_tpu.audio.oscillator import GTOscillatorBank
from diffsound_tpu.experiments.material_real import (
    extract_damping_curve,
    fit_gt_oscillator,
)
from diffsound_tpu.fem.material import Material, MatSet


class TestAudioIO:
    def test_wav_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        x = rng.uniform(-0.9, 0.9, (2, 1000))
        path = str(tmp_path / "t.wav")
        write_wav(path, x, 16000)
        y, sr = read_wav(path)
        assert sr == 16000
        np.testing.assert_allclose(y, x, atol=1e-4)

    def test_resample_preserves_tone(self):
        sr1, sr2 = 48000, 32000
        t = np.arange(9600) / sr1
        x = np.sin(2 * np.pi * 440 * t)
        y = resample(x, sr1, sr2)
        assert abs(len(y) - 6400) <= 1
        t2 = np.arange(len(y)) / sr2
        ref = np.sin(2 * np.pi * 440 * t2)
        # ignore edges (filter transients)
        np.testing.assert_allclose(y[500:-500], ref[500:-500], atol=0.02)

    def test_highpass_kills_dc(self):
        sr = 32000
        x = np.ones(4000) + 0.1 * np.sin(2 * np.pi * 1000 * np.arange(4000) / sr)
        y = highpass_biquad(x, sr, 100)
        assert abs(y[2000:].mean()) < 0.01
        # 1 kHz content preserved
        assert y[2000:].std() > 0.05

    def test_load_reference_recordings(self):
        import os

        if not os.path.exists("/root/reference/data/real_audio/mic0.wav"):
            pytest.skip("reference data absent")
        audio, sr = load_real_audio_dir(
            "/root/reference/data/real_audio", 32000.0, 8000, audio_num=2
        )
        assert audio.shape == (2, 8000)
        assert np.abs(audio).max() <= 1.0 + 1e-6
        assert np.all(np.isfinite(audio))


class TestDampingCurve:
    def test_band_min_interp(self):
        freqs = np.array([300.0, 700.0, 800.0, 1300.0, 5300.0])
        damps = np.array([50.0, 40.0, 60.0, 30.0, 80.0])
        c = DampingCurve(freqs, damps)
        # band [20,520): min 50 @270; [520,1020): min 40 @770; ...
        assert abs(c(270.0) - 50.0) < 1e-9
        assert abs(c(770.0) - 40.0) < 1e-9
        # extrapolation is linear
        assert np.isfinite(c(19000.0))

    def test_damp_limit_filter(self):
        freqs = np.array([300.0, 700.0, 1300.0, 1400.0])
        damps = np.array([50.0, 400.0, 30.0, 35.0])  # 400 excluded
        c = DampingCurve(freqs, damps)
        assert 700.0 not in c.x  # that band dropped


class TestNonlinearFrequency:
    """The per-sample nonlinear frequency term (reference
    oscillator.py:186-188,218-224)."""

    def _bank(self):
        mat = Material.of(MatSet.Ceramic)
        bank = GTOscillatorBank(2, 4, 500, 16000.0, mat, use_nonlinear=True)
        params = bank.init_params(jax.random.PRNGKey(0))
        return bank, params

    def test_rate_zero_matches_constant_path(self):
        bank, params = self._bank()
        sig0, _ = bank(params, non_linear_rate=0.0)
        bank_c = GTOscillatorBank(2, 4, 500, 16000.0, Material.of(MatSet.Ceramic))
        params_c = {k: v for k, v in params.items() if k != "nl_freq_logits"}
        sig_c, _ = bank_c(params_c)
        np.testing.assert_allclose(np.asarray(sig0), np.asarray(sig_c), atol=2e-5)

    def test_nonlinear_changes_signal_and_grads_flow(self):
        bank, params = self._bank()
        sig0, _ = bank(params, non_linear_rate=0.0)
        sig1, _ = bank(params, non_linear_rate=0.5)
        assert np.all(np.isfinite(np.asarray(sig1)))
        assert not np.allclose(np.asarray(sig0), np.asarray(sig1))
        g = jax.grad(
            lambda p: jnp.sum(bank(p, non_linear_rate=0.5)[0] ** 2)
        )(params)
        gn = np.abs(np.asarray(g["nl_freq_logits"]))
        assert np.isfinite(gn).all() and gn.max() > 0


def test_gt_oscillator_fit_recovers_modes():
    """Fit the GT bank to a synthetic 2-mode recording; the extracted
    damping curve should approximate the true damping at those modes."""
    sr, T = 16000.0, 2000
    t = (np.arange(T) + 1) / sr
    true = (
        0.8 * np.exp(-30 * t) * np.sin(2 * np.pi * 800 * t)
        + 0.5 * np.exp(-60 * t) * np.sin(2 * np.pi * 2100 * t)
    )
    gt = jnp.asarray(true[None, :], jnp.float32)
    forces = jnp.zeros((1, 30), jnp.float32).at[:, 0].set(1.0)
    mat = Material.of(MatSet.Ceramic)
    bank, params = fit_gt_oscillator(
        gt, forces, 24, sr, mat, iters=600, verbose=False
    )
    curve = extract_damping_curve(bank, params)
    # curve should be positive and finite in the fitted range
    v = curve(np.array([800.0, 2100.0]))
    assert np.all(np.isfinite(v))
    assert np.all(v > 0)


def test_stage2_newton_init_recovers_material():
    """train_material_real with the modal-Newton initializer: synthetic
    'recordings' built with a known damping CURVE (not the Rayleigh
    table) on a small cube; the closed-form fit must land (E, nu) near
    the truth before the polish epochs even start."""
    from diffsound_tpu.audio.oscillator import synth_constant_modes
    from diffsound_tpu.experiments.material_real import train_material_real
    from diffsound_tpu.fem.mesh import cube_tet_mesh
    from diffsound_tpu.models.sound_obj import build_model

    mesh = cube_tet_mesh(3, size=0.4)
    sr, T, modes = 32000.0, 6000, 10
    gt = (2700.0, 5.6e10, 0.27, 6.0, 1e-7)
    init = (2700.0, 3.4e10, 0.18, 6.0, 1e-7)

    gt_model = build_model(mesh=mesh, mode_num=modes, order=1, mat=gt,
                           task="gt", dtype=jnp.float64)
    eig = gt_model.eigen_decomposition(method="arpack", sigma=1e6)
    f_und = np.asarray(gt_model.get_undamped_freqs({}, eig))
    curve = DampingCurve(np.linspace(100.0, 16000.0, 50),
                         4.0 + 1e-3 * np.linspace(100.0, 16000.0, 50))
    d = np.asarray(curve(f_und))
    fd = np.sqrt(np.maximum((2 * np.pi * f_und) ** 2 - d**2, 0.0)) / (2 * np.pi)
    audio = synth_constant_modes(
        jnp.asarray(fd, jnp.float32)[None, :],
        jnp.asarray(d, jnp.float32)[None, :],
        jnp.ones((1, modes), jnp.float32), T, sr,
    )

    res = train_material_real(
        mesh, np.asarray(audio), curve, init, exp_mode=2, mode_num=modes,
        sample_rate=sr, max_epoch=2, early_loss_epoch=0, verbose=False,
        newton_init=True,
    )
    assert abs(res["youngs"] - gt[1]) / gt[1] < 0.04, res["youngs"]
    assert abs(res["poisson"] - gt[2]) < 0.05, res["poisson"]
