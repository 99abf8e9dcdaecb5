"""Audio stack tests: STFT parity vs torch, oscillator synthesis vs a
naive cumsum reference, FFT force convolution, Sinkhorn behavior, MSS loss
semantics (SURVEY.md section 4: forward audio allclose vs reference)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffsound_tpu.audio.stft import spectrogram
from diffsound_tpu.audio import oscillator as osc
from diffsound_tpu.audio.mss_loss import MSSLoss, SSSLoss, spec_to_points
from diffsound_tpu.audio.sinkhorn import sinkhorn_divergence
from diffsound_tpu.audio.filtered_noise import FilteredNoise
from diffsound_tpu.fem.material import Material, MatSet


class TestSpectrogram:
    def test_matches_torch_stft(self):
        import torch

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 4000)).astype(np.float32)
        for n_fft in (256, 1024):
            hop = n_fft // 4
            ours = np.asarray(spectrogram(jnp.asarray(x), n_fft, hop))
            xt = torch.from_numpy(x)
            S = torch.stft(
                xt,
                n_fft=n_fft,
                hop_length=hop,
                window=torch.hann_window(n_fft),
                center=True,
                pad_mode="reflect",
                return_complex=True,
            )
            theirs = (S.abs() ** 2).numpy()
            np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


class TestSynthesis:
    def test_constant_modes_match_cumsum_reference(self):
        """Closed-form synthesis == reference-style inclusive cumsum."""
        rng = np.random.default_rng(1)
        A, M, T, sr = 2, 5, 2000, 32000.0
        freqs = rng.uniform(100, 8000, (A, M))
        damps = rng.uniform(1, 100, (A, M))
        amps = rng.uniform(0.1, 1.0, (A, M))

        ours = np.asarray(
            osc.synth_constant_modes(
                jnp.asarray(freqs), jnp.asarray(damps), jnp.asarray(amps), T, sr
            )
        )

        # naive float64 inclusive-cumsum reference (mirrors the reference's
        # torch.cumsum semantics, oscillator.py:128-132)
        d = np.cumsum(np.repeat(damps[:, :, None] / sr, T, axis=2), axis=2)
        f = np.cumsum(np.repeat(freqs[:, :, None] / sr, T, axis=2), axis=2)
        ref = (amps[:, :, None] * np.exp(-d) * np.sin(2 * np.pi * f)).sum(axis=1)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_force_convolution(self):
        rng = np.random.default_rng(2)
        sig = rng.standard_normal((3, 500))
        force = rng.standard_normal((3, 40))
        out = np.asarray(
            osc.fft_convolve_force(jnp.asarray(sig), jnp.asarray(force))
        )
        for a in range(3):
            ref = np.convolve(sig[a], force[a], mode="full")[:500]
            np.testing.assert_allclose(out[a], ref, atol=1e-8)

    def test_impulse_force_is_identity(self):
        rng = np.random.default_rng(3)
        sig = rng.standard_normal((1, 300))
        force = np.zeros((1, 50))
        force[0, 0] = 1.0
        out = np.asarray(osc.fft_convolve_force(jnp.asarray(sig), jnp.asarray(force)))
        np.testing.assert_allclose(out, sig, atol=1e-8)

    def test_traditional_oscillator_shapes(self):
        mat = Material.of(MatSet.Ceramic)
        bank = osc.TraditionalOscillatorParams(1, 16, 8000, 32000.0, mat)
        freqs = jnp.linspace(200.0, 8000.0, 16)
        forces = jnp.zeros((1, 150)).at[0, 0].set(1.0)
        sig, fd = bank(freqs, forces)
        assert sig.shape == (1, 8000)
        assert fd.shape == (16,)
        assert bool(jnp.all(jnp.isfinite(sig)))
        # damped freq below undamped
        assert bool(jnp.all(fd <= freqs + 1e-3))

    def test_trainable_bank_grads(self):
        mat = Material.of(MatSet.Ceramic)
        bank = osc.OscillatorBank(2, 8, 1000, 32000.0, mat)
        params = bank.init_params(jax.random.PRNGKey(0))
        freqs = jnp.linspace(200.0, 4000.0, 8)

        def loss(p):
            sig, _ = bank(p, freqs)
            return jnp.sum(sig**2)

        g = jax.grad(loss)(params)
        for k, v in g.items():
            assert bool(jnp.all(jnp.isfinite(v))), k
        assert float(jnp.abs(g["alpha_logits"]).max()) > 0

    def test_pretrain_damps_converges(self):
        mat = Material.of(MatSet.Ceramic)
        bank = osc.OscillatorBank(1, 4, 100, 32000.0, mat)
        params = bank.init_params(jax.random.PRNGKey(1))
        params = bank.pretrain_damps(params, steps=800)
        a = np.asarray(bank.alpha(params))
        b = np.asarray(bank.beta(params))
        np.testing.assert_allclose(a, mat.alpha, rtol=0.05)
        np.testing.assert_allclose(b, mat.beta, rtol=0.05)


class TestSinkhorn:
    def test_self_divergence_zero(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((50, 4)) * 0.3)
        d = float(sinkhorn_divergence(x, x))
        assert abs(d) < 1e-5

    def test_positive_and_decreasing_with_alignment(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((40, 2)) * 0.2)
        y_far = x + jnp.asarray([1.0, 0.0])
        y_near = x + jnp.asarray([0.1, 0.0])
        d_far = float(sinkhorn_divergence(x, y_far))
        d_near = float(sinkhorn_divergence(x, y_near))
        assert d_far > d_near > 0

    def test_gradient_pulls_toward_target(self):
        rng = np.random.default_rng(6)
        y = jnp.asarray(rng.standard_normal((30, 2)) * 0.2)

        def loss(shift):
            x = y + jnp.stack([shift, jnp.zeros_like(shift)])
            return sinkhorn_divergence(x, y)

        g = jax.grad(loss)(jnp.asarray(0.5))
        assert float(g) > 0  # moving back toward the target reduces loss


class TestMSSLoss:
    def test_l1_zero_at_identity(self):
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((1, 2000)).astype(np.float32))
        loss = MSSLoss([512, 256], 32000.0, loss_type="l1_loss")
        assert float(loss(x, x)) == 0.0
        y = x + 0.1
        assert float(loss(y, x)) > 0

    def test_rmse_loss(self):
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((1, 2000)).astype(np.float32))
        loss = MSSLoss([256], 32000.0, loss_type="rmse_loss")
        assert float(loss(x, x)) == 0.0

    def test_target_cache_parity(self):
        """Precomputed target-side tensors give bit-identical losses for
        every loss type (the cache runs the SAME ops, just hoisted out of
        the training scan)."""
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((1, 2000)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((1, 2000)).astype(np.float32))
        freqs = jnp.asarray([[1500.0]], jnp.float32)
        for lt, fr in (("l1_loss", None), ("rmse_loss", None),
                       ("geomloss", freqs)):
            loss = MSSLoss([512, 256], 32000.0, loss_type=lt)
            tc = loss.target_cache(y)
            a = float(loss(x, y, freqs=fr))
            b = float(loss(x, None, freqs=fr, target_cache=tc))
            assert a == b, (lt, a, b)
        # and through value_and_grad inside jit (the hot-loop shape)
        loss = MSSLoss([512, 256], 32000.0, loss_type="l1_loss")
        tc = loss.target_cache(y)
        g1 = jax.grad(lambda p: loss(p, y))(x)
        g2 = jax.jit(jax.grad(lambda p, t: loss(p, None, target_cache=t)))(x, tc)
        # not bitwise: jit fuses/reassociates differently than eager
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6
        )

    def test_spec_to_points_freq_injection(self):
        spec = jnp.ones((1, 128, 10))
        pts_plain = spec_to_points(spec)
        freqs = jnp.asarray([4050.0])
        pts_freq = spec_to_points(spec, freqs, 32000.0)
        assert pts_plain.shape == (1, 128, 4)
        # the +-2 bins around fractional bin 128/16000*4050 = 32.4 carry
        # shifted (non-lattice) positions
        moved = np.nonzero(
            np.asarray(pts_freq[0, :, 3]) != np.asarray(pts_plain[0, :, 3])
        )[0]
        assert set(moved) <= {30, 31, 32, 33, 34}
        assert len(moved) >= 4
        # the center bin holds the exact fractional position
        assert abs(float(pts_freq[0, 32, 3]) - 32.4 / 128) < 1e-5

    def test_geomloss_gradient_direction(self):
        """Gradient w.r.t. predicted mode frequency points toward target."""
        sr, T = 32000.0, 4000
        t = (np.arange(T) + 1) / sr

        def tone(f):
            return jnp.asarray(
                (np.exp(-20 * t) * np.sin(2 * np.pi * f * t))[None, :].astype(
                    np.float32
                )
            )

        target = tone(2000.0)
        pred = tone(1200.0)
        loss = MSSLoss([1024], sr, loss_type="geomloss")

        def f(freq):
            return loss(pred, target, freqs=freq.reshape(1, 1))

        g = jax.grad(f)(jnp.asarray(1200.0, jnp.float32))
        # increasing predicted frequency toward 2000 should reduce the loss
        assert float(g) < 0


class TestFilteredNoise:
    def test_shapes_and_finite(self):
        fn = FilteredNoise(2, 1000)
        params = fn.init_params(jax.random.PRNGKey(0))
        out = fn(params, jax.random.PRNGKey(1))
        assert out.shape == (2, 1000)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_grad_flows(self):
        fn = FilteredNoise(1, 500)
        params = fn.init_params(jax.random.PRNGKey(0))
        g = jax.grad(lambda p: jnp.sum(fn(p, jax.random.PRNGKey(1)) ** 2))(params)
        assert float(jnp.abs(g["coeff_bank"]).max()) > 0


class TestSplitPhase:
    def test_split_phase_matches_f64(self):
        """The TPU split-precision phase accumulator tracks the f64 path
        to ~1e-5 cycles over an 8000-sample tail."""
        from diffsound_tpu.audio.oscillator import _phase_cycles

        freqs = jnp.asarray(np.linspace(97.3, 15987.1, 16, dtype=np.float32))
        ref = np.asarray(_phase_cycles(freqs, 8000, 32000.0))
        split = np.asarray(_phase_cycles(freqs, 8000, 32000.0, force_split=True))
        # compare circularly (wraps at 1.0)
        d = np.abs(ref - split)
        d = np.minimum(d, 1.0 - d)
        assert d.max() < 2e-5, d.max()

    def test_split_phase_gradient(self):
        from diffsound_tpu.audio.oscillator import _phase_cycles

        def f(freq):
            return jnp.sum(
                _phase_cycles(freq.reshape(1), 100, 32000.0, force_split=True)
            )

        g = float(jax.grad(f)(jnp.asarray(440.0, jnp.float32)))
        # sum over n of n/sr = 5050/32000
        assert abs(g - 5050.0 / 32000.0) < 1e-3


class TestUtilityLosses:
    def test_lsd_and_mode_loss(self):
        from diffsound_tpu.audio.mss_loss import (
            inv_mel_scale,
            lsd_loss,
            mel_scale,
            mode_loss,
            reconstruct_signal,
        )

        s = jnp.ones((8, 10))
        assert float(lsd_loss(s, s)) == 0.0
        assert float(lsd_loss(10 * s, s)) > 0.9

        f = jnp.asarray([100.0, 200.0, 400.0])
        assert float(mode_loss(f, f)) < 1e-6
        assert float(mode_loss(f * 1.1, f)) > 0.0

        assert abs(float(inv_mel_scale(mel_scale(440.0))) - 440.0) < 1e-3

        sig = reconstruct_signal(jnp.asarray([440.0]), jnp.asarray([0.0]), 100, 16000)
        assert sig.shape == (100,)


class TestPallasSynth:
    def test_matches_xla_path_interpreted(self):
        from diffsound_tpu.audio.pallas_osc import pallas_synth
        from diffsound_tpu.audio.oscillator import synth_constant_modes

        rng = np.random.default_rng(0)
        A, M, T, sr = 2, 16, 1000, 32000.0
        freqs = jnp.asarray(rng.uniform(100, 8000, (A, M)).astype(np.float32))
        damps = jnp.asarray(rng.uniform(1, 100, (A, M)).astype(np.float32))
        amps = jnp.asarray(rng.uniform(0.1, 1, (A, M)).astype(np.float32))
        ref = np.asarray(synth_constant_modes(freqs, damps, amps, T, sr))
        out = np.asarray(
            pallas_synth(freqs, damps, amps, T, sr, block_t=256, interpret=True)
        )
        np.testing.assert_allclose(out, ref, atol=5e-5)


def test_synth_fused_vjp_matches_xla():
    """Pallas fused synthesis (interpret mode): forward matches the XLA
    path and the custom vjp gives identical parameter gradients."""
    import jax
    import jax.numpy as jnp
    from diffsound_tpu.audio import pallas_osc
    from diffsound_tpu.audio.oscillator import _synth_constant_modes_xla

    rng = np.random.default_rng(0)
    A, M, T, sr = 2, 8, 256, 32000.0
    freqs = jnp.asarray(rng.uniform(50, 4000, (A, M)), jnp.float32)
    damps = jnp.asarray(rng.uniform(1, 40, (A, M)), jnp.float32)
    amps = jnp.asarray(rng.uniform(0.1, 1.0, (A, M)), jnp.float32)

    out_p = pallas_osc.pallas_synth(freqs, damps, amps, T, sr, interpret=True)
    out_x = _synth_constant_modes_xla(freqs, damps, amps, T, sr)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=2e-4)

    def loss_fused(f, d, a):
        return jnp.sum(pallas_osc.synth_fused(f, d, a, T, sr) ** 2)

    def loss_xla(f, d, a):
        return jnp.sum(_synth_constant_modes_xla(f, d, a, T, sr) ** 2)

    # vjp correctness (the fused forward is CPU-fallback here; the custom
    # bwd is exercised either way)
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(freqs, damps, amps)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(freqs, damps, amps)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


class TestFreqChamfer:
    """Spectral-peak extraction + alias-aware frequency-matching loss
    (audio/freq_loss.py) — the round-3 ripple-free early phase."""

    SR = 32000.0

    def _audio_of(self, freqs, T=8000):
        from diffsound_tpu.audio.oscillator import synth_constant_modes

        f = jnp.asarray(freqs, jnp.float32)[None, :]
        damps = jnp.full_like(f, 12.0)
        amps = jnp.ones_like(f)
        return synth_constant_modes(f, damps, amps, T, self.SR)

    def test_peak_extraction_accuracy(self):
        from diffsound_tpu.audio.freq_loss import extract_spectral_peaks

        true = [440.0, 1318.0, 3702.5, 9203.0]
        audio = np.asarray(self._audio_of(true))
        pk, w = extract_spectral_peaks(audio, self.SR)
        assert len(pk) >= len(true)
        for f in true:
            assert np.min(np.abs(pk - f)) < 4.0, (f, pk)
        assert np.isclose(w.sum(), 1.0)

    def test_fold_nyquist(self):
        from diffsound_tpu.audio.freq_loss import fold_nyquist

        f = jnp.asarray([1000.0, 15000.0, 17000.0, 31000.0, 33000.0])
        out = np.asarray(fold_nyquist(f, self.SR))
        np.testing.assert_allclose(out, [1000, 15000, 15000, 1000, 1000])
        # derivative: +1 below Nyquist, -1 in the reflected band
        g = jax.grad(lambda x: fold_nyquist(x, self.SR))
        assert float(g(jnp.float32(15000.0))) == 1.0
        assert float(g(jnp.float32(17000.0))) == -1.0

    def test_chamfer_smooth_and_monotone(self):
        """Scaling predicted freqs from 0.85x to 1.0x of the peaks must
        decrease the loss at every 0.25% step — the property the
        STFT-based L1 loss lacks (leakage ripple)."""
        from diffsound_tpu.audio.freq_loss import (
            extract_spectral_peaks, freq_chamfer_loss,
        )

        true = [800.0, 2100.0, 4900.0, 9100.0, 13200.0]
        audio = np.asarray(self._audio_of(true))
        pk, w = extract_spectral_peaks(audio, self.SR)
        f0 = jnp.asarray(true, jnp.float32)
        scales = np.arange(0.85, 1.0001, 0.0025)
        vals = [
            float(freq_chamfer_loss(f0 * s, jnp.asarray(pk), jnp.asarray(w), self.SR))
            for s in scales
        ]
        diffs = np.diff(vals)
        assert np.all(diffs < 0), vals

    def test_alias_awareness(self):
        """A ground truth with over-Nyquist modes: the loss at the TRUE
        (over-Nyquist) frequencies must beat the loss at the reflected
        sub-Nyquist stall point's neighborhood scale."""
        from diffsound_tpu.audio.freq_loss import (
            extract_spectral_peaks, freq_chamfer_loss,
        )

        true = [1800.0, 4500.0, 8000.0, 12100.0, 17500.0]  # last aliases to 14500
        audio = np.asarray(self._audio_of([1800, 4500, 8000, 12100, 32000 - 17500]))
        pk, w = extract_spectral_peaks(audio, self.SR)
        loss_true = float(freq_chamfer_loss(
            jnp.asarray(true, jnp.float32), jnp.asarray(pk), jnp.asarray(w), self.SR
        ))
        stall = jnp.asarray(true, jnp.float32) * 0.84  # all modes sub-Nyquist
        loss_stall = float(freq_chamfer_loss(
            stall, jnp.asarray(pk), jnp.asarray(w), self.SR
        ))
        assert loss_true < loss_stall

    def test_peak_extraction_multichannel_phase_robust(self):
        """Two mics with the same mode at OPPOSITE phase: waveform
        averaging would cancel it; magnitude-spectra averaging must
        still find it."""
        from diffsound_tpu.audio.freq_loss import extract_spectral_peaks

        t = np.arange(8000) / self.SR
        f0 = 3702.5
        ch0 = np.exp(-12 * t) * np.sin(2 * np.pi * f0 * t)
        audio = np.stack([ch0, -ch0])  # mean(waveforms) == 0
        pk, w = extract_spectral_peaks(audio, self.SR)
        assert len(pk) >= 1
        assert np.min(np.abs(pk - f0)) < 4.0, pk
