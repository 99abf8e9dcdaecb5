"""Damped modal oscillator banks and additive audio synthesis.

Functional JAX counterparts of the reference's oscillator zoo
(/root/reference/src/ddsp/oscillator.py): `TraditionalOscillatorParams`
(fixed Rayleigh alpha/beta — oscillator.py:246-310), `OscillatorBank`
(trainable per-mode alpha/beta over 64 log bins + amplitudes —
oscillator.py:49-176), `GTOscillatorBank` (fully trainable frequencies for
damping-curve extraction from real audio — oscillator.py:178-243).

TPU-first synthesis: in every shipped configuration the per-mode damping
and frequency are *constant over time*, so the reference's O(T) cumsum
chains (oscillator.py:128-132) collapse to closed forms

    signal[n] = sum_m amp_m * exp(-d_m (n+1) dt) * sin(2 pi f_m (n+1) dt)

evaluated as one fused outer product (the (n+1) offset reproduces the
reference's inclusive cumsum).  Phase is accumulated in f64 and wrapped
mod 1 before the sine so long tails stay accurate in f32 on TPU.  The
force excitation is applied as an FFT convolution; a time-varying cumsum
path (`synth_time_varying`) covers the GT oscillator's nonlinear-frequency
option.

Parameters are plain pytrees (dicts of arrays) so they drop straight into
optax.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.material import Material


def modified_sigmoid(x):
    """2 * sigmoid(x)^2.3 + 1e-6 (reference src/ddsp/utils.py:6-9)."""
    return 2.0 * jax.nn.sigmoid(x) ** jnp.asarray(2.3, x.dtype) + 1e-6


def weighted_value(logits, values):
    """Softplus-normalized convex combination over a fixed value list.

    logits (..., K), values (K,) -> (...).  The universal trainable-scalar
    primitive (reference oscillator.py:10-35)."""
    w = jax.nn.softplus(logits)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return jnp.sum(w * values, axis=-1)


def log_bins(center: float, lo_factor: float, hi_factor: float, num: int):
    return np.exp(
        np.linspace(np.log(center * lo_factor), np.log(center * hi_factor), num)
    )


def fft_convolve_force(signal: jnp.ndarray, forces: jnp.ndarray) -> jnp.ndarray:
    """Causal convolution of per-channel signals with per-channel force
    excitation, truncated to the signal length.

    signal (A, T), forces (A, F) -> (A, T);
    out[a, n] = sum_k forces[a, k] * signal[a, n - k].
    """
    from .stft import irfft_last, rfft_last

    A, T = signal.shape
    F = forces.shape[-1]
    n = T + F - 1
    nfft = 1 << (n - 1).bit_length()
    S = rfft_last(signal, nfft, T)
    K = rfft_last(forces, nfft, F)
    out = irfft_last(S * K, nfft)
    return out[:, :T].astype(signal.dtype)


def _phase_cycles(freqs, num_samples, sr, force_split: bool = False):
    """Fractional phase in cycles, frac(f * (n+1) / sr), accurate for long
    tails without f64 arithmetic in the hot loop.

    On CPU (x64 available and cheap) this is a plain f64 outer product.
    On TPU f64 is emulated prohibitively slowly, so we split the per-step
    increment delta = f/sr into an exactly-representable head (a multiple
    of 2^-b with b chosen so (n+1) * head stays below 2^23 and is thus
    exact in f32) plus a small tail whose product error is < 2^-21
    cycles: frac(n delta) = frac(frac(n head) + n tail)."""
    if jax.default_backend() == "cpu" and not force_split:
        t = (jnp.arange(num_samples, dtype=jnp.float64) + 1.0) / sr
        cycles = freqs.astype(jnp.float64)[..., None] * t
        return jnp.mod(cycles, 1.0)

    n1 = jnp.arange(1, num_samples + 1, dtype=jnp.float32)
    f32 = freqs.astype(jnp.float32)[..., None]
    head_bits = max(1, 22 - int(np.ceil(np.log2(num_samples + 1))))
    scale = float(2**head_bits)
    head = jnp.round(f32 / sr * scale) / scale
    # residual computed against f itself (head*sr is exact on the grid), so
    # the tail absorbs the f/sr rounding rather than drifting with n
    tail = (f32 - head * sr) * (1.0 / sr)
    hi = jnp.mod(head * n1, 1.0)  # exact: products on the 2^-b grid < 2^23
    lo = tail * n1  # |tail| <= 2^-(b+1), |lo| small
    return jnp.mod(hi + lo, 1.0)


def synth_constant_modes(
    freqs: jnp.ndarray,
    damps: jnp.ndarray,
    amps: jnp.ndarray,
    num_samples: int,
    sr: float,
    forces: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Additive synthesis with time-constant per-mode damped freq/damping.

    freqs, damps: (A, M) damped frequency [Hz] and damping [1/s];
    amps: (A, M); forces: optional (A, F).  Returns (A, num_samples).
    """
    dtype = amps.dtype
    A, M = freqs.shape
    # Large banks (material_real GT fit: 8 mics x 256 modes x 8000
    # samples) materialize (A, M, T) intermediates in HBM on the XLA
    # path; the fused Pallas kernel keeps mode state in VMEM and only
    # writes the (A, T) output (backward recomputes via XLA).
    # Probe-gated: falls back when Mosaic is unavailable through the
    # PJRT backend.
    if dtype == jnp.float32 and A * M * num_samples >= 4_000_000:
        from .pallas_osc import pallas_available, synth_fused

        if pallas_available():
            sig = synth_fused(freqs, damps, amps, num_samples, sr)
            if forces is not None:
                sig = fft_convolve_force(sig, forces.astype(dtype))
            return sig
    sig = _synth_constant_modes_xla(freqs, damps, amps, num_samples, sr)
    if forces is not None:
        sig = fft_convolve_force(sig, forces.astype(dtype))
    return sig


def _synth_constant_modes_xla(freqs, damps, amps, num_samples, sr):
    """The plain XLA body (also the backward recompute path for the
    fused Pallas forward)."""
    dtype = amps.dtype
    t = (jnp.arange(num_samples, dtype=jnp.float32) + 1.0) / sr  # (T,)
    phase = 2.0 * jnp.pi * _phase_cycles(freqs, num_samples, sr)
    envelope = jnp.exp(-damps[..., None] * t.astype(dtype))
    sig = amps[..., None] * envelope * jnp.sin(phase).astype(dtype)
    return jnp.sum(sig, axis=-2)  # (A, T)


def synth_time_varying(
    freqs: jnp.ndarray,
    damps: jnp.ndarray,
    amps: jnp.ndarray,
    sr: float,
    forces: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """General path with per-sample freq/damp (A, M, T): inclusive cumsum
    (parity with reference oscillator.py:128-132)."""
    damp_int = jnp.cumsum(damps / sr, axis=-1)
    freq_int = jnp.cumsum(freqs / sr, axis=-1)
    sig = amps * jnp.exp(-damp_int) * jnp.sin(2.0 * jnp.pi * freq_int)
    sig = jnp.sum(sig, axis=-2)
    if forces is not None:
        sig = fft_convolve_force(sig, forces.astype(sig.dtype))
    return sig


def rayleigh_damping(alpha, beta, lbd):
    """d = (alpha + beta * lambda) / 2 for lambda = (2 pi f)^2."""
    return 0.5 * (alpha + beta * lbd)


def damped_frequency(undamped_freq, damp):
    """f_d = sqrt(lambda - d^2) / 2 pi."""
    lbd = (2.0 * jnp.pi * undamped_freq) ** 2
    return jnp.sqrt(jnp.maximum(lbd - damp**2, 1e-12)) / (2.0 * jnp.pi)


# ---------------------------------------------------------------------------
# Oscillator banks
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TraditionalOscillatorParams:
    """Fixed-table Rayleigh damping synthesizer (generates ground truth and
    serves as the synthetic-material synth; reference oscillator.py:246-310)."""

    audio_num: int
    mode_num: int
    sample_num: int
    sr: float
    mat: Material

    def __call__(self, undamped_freq, forces=None, dtype=jnp.float32):
        """undamped_freq (M,) -> (signal (A, T), damped_freq (M,))."""
        f = jnp.broadcast_to(
            undamped_freq.reshape(1, self.mode_num), (self.audio_num, self.mode_num)
        ).astype(dtype)
        lbd = (2.0 * jnp.pi * f) ** 2
        damp = rayleigh_damping(self.mat.alpha, self.mat.beta, lbd)
        fd = damped_frequency(f, damp)
        amps = jnp.ones_like(f)
        sig = synth_constant_modes(fd, damp, amps, self.sample_num, self.sr, forces)
        return sig, fd[0]


@dataclass(frozen=True)
class OscillatorBank:
    """Trainable per-mode Rayleigh damping (64 log bins around the table
    values) + per-(audio, mode) amplitudes (reference oscillator.py:49-176).

    Params pytree: {"alpha_logits": (M, 64), "beta_logits": (M, 64),
                    "amp_raw": (A, M)}.
    """

    audio_num: int
    mode_num: int
    sample_num: int
    sr: float
    mat: Material
    bin_num: int = 64
    alpha_values: np.ndarray = field(default=None)
    beta_values: np.ndarray = field(default=None)

    def __post_init__(self):
        object.__setattr__(
            self, "alpha_values", log_bins(self.mat.alpha, 0.1, 10.0, self.bin_num)
        )
        object.__setattr__(
            self, "beta_values", log_bins(self.mat.beta, 0.1, 10.0, self.bin_num)
        )

    def init_params(self, key, dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "alpha_logits": jax.random.uniform(
                k1, (self.mode_num, self.bin_num), dtype, -4.0, 4.0
            ),
            "beta_logits": jax.random.uniform(
                k2, (self.mode_num, self.bin_num), dtype, -4.0, 4.0
            ),
            "amp_raw": jax.random.uniform(
                k3, (self.audio_num, self.mode_num), dtype, 0.0, 0.04
            ),
        }

    def alpha(self, params):
        return weighted_value(
            params["alpha_logits"], jnp.asarray(self.alpha_values, params["alpha_logits"].dtype)
        )  # (M,)

    def beta(self, params):
        return weighted_value(
            params["beta_logits"], jnp.asarray(self.beta_values, params["beta_logits"].dtype)
        )  # (M,)

    def __call__(self, params, undamped_freq, forces=None):
        """undamped_freq (M,) -> (signal (A, T), damped_freq (M,))."""
        dtype = params["amp_raw"].dtype
        f = undamped_freq.reshape(1, self.mode_num).astype(dtype)
        lbd = (2.0 * jnp.pi * f) ** 2
        damp = rayleigh_damping(self.alpha(params)[None, :], self.beta(params)[None, :], lbd)
        fd = damped_frequency(f, damp)
        amps = modified_sigmoid(params["amp_raw"])
        fd_b = jnp.broadcast_to(fd, amps.shape)
        damp_b = jnp.broadcast_to(damp, amps.shape)
        sig = synth_constant_modes(fd_b, damp_b, amps, self.sample_num, self.sr, forces)
        return sig, fd[0]

    def forward_curve(self, params, undamped_freq, curve_damp, forces=None):
        """Synthesis with damping taken from an extracted damping curve:
        curve_damp (M,) = damping_curve(freq) evaluated host-side
        (reference oscillator.py:143-176; output is max-normalized there)."""
        dtype = params["amp_raw"].dtype
        f = undamped_freq.reshape(1, self.mode_num).astype(dtype)
        damp = jnp.broadcast_to(curve_damp.reshape(1, -1).astype(dtype), f.shape)
        fd = damped_frequency(f, damp)
        amps = jnp.ones((self.audio_num, self.mode_num), dtype)
        fd_b = jnp.broadcast_to(fd, amps.shape)
        damp_b = jnp.broadcast_to(damp, amps.shape)
        sig = synth_constant_modes(fd_b, damp_b, amps, self.sample_num, self.sr, forces)
        sig = sig / jnp.max(
            jnp.abs(jax.lax.stop_gradient(sig)), axis=1, keepdims=True
        )
        return sig, fd[0]

    def pretrain_damps(self, params, steps: int = 2000, lr: float = 0.01):
        """Adam-fit alpha/beta bins to the material table (reference
        `init_damps`, oscillator.py:314-325) — jitted lax.scan, not a
        Python loop."""
        import optax

        opt = optax.adam(lr)
        target_a, target_b = self.mat.alpha, self.mat.beta
        trainable = {k: params[k] for k in ("alpha_logits", "beta_logits")}

        def loss_fn(p):
            a = weighted_value(p["alpha_logits"], jnp.asarray(self.alpha_values, p["alpha_logits"].dtype))
            b = weighted_value(p["beta_logits"], jnp.asarray(self.beta_values, p["beta_logits"].dtype))
            return jnp.mean(
                (a - target_a) ** 2 / target_a**2 + (b - target_b) ** 2 / target_b**2
            )

        @jax.jit
        def run(p):
            state = opt.init(p)

            def step(carry, _):
                p, s = carry
                g = jax.grad(loss_fn)(p)
                updates, s = opt.update(g, s)
                return (optax.apply_updates(p, updates), s), None

            (p, _), _ = jax.lax.scan(step, (p, state), None, length=steps)
            return p

        trained = run(trainable)
        return {**params, **trained}


@dataclass(frozen=True)
class GTOscillatorBank:
    """Fully trainable oscillator fit directly to real recordings to
    *extract* a damping curve (reference oscillator.py:178-243): linear
    frequency, alpha/beta (wider 0.1x..100x bins), amplitudes, filtered
    noise; optional per-sample nonlinear frequency."""

    audio_num: int
    mode_num: int
    sample_num: int
    sr: float
    mat: Material
    f_range: tuple = (20.0, 16000.0)
    bin_num: int = 64
    use_nonlinear: bool = False

    def _freq_values(self):
        return np.asarray(self.f_range, dtype=np.float64)

    def init_params(self, key, dtype=jnp.float32):
        from .filtered_noise import FilteredNoise

        k = jax.random.split(key, 6)
        noise = FilteredNoise(self.audio_num, self.sample_num)
        params = {
            "freq_logits": jax.random.uniform(
                k[0], (self.mode_num, len(self.f_range)), dtype, -4.0, 4.0
            ),
            "alpha_logits": jax.random.uniform(
                k[1], (self.mode_num, self.bin_num), dtype, -4.0, 4.0
            ),
            "beta_logits": jax.random.uniform(
                k[2], (self.mode_num, self.bin_num), dtype, -4.0, 4.0
            ),
            "amp_raw": jax.random.uniform(
                k[3], (self.audio_num, self.mode_num), dtype, 0.0, 0.04
            ),
            "noise": noise.init_params(k[4], dtype),
        }
        if self.use_nonlinear:
            # Per-sample trainable frequency deviation, the reference's
            # `freq_nonlinear` WeightedSum([A, M, T], f_range)
            # (oscillator.py:186-188); only allocated when requested —
            # (A, M, T, |f_range|) is the dominant parameter block.
            params["nl_freq_logits"] = jax.random.uniform(
                k[5],
                (self.audio_num, self.mode_num, self.sample_num, len(self.f_range)),
                dtype, -4.0, 4.0,
            )
        return params

    def _ab_values(self, dtype):
        av = jnp.asarray(log_bins(self.mat.alpha, 0.1, 100.0, self.bin_num), dtype)
        bv = jnp.asarray(log_bins(self.mat.beta, 0.1, 100.0, self.bin_num), dtype)
        return av, bv

    def freq_linear(self, params):
        return weighted_value(
            params["freq_logits"], jnp.asarray(self._freq_values(), params["freq_logits"].dtype)
        )  # (M,)

    def damping(self, params):
        """Per-mode damping at the linear frequency (oscillator.py:211-214)."""
        f = self.freq_linear(params)
        lbd = (2.0 * jnp.pi * f) ** 2
        av, bv = self._ab_values(f.dtype)
        a = weighted_value(params["alpha_logits"], av)
        b = weighted_value(params["beta_logits"], bv)
        return rayleigh_damping(a, b, lbd)

    def __call__(self, params, forces=None, noise_rate=0.0, key=None,
                 non_linear_rate=0.0):
        from .filtered_noise import FilteredNoise

        dtype = params["amp_raw"].dtype
        f = self.freq_linear(params).reshape(1, self.mode_num).astype(dtype)
        av, bv = self._ab_values(dtype)
        a = weighted_value(params["alpha_logits"], av)[None, :]
        b = weighted_value(params["beta_logits"], bv)[None, :]
        amps = modified_sigmoid(params["amp_raw"])
        if non_linear_rate > 0.0 and "nl_freq_logits" in params:
            # Nonlinear path (reference oscillator.py:218-231): undamped
            # freq = linear + rate * per-sample deviation; damping and
            # damped frequency become per-sample, so synthesis goes
            # through the cumsum recurrence instead of the closed form.
            f_nl = weighted_value(
                params["nl_freq_logits"],
                jnp.asarray(self._freq_values(), dtype),
            )  # (A, M, T)
            f_u = f[..., None] + non_linear_rate * f_nl
            lbd = (2.0 * jnp.pi * f_u) ** 2
            damp = rayleigh_damping(a[..., None], b[..., None], lbd)
            fd = jnp.sqrt(jnp.maximum(lbd - damp**2, 1e-12)) / (2.0 * jnp.pi)
            sig = synth_time_varying(fd, damp, amps[..., None], self.sr, forces)
            fd_report = jnp.mean(fd[0], axis=-1)
        else:
            lbd = (2.0 * jnp.pi * f) ** 2
            damp = rayleigh_damping(a, b, lbd)
            fd = damped_frequency(f, damp)
            fd_b = jnp.broadcast_to(fd, amps.shape)
            damp_b = jnp.broadcast_to(damp, amps.shape)
            sig = synth_constant_modes(
                fd_b, damp_b, amps, self.sample_num, self.sr, forces
            )
            fd_report = fd[0]
        if noise_rate > 0.0:
            noise = FilteredNoise(self.audio_num, self.sample_num)
            sig = sig + noise_rate * noise(params["noise"], key)
        return sig, fd_report


def synth_signal(freqs, damps, amps, num_samples, sr, forces=None):
    """Convenience alias for the fused constant-mode synthesis."""
    return synth_constant_modes(freqs, damps, amps, num_samples, sr, forces)
