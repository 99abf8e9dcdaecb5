"""Pallas TPU kernel: fused damped-oscillator-bank synthesis.

The XLA path materializes the (audio, modes, samples) phase/envelope
intermediates in HBM (~2 MB per array for the flagship shapes — fine, but
at larger banks, e.g. material_real's GT oscillator with 256 modes x 8000
samples x 8 mics, the intermediates reach hundreds of MB).  This kernel
tiles the time axis, keeps per-mode state in VMEM, and accumulates the
mode sum in-register, so HBM traffic is just the (A, T) output:

    out[a, t] = sum_m amp[a, m] * exp(-d[a, m] t') * sin(2 pi f[a, m] t')
    t' = (t + 1) / sr

Phase uses the same split-precision trick as the XLA path (head on the
2^-b grid is exact in f32 for (t+1) < 2^23-b).  Grid: (A, T / BLOCK_T);
modes are vectorized across lanes.

`pallas_synth` falls back to the XLA implementation off-TPU (or via
interpret=True in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .oscillator import synth_constant_modes


def _synth_kernel(head_ref, tail_ref, damp_ref, amp_ref, out_ref, *, sr, block_t, num_audio):
    """One program per time block.  The phase-increment head/tail split is
    precomputed outside (elementwise chains on (M, 1) vectors fail Mosaic
    lowering; inside the kernel every op broadcasts against the (1, bt)
    time vector)."""
    # keep the index arithmetic strictly 32-bit: under x64, python-int
    # operands promote to i64, which Mosaic cannot lower
    t0 = (pl.program_id(0) * jnp.int32(block_t)).astype(jnp.float32)
    n1 = (
        jax.lax.broadcasted_iota(jnp.int32, (1, block_t), 1).astype(jnp.float32)
        + t0
        + jnp.float32(1.0)
    )  # (1, block_t) sample index + 1
    dt_n1 = n1 * jnp.float32(1.0 / sr)

    for a in range(num_audio):
        head = head_ref[a, :][:, None]  # (M, 1) cycles/sample, exact grid
        tail = tail_ref[a, :][:, None]
        d = damp_ref[a, :][:, None]
        amp = amp_ref[a, :][:, None]
        c1 = head * n1
        hi = c1 - jnp.floor(c1)  # (M, block_t)
        c2 = hi + tail * n1
        frac = c2 - jnp.floor(c2)
        phase = jnp.float32(2.0 * np.pi) * frac
        env = jnp.exp(-d * dt_n1)
        out_ref[a : a + 1, :] = jnp.sum(
            amp * env * jnp.sin(phase), axis=0, keepdims=True
        )


def pallas_synth(
    freqs: jax.Array,
    damps: jax.Array,
    amps: jax.Array,
    num_samples: int,
    sr: float,
    block_t: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """(A, M) mode parameters -> (A, num_samples) signal, fused on TPU."""
    if jax.default_backend() == "cpu" and not interpret:
        return synth_constant_modes(freqs, damps, amps, num_samples, sr)

    A, M = freqs.shape
    T = num_samples
    pad_t = (-T) % block_t
    Tp = T + pad_t
    head_bits = max(1, 22 - int(np.ceil(np.log2(Tp + 1))))

    scale = float(2**head_bits)
    f32 = freqs.astype(jnp.float32)
    head = jnp.round(f32 / sr * scale) / scale
    tail = (f32 - head * sr) * (1.0 / sr)

    kernel = functools.partial(
        _synth_kernel, sr=float(sr), block_t=block_t, num_audio=A,
    )
    # grid/index-map arithmetic must stay 32-bit: under the package's
    # global x64 mode the BlockSpec index maps trace to i64, which Mosaic
    # cannot lower (the gridless minimal kernel works, gridded ones fail)
    with jax.enable_x64(False):
        out = _call(kernel, A, M, Tp, block_t, head, tail, damps, amps, interpret)
    return out[:, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def synth_fused(freqs, damps, amps, num_samples, sr):
    """Differentiable wrapper: Pallas fused forward, XLA-recomputed
    backward (the analytic cotangent contractions are exactly the XLA
    path's vjp; forward memory is the win — eval / no-grad paths never
    materialize the (A, M, T) intermediates)."""
    return pallas_synth(freqs, damps, amps, num_samples, sr)


def _synth_fused_fwd(freqs, damps, amps, num_samples, sr):
    return pallas_synth(freqs, damps, amps, num_samples, sr), (freqs, damps, amps)


def _synth_fused_bwd(num_samples, sr, res, g):
    from .oscillator import _synth_constant_modes_xla

    freqs, damps, amps = res
    _, vjp = jax.vjp(
        lambda f, d, a: _synth_constant_modes_xla(f, d, a, num_samples, sr),
        freqs, damps, amps,
    )
    return vjp(g)


synth_fused.defvjp(_synth_fused_fwd, _synth_fused_bwd)


_PROBE = None


def pallas_available() -> bool:
    """One-time capability probe: Mosaic lowering through this PJRT
    backend (the tunneled TPU plugin) is not guaranteed — run a tiny
    kernel once and cache the verdict so the synthesis dispatch can fall
    back to the XLA path silently."""
    global _PROBE
    if _PROBE is None:
        if jax.default_backend() == "cpu":
            _PROBE = False
        else:
            try:
                r = pallas_synth(
                    jnp.ones((1, 8), jnp.float32),
                    jnp.ones((1, 8), jnp.float32),
                    jnp.ones((1, 8), jnp.float32),
                    128,
                    32000.0,
                )
                _PROBE = bool(np.isfinite(np.asarray(r)).all())
            except Exception:
                _PROBE = False
    return _PROBE


def _call(kernel, A, M, Tp, block_t, head, tail, damps, amps, interpret):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((A, Tp), jnp.float32),
        grid=(Tp // block_t,),
        in_specs=[pl.BlockSpec((A, M), lambda t: (0, 0))] * 4,
        out_specs=pl.BlockSpec((A, block_t), lambda t: (0, t)),
        interpret=interpret,
    )(head, tail, damps.astype(jnp.float32), amps.astype(jnp.float32))
