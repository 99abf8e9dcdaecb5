"""DDSP-style time-varying filtered noise in JAX.

Trainable per-frame zero-phase filter banks converted to windowed
linear-phase FIRs, FFT-convolved with white noise frames and overlap-added
(reference /root/reference/src/ddsp/filtered_noise.py:7-67).  The
overlap-add is expressed as a scatter-free padded-sum instead of the
reference's conv_transpose1d trick.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .oscillator import modified_sigmoid


@dataclass(frozen=True)
class FilteredNoise:
    noise_num: int
    sample_num: int
    filter_coeff_length: int = 65
    frame_length: int = 64
    attenuate_gain: float = 1.0

    @property
    def frame_num(self):
        return self.sample_num // self.frame_length + 1

    def init_params(self, key, dtype=jnp.float32):
        return {
            "coeff_bank": jax.random.uniform(
                key,
                (self.noise_num, self.frame_num, self.filter_coeff_length),
                dtype,
                -1.0,
                1.0,
            )
        }

    def __call__(self, params, key=None):
        x = modified_sigmoid(params["coeff_bank"])  # (B, Fr, C)
        B, Fr, C = x.shape
        ir_len = 2 * C - 1
        # zero-phase -> causal linear-phase FIR, Hann-windowed
        zero_phase = jnp.fft.irfft(
            x.astype(jnp.complex64 if x.dtype == jnp.float32 else jnp.complex128),
            n=ir_len,
            axis=-1,
        )
        linear_phase = jnp.roll(zero_phase, C - 1, axis=-1)
        win = jnp.asarray(np.hanning(ir_len), dtype=x.dtype)  # symmetric Hann
        fir = linear_phase * win

        # white noise per frame
        if key is None:
            key = jax.random.PRNGKey(0)
        noise = (
            jax.random.uniform(key, (B, Fr, self.frame_length), x.dtype) * 2.0 - 1.0
        )

        # linear convolution per frame via FFT
        out_len = self.frame_length + ir_len - 1
        nfft = 1 << (out_len - 1).bit_length()
        conv = jnp.fft.irfft(
            jnp.fft.rfft(noise, n=nfft, axis=-1) * jnp.fft.rfft(fir, n=nfft, axis=-1),
            n=nfft,
            axis=-1,
        )[..., :out_len].astype(x.dtype) * self.attenuate_gain

        # overlap-add with hop = frame_length
        total = (Fr - 1) * self.frame_length + out_len
        idx = (
            np.arange(Fr)[:, None] * self.frame_length + np.arange(out_len)[None, :]
        ).reshape(-1)
        flat = conv.reshape(B, -1)
        out = jax.vmap(
            lambda row: jnp.zeros(total, x.dtype).at[idx].add(row)
        )(flat)
        return out[:, : self.sample_num]
