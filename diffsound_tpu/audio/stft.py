"""Spectrograms in JAX with torch/torchaudio-compatible semantics.

`spectrogram` reproduces `torchaudio.transforms.Spectrogram(n_fft,
hop_length)` defaults — Hann window of length n_fft, power-2 magnitude,
centered frames with reflect padding — so losses computed on either side
agree (needed for the parity tests against the reference's MSS losses,
/root/reference/src/ddsp/mss_loss.py:70-123).

The framing is expressed as a gather + batched rfft; XLA fuses the window
multiply and the squared magnitude.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def hann_window(n: int, dtype=jnp.float32):
    # periodic Hann (torch.hann_window default periodic=True)
    k = np.arange(n)
    return jnp.asarray(0.5 - 0.5 * np.cos(2.0 * np.pi * k / n), dtype=dtype)


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int, center: bool = True):
    """x (..., T) -> frames (..., num_frames, frame_length)."""
    if center:
        pad = frame_length // 2
        x = jnp.concatenate(
            [x[..., 1 : pad + 1][..., ::-1], x, x[..., -pad - 1 : -1][..., ::-1]],
            axis=-1,
        )
    T = x.shape[-1]
    num_frames = 1 + (T - frame_length) // hop
    starts = np.arange(num_frames) * hop
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    return x[..., idx]


def spectrogram(x: jnp.ndarray, n_fft: int, hop: int, power: float = 2.0):
    """(..., T) -> (..., n_fft//2 + 1, num_frames) magnitude^power."""
    frames = frame_signal(x, n_fft, hop, center=True)
    win = hann_window(n_fft, dtype=x.dtype)
    spec = jnp.fft.rfft(frames * win, axis=-1)  # (..., frames, bins)
    mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag**power
    return jnp.swapaxes(mag, -1, -2)  # (..., bins, frames)
