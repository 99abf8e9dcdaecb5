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
    """x (..., T) -> frames (..., num_frames, frame_length).

    Implemented with slices + reshapes only (interleaved non-overlapping
    groups), never a gather: the gather's backward is a large-index
    scatter and conv-patch extraction needs an n_fft x n_fft kernel —
    both make the TPU compiler grind for minutes at larger frame sizes.
    Requires hop | frame_length (true for all overlap factors used here);
    falls back to a gather otherwise."""
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    batch_shape = x.shape[:-1]
    T = x.shape[-1]
    num_frames = 1 + (T - frame_length) // hop

    if frame_length % hop != 0:
        starts = np.arange(num_frames) * hop
        idx = starts[:, None] + np.arange(frame_length)[None, :]
        return x[..., idx]

    R = frame_length // hop
    M = -(-num_frames // R)  # frames per interleave group (ceil)
    # group j holds frames j, j+R, ...: contiguous slices of length
    # M*frame_length starting at j*hop
    need = (R - 1) * hop + M * frame_length
    if need > T:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, need - T)])
    groups = [
        x[..., j * hop : j * hop + M * frame_length].reshape(
            *batch_shape, M, frame_length
        )
        for j in range(R)
    ]
    frames = jnp.stack(groups, axis=-2)  # (..., M, R, frame_length)
    frames = frames.reshape(*batch_shape, M * R, frame_length)
    return frames[..., :num_frames, :]


def spectrogram(x: jnp.ndarray, n_fft: int, hop: int, power: float = 2.0):
    """(..., T) -> (..., n_fft//2 + 1, num_frames) magnitude^power."""
    frames = frame_signal(x, n_fft, hop, center=True)
    win = hann_window(n_fft, dtype=x.dtype)
    spec = jnp.fft.rfft(frames * win, axis=-1)  # (..., frames, bins)
    mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag**power
    return jnp.swapaxes(mag, -1, -2)  # (..., bins, frames)
