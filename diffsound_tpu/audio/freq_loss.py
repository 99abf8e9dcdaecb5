"""Spectral-peak frequency-matching loss: a ripple-free early phase for
material inference.

Motivation (round-3 diagnosis, benchmarks/diagnostics + results/r3/diag): the reference's early-phase
Sinkhorn + late-phase L1 recipe (/root/reference/src/ddsp/mss_loss.py)
operates on STFT magnitudes, whose value is smooth in the *envelope* but
carries a fine-scale ripple in mode frequency (spectral-leakage phase
alignment).  At the round-2 stall point of the flagship's high-E pairs the
measured directional derivative along +E was ~20x the envelope slope and
sign-flipping on a <0.2% scale in E, so Adam froze ~30% below the target —
while the envelope landscape (benchmarks/diagnostics/loss_sweep2d.py) is cleanly
monotone toward the optimum.  Audio losses cannot avoid this: any
phase-blind spectrogram distance inherits leakage ripple.

This stage works in FREQUENCY space instead: modal peaks are extracted
once from the target audio on the host (the same "analyze the recording"
move the reference's real-audio stage 1 makes when it fits
GTDampedOscillator to recordings, material_real_train.py:113-151), and the
loss is a smooth, symmetric soft-Chamfer distance in log-frequency between
the predicted mode frequencies and the extracted peaks.  No STFT of the
prediction, no phase, no ripple — and O(modes x peaks) cost, orders of
magnitude cheaper than Sinkhorn over spectrogram columns.

Aliasing is handled where the reference's recipe breaks: modes above
Nyquist appear in sampled audio at the folded frequency |f - 2N round(f/2N)|,
so predicted frequencies are folded before matching.  At the true material
the folded predictions coincide with the extracted peaks exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _blackman_harris(n: int) -> np.ndarray:
    """4-term Blackman-Harris: -92 dB sidelobes (Hann: -31 dB)."""
    k = np.arange(n)
    w = 2.0 * np.pi * k / max(n - 1, 1)
    return (0.35875 - 0.48829 * np.cos(w) + 0.14128 * np.cos(2 * w)
            - 0.01168 * np.cos(3 * w))


def extract_spectral_peaks(
    audio: np.ndarray,
    sr: float,
    n_fft: int = 4096,
    top_k: int = 32,
    floor_db: float = 80.0,
    weight_power: float = 0.25,
    window: str = "blackmanharris",
):
    """Host-side modal-peak extraction from target audio.

    audio (T,) or (A, T) -> (freqs (P,), weights (P,)), P <= top_k,
    sorted by frequency.  Peaks are local maxima of the time-averaged
    log-magnitude STFT, refined by parabolic interpolation; weights are
    magnitudes compressed by weight_power then normalized — raw linear
    magnitudes span ~3 decades between the long-ringing fundamental and
    the heavily Rayleigh-damped top modes, which would reduce the match
    loss to a fundamental-only pull.

    n_fft=None: ONE window spanning the whole signal, zero-padded 2x for
    peak interpolation — the full-length window is what resolves the
    near-Nyquist mode crowding of flagship pair 6 (~40-70 Hz separations
    vs the 4096-window ~30 Hz Hann mainlobe at best).  The window is
    applied to the SIGNAL length and the padding appended after — round
    3 windowed after padding, so the signal saw only the rising half of
    a Hann, whose leakage skirts produced the spurious sidelobe peaks
    that broke pair 1 (nu 0.035 -> 0.10) under this mode.

    window: "blackmanharris" (default) or "hann".  With floor_db=80 a
    Hann's -31 dB sidelobes of strong modes pass the peak floor easily;
    Blackman-Harris puts them at -92 dB, below the floor, at ~2x main-
    lobe width — the right trade for line spectra (decaying modal sums).
    """
    x = np.atleast_2d(np.asarray(audio, np.float64))  # (A, T)
    T = x.shape[1]
    win_fn = _blackman_harris if window == "blackmanharris" else np.hanning
    if n_fft is None:
        win_len = T
        n_fft = min(1 << int(np.ceil(np.log2(2 * T))), 65536)
    else:
        # signals shorter than the frame must get a signal-length window
        # (then zero-pad up to n_fft): padding BEFORE windowing shows the
        # signal only the rising half of the window, whose leakage skirts
        # produce spurious sidelobe peaks — the same bug the whole-signal
        # branch fixed in round 3, re-observed on a 2000-sample test
        # signal under the 4096 default (test_material_sync_learns_youngs)
        win_len = min(n_fft, T)
    hop = win_len // 4
    win = win_fn(win_len)
    n_frames = max(1, (T - win_len) // hop + 1)
    acc = np.zeros(n_fft // 2 + 1)
    # average MAGNITUDE spectra over channels and frames — averaging the
    # waveforms instead would let the mics' different modal phases cancel
    # and hide modes (observed risk on the 8-mic real recordings)
    for ch in x:
        for i in range(n_frames):
            fr = ch[i * hop : i * hop + win_len]
            if len(fr) < win_len:
                fr = np.pad(fr, (0, win_len - len(fr)))
            fr = fr * win
            if n_fft > win_len:
                fr = np.pad(fr, (0, n_fft - win_len))
            acc += np.abs(np.fft.rfft(fr))
    mag = acc / (n_frames * x.shape[0])
    logm = 20.0 * np.log10(mag + 1e-12)
    thresh = logm.max() - floor_db
    # strict local maxima above the floor, skipping DC/Nyquist edges
    cand = [
        k
        for k in range(2, len(mag) - 2)
        if logm[k] > thresh and logm[k] >= logm[k - 1] and logm[k] > logm[k + 1]
    ]
    cand.sort(key=lambda k: -mag[k])
    picked = []
    # min separation scales with the window mainlobe in PADDED bins:
    # Blackman-Harris is ~2x wider than Hann, and zero-padding multiplies
    # the lobe's bin footprint by n_fft / win_len
    lobe = 4 if window == "blackmanharris" else 2
    min_sep = max(2, lobe * n_fft // win_len // 2)
    for k in cand:
        if all(abs(k - p) > min_sep for p in picked):
            picked.append(k)
        if len(picked) >= top_k:
            break
    if not picked:
        return np.zeros((0,)), np.zeros((0,))
    freqs, weights = [], []
    for k in sorted(picked):
        # parabolic interpolation on the log magnitude
        a, b, c = logm[k - 1], logm[k], logm[k + 1]
        denom = a - 2 * b + c
        delta = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
        delta = float(np.clip(delta, -0.5, 0.5))
        freqs.append((k + delta) * sr / n_fft)
        weights.append(mag[k])
    freqs = np.asarray(freqs)
    weights = np.asarray(weights) ** weight_power
    return freqs, weights / weights.sum()


def union_peaks(peak_sets, merge_tol: float = 3e-3):
    """Merge several (freqs, weights) extractions into one deduplicated
    peak set: peaks within merge_tol in log-frequency collapse to the
    weight-averaged position with the MAX weight (each set's weights are
    already normalized, so max — not sum — keeps a peak seen by every
    window from triple-counting).  Returns (freqs, weights), weights
    renormalized."""
    fs, ws = [], []
    for f, w in peak_sets:
        fs.extend(np.asarray(f).tolist())
        ws.extend(np.asarray(w).tolist())
    if not fs:
        return np.zeros((0,)), np.zeros((0,))
    order = np.argsort(fs)
    fs = np.asarray(fs)[order]
    ws = np.asarray(ws)[order]
    out_f, out_w = [fs[0]], [ws[0]]
    for f, w in zip(fs[1:], ws[1:]):
        if np.log(f) - np.log(out_f[-1]) < merge_tol:
            if w > out_w[-1]:
                out_f[-1], out_w[-1] = f, w
        else:
            out_f.append(f)
            out_w.append(w)
    w = np.asarray(out_w)
    return np.asarray(out_f), w / w.sum()


def peak_coverage_score(pred_freqs, peaks, weights, sr: float,
                        tol: float = 5e-3):
    """Weighted fraction of peaks matched by a predicted mode within
    `tol` in log-frequency (predictions Nyquist-folded), minus a small
    mean-distance tiebreak.

    The arbitration metric for multi-window extraction: a CORRECT
    material fit lands essentially every real peak at <1e-3 log-distance
    (the modal model is exact for synthetic targets), while a wrong-
    basin fit misses whole peaks by >1e-2 — a gap the smooth chamfer
    score blurs away (measured: the chamfer ranked a nu-0.06-off pair-3
    fit above the exact one by 0.0512 vs 0.0552; this score separates
    them decisively).  Host-side numpy, detached."""
    f = np.asarray(pred_freqs, np.float64)
    f = np.abs(f - sr * np.round(f / sr))
    lf = np.log(np.maximum(f, 20.0))
    lp = np.log(np.maximum(np.asarray(peaks, np.float64), 20.0))
    w = np.asarray(weights, np.float64)
    d = np.abs(lp[:, None] - lf[None, :]).min(axis=1)  # per peak
    matched = d < tol
    return float(np.sum(w * matched) - np.mean(np.minimum(d, 0.1)))


def fold_nyquist(f, sr: float):
    """Apparent frequency of a sampled sinusoid: |f - 2N round(f/2N)| with
    N = sr/2.  Piecewise linear, derivative +-1 (round() has zero grad)."""
    two_n = jnp.asarray(sr, f.dtype)
    k = jax.lax.stop_gradient(jnp.round(f / two_n))
    r = f - two_n * k
    return jnp.sign(r) * r  # |r| with grad sign(r) (0 at r=0)


def _softmin(d, tau):
    """Smooth minimum over the last axis: -tau logsumexp(-d / tau)."""
    return -tau * jax.scipy.special.logsumexp(-d / tau, axis=-1)


def freq_chamfer_loss(
    pred_freqs: jnp.ndarray,
    peak_freqs: jnp.ndarray,
    peak_weights: jnp.ndarray,
    sr: float,
    tau: float = 2e-3,
    fold: bool = True,
    f_floor: float = 20.0,
):
    """Symmetric soft-Chamfer distance in log-frequency.

    pred_freqs (..., M) differentiable; peak_freqs/weights (P,) constants.
    Term A pulls every extracted peak toward its (soft-)nearest predicted
    mode, magnitude-weighted; term B pulls every predicted mode toward its
    nearest peak.  tau is the squared-log-distance softmin temperature
    (2e-3 ~ 4.5% frequency scale: wide enough to rank basins, narrow
    enough to localize)."""
    f = pred_freqs.reshape(-1)
    if fold:
        f = fold_nyquist(f, sr)
    lf = jnp.log(jnp.maximum(f, f_floor))
    lp = jnp.log(jnp.maximum(jnp.asarray(peak_freqs, lf.dtype), f_floor))
    w = jnp.asarray(peak_weights, lf.dtype)
    d = (lf[:, None] - lp[None, :]) ** 2  # (M, P)
    loss_peaks = jnp.sum(w * _softmin(d.T, tau))  # peaks covered by modes
    loss_modes = jnp.mean(_softmin(d, tau))  # modes anchored to peaks
    return loss_peaks + loss_modes
