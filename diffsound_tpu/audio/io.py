"""Audio IO and host-side signal preprocessing.

Self-contained replacements for the torchaudio calls used by the
reference's real-audio pipeline (/root/reference/experiments/
material_real_train.py:80-106): WAV read/write via the stdlib, polyphase
resampling and biquad high-pass via scipy.signal, dB gain."""

from __future__ import annotations

import wave

import numpy as np


def read_wav(path: str):
    """-> (samples (channels, n) float64 in [-1, 1], sample_rate)."""
    with wave.open(path, "rb") as w:
        nch = w.getnchannels()
        width = w.getsampwidth()
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        val = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        val = np.where(val >= 1 << 23, val - (1 << 24), val)
        data = val.astype(np.float64) / float(1 << 23)
    else:
        raise ValueError(f"unsupported sample width {width}")
    return data.reshape(-1, nch).T, sr


def write_wav(path: str, samples: np.ndarray, sr: int):
    """samples (channels, n) or (n,) in [-1, 1] -> 16-bit PCM."""
    samples = np.atleast_2d(np.asarray(samples))
    pcm = np.clip(samples.T * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(samples.shape[0])
        w.setsampwidth(2)
        w.setframerate(int(sr))
        w.writeframes(pcm.tobytes())


def gain_db(x: np.ndarray, db: float):
    return x * 10.0 ** (db / 20.0)


def resample(x: np.ndarray, sr_in: int, sr_out: int):
    """Polyphase resampling along the last axis."""
    from fractions import Fraction

    import scipy.signal as ss

    fr = Fraction(int(sr_out), int(sr_in))
    return ss.resample_poly(x, fr.numerator, fr.denominator, axis=-1)


def highpass_biquad(x: np.ndarray, sr: float, cutoff: float, Q: float = 0.707):
    """RBJ-cookbook biquad high-pass (same filter torchaudio implements)."""
    import scipy.signal as ss

    w0 = 2.0 * np.pi * cutoff / sr
    alpha = np.sin(w0) / (2.0 * Q)
    cos = np.cos(w0)
    b = np.array([(1 + cos) / 2, -(1 + cos), (1 + cos) / 2])
    a = np.array([1 + alpha, -2 * cos, 1 - alpha])
    return ss.lfilter(b / a[0], a / a[0], x, axis=-1)


def load_real_audio_dir(audio_dir: str, sample_rate: float, frame_num: int,
                        audio_num: int = 8, highpass_hz: float = 100.0):
    """Load the reference's mic recordings with metadata gain/pad handling
    (material_real_train.py:80-106): gain, pad-trim, resample, high-pass,
    per-channel max-normalize.  Returns (audio (A, frame_num), sr)."""
    import glob
    import os

    gain, pad = None, None
    meta = os.path.join(audio_dir, "metadata.yaml")
    if os.path.exists(meta):
        # minimal yaml: "gain:\n- a\n- b\npad:\n- c\n- d"
        vals = {}
        key = None
        for line in open(meta):
            line = line.strip()
            if line.endswith(":"):
                key = line[:-1]
                vals[key] = []
            elif line.startswith("-") and key:
                vals[key].append(float(line[1:].strip()))
        gain = vals.get("gain")
        pad = vals.get("pad")

    audios = []
    for path in sorted(glob.glob(os.path.join(audio_dir, "mic*.wav")))[:audio_num]:
        x, sr = read_wav(path)
        x = x[0]  # first channel
        if gain is not None:
            x = gain_db(x, gain[1])
        if pad is not None:
            x = x[int(pad[1] * sr):]
        x = resample(x, sr, int(sample_rate))[:frame_num]
        x = highpass_biquad(x, sample_rate, highpass_hz)
        x = x / (np.abs(x).max() + 1e-12)
        if len(x) < frame_num:
            x = np.pad(x, (0, frame_num - len(x)))
        audios.append(x)
    return np.stack(audios), sample_rate
