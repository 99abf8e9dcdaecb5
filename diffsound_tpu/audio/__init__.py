from .stft import spectrogram
from .oscillator import (
    OscillatorBank,
    TraditionalOscillatorParams,
    synth_signal,
)
from .mss_loss import MSSLoss

__all__ = [
    "spectrogram",
    "OscillatorBank",
    "TraditionalOscillatorParams",
    "synth_signal",
    "MSSLoss",
]
