from .mel import mel_filterbank, mel_to_linear_matrix
from .stft import stft_np, istft_np, stft_jax, istft_jax, frame_count
from .audio import load_wav, save_wav, trim_silence, preemphasis, deemphasis
from .features import get_spectrograms, mel_from_wave, mel_from_wave_jax
from .vocoder import (
    griffin_lim_np,
    griffin_lim_jax,
    melspectrogram2wav,
    melspectrogram2wav_jax,
    mel_to_mag,
    mel_to_mag_jax,
)

__all__ = [
    "mel_filterbank",
    "mel_to_linear_matrix",
    "stft_np",
    "istft_np",
    "stft_jax",
    "istft_jax",
    "frame_count",
    "load_wav",
    "save_wav",
    "trim_silence",
    "preemphasis",
    "deemphasis",
    "get_spectrograms",
    "mel_from_wave",
    "mel_from_wave_jax",
    "griffin_lim_np",
    "griffin_lim_jax",
    "melspectrogram2wav",
    "melspectrogram2wav_jax",
    "mel_to_mag",
    "mel_to_mag_jax",
]
