from .stft_mel import stft_mel_pallas, mel_from_wave_pallas

__all__ = ["stft_mel_pallas", "mel_from_wave_pallas"]
