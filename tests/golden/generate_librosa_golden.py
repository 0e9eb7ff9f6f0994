"""Generate golden DSP fixtures pinning the reference's librosa chain.

The reference's featurizer is librosa-based (reference:
preprocess/tacotron/utils.py:27-111); this repo reimplements the math
librosa-free. This script pins that reimplementation:

    python tests/golden/generate_librosa_golden.py

writes ``librosa_golden.npz``; tests/test_golden.py picks the file up
automatically and asserts:
  - hann window == librosa.filters.get_window('hann', 1200) centered pad
  - mel filterbank == librosa.filters.mel(sr=24000, n_fft=2048, n_mels=512)
  - stft magnitude == |librosa.stft(...)| on the fixed wav
  - trim indices == librosa.effects.trim(top_db=15)
  - the full get_spectrograms (mel, mag) outputs

PROVENANCE: with real librosa installed the fixture is generated from it
(preferred — regenerate whenever possible). This image has no librosa and
no network, so the committed fixture was generated from
``librosa_mini.py``, a vendored transcription of the exact librosa
algorithms (see its module docstring for what is transcribed vs delegated
verbatim to scipy). The npz's ``generator`` field records which produced
it; the wav is generated deterministically below either way.
"""

import os

import numpy as np

SR = 24000
N_FFT = 2048
HOP = 300
WIN = 1200
N_MELS = 512
PREEMPH = 0.97
TOP_DB = 15
MAX_DB = 100
REF_DB = 20


def fixed_wave() -> np.ndarray:
    """1.2 s deterministic speech-ish wave with leading/trailing silence."""
    rng = np.random.default_rng(1234)
    t = np.arange(int(1.2 * SR)) / SR
    y = (
        0.4 * np.sin(2 * np.pi * 180 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
        + 0.2 * np.sin(2 * np.pi * 460 * t)
        + 0.05 * np.sin(2 * np.pi * 1500 * t)
        + 0.01 * rng.standard_normal(len(t))
    )
    env = np.minimum(1.0, np.minimum(t / 0.15, (t[-1] - t) / 0.15)) ** 2
    y = (y * env).astype(np.float32)
    y[: int(0.05 * SR)] = 0.0
    y[-int(0.05 * SR):] = 0.0
    return y


def main() -> None:
    try:
        import librosa

        def _mel(sr, n_fft, n_mels):
            return librosa.filters.mel(sr=sr, n_fft=n_fft, n_mels=n_mels)

        def _window(win):
            return librosa.filters.get_window("hann", win, fftbins=True)

        def _trim(y, top_db):
            return librosa.effects.trim(y, top_db=top_db)

        def _stft(y, n_fft, hop, win):
            return librosa.stft(y, n_fft=n_fft, hop_length=hop, win_length=win)

        generator = f"librosa {librosa.__version__}"
    except ImportError:
        # vendored-algorithm fallback (module docstring of librosa_mini.py
        # for provenance) — regenerate with real librosa when available
        import librosa_mini

        _mel = librosa_mini.mel_filters
        _window = librosa_mini.get_window
        _trim = librosa_mini.trim
        _stft = librosa_mini.stft
        generator = "librosa_mini (vendored algorithm transcription; no librosa in image)"

    y = fixed_wave()
    out = {"wave": y, "generator": np.str_(generator)}

    out["hann_win"] = _window(WIN)
    out["mel_basis"] = _mel(SR, N_FFT, N_MELS)

    yt, idx = _trim(y, TOP_DB)
    out["trim_start"], out["trim_end"] = np.int64(idx[0]), np.int64(idx[1])

    yp = np.append(yt[0], yt[1:] - PREEMPH * yt[:-1])
    lin = _stft(yp, N_FFT, HOP, WIN)
    mag = np.abs(lin)
    out["stft_mag"] = mag.astype(np.float32)

    mel = np.dot(out["mel_basis"], mag)
    mel = 20 * np.log10(np.maximum(1e-5, mel))
    mag_db = 20 * np.log10(np.maximum(1e-5, mag))
    mel = np.clip((mel - REF_DB + MAX_DB) / MAX_DB, 1e-8, 1)
    mag_db = np.clip((mag_db - REF_DB + MAX_DB) / MAX_DB, 1e-8, 1)
    out["mel_norm"] = mel.T.astype(np.float32)  # (T, n_mels), reference layout
    out["mag_norm"] = mag_db.T.astype(np.float32)

    path = os.path.join(os.path.dirname(__file__), "librosa_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
