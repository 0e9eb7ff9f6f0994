"""Generate golden DSP fixtures with REAL librosa (run where librosa exists).

The reference's featurizer is librosa-based (reference:
preprocess/tacotron/utils.py:27-111); this repo reimplements the math
librosa-free. This script pins that reimplementation to librosa itself:
run it in any environment with librosa installed --

    python tests/golden/generate_librosa_golden.py

-- and commit the resulting ``librosa_golden.npz``. tests/test_golden.py
picks the file up automatically and asserts:
  - hann window == librosa.filters.get_window('hann', 1200) centered pad
  - mel filterbank == librosa.filters.mel(sr=24000, n_fft=2048, n_mels=512)
  - stft magnitude == |librosa.stft(...)| on the fixed wav
  - trim indices == librosa.effects.trim(top_db=15)
  - the full get_spectrograms (mel, mag) outputs

The wav is generated deterministically below (no binary inputs needed).
This environment has no librosa and no network, so the file is absent
here; the torch/scipy anchors in test_golden.py run unconditionally
instead.
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
    import librosa
    import scipy.signal as sps

    y = fixed_wave()
    out = {"wave": y, "librosa_version": np.str_(librosa.__version__)}

    out["hann_win"] = librosa.filters.get_window("hann", WIN, fftbins=True)
    out["mel_basis"] = librosa.filters.mel(sr=SR, n_fft=N_FFT, n_mels=N_MELS)

    yt, idx = librosa.effects.trim(y, top_db=TOP_DB)
    out["trim_start"], out["trim_end"] = np.int64(idx[0]), np.int64(idx[1])

    yp = np.append(yt[0], yt[1:] - PREEMPH * yt[:-1])
    lin = librosa.stft(yp, n_fft=N_FFT, hop_length=HOP, win_length=WIN)
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
