"""DSP layer tests: STFT/ISTFT invariants, numpy<->JAX parity, mel
filterbank properties, featurizer + Griffin-Lim round trips.

librosa is not available in this environment; the numpy implementations are
the oracle (their math mirrors librosa's documented conventions — Slaney mel,
periodic Hann, center reflect padding, window-sum-squares ISTFT), and the
JAX/TPU paths are tested against them (SURVEY.md §4.1).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from adaptive_voice_conversion_tpu.core.config import SignalConfig
from adaptive_voice_conversion_tpu.dsp import (
    frame_count,
    get_spectrograms,
    griffin_lim_jax,
    griffin_lim_np,
    istft_jax,
    istft_np,
    mel_filterbank,
    mel_from_wave,
    mel_from_wave_jax,
    mel_to_linear_matrix,
    mel_to_mag,
    melspectrogram2wav,
    preemphasis,
    deemphasis,
    stft_jax,
    stft_np,
    trim_silence,
)
from adaptive_voice_conversion_tpu.dsp.audio import load_wav, save_wav

SR = 24000
# small config for fast tests (full 2048-FFT paths tested once below)
SMALL = SignalConfig(sr=8000, n_fft=256, hop_length=64, win_length=192, n_mels=40, n_iter=8)


def sine_speechish(n, sr, seed=0):
    """A few harmonics + noise; amplitude-modulated so trim has work to do."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    y = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.25 * np.sin(2 * np.pi * 440 * t + 0.3)
        + 0.05 * rng.standard_normal(n)
    )
    env = np.clip(np.sin(np.pi * np.arange(n) / n), 0, 1)
    return (y * env).astype(np.float32)


# ---------------------------------------------------------------------------
# mel filterbank
# ---------------------------------------------------------------------------


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(SR, 2048, 512)
    assert fb.shape == (512, 1025)
    assert fb.min() >= 0
    # every filter has some mass and mass is concentrated (triangular)
    assert (fb.sum(axis=1) > 0).all()
    # center frequencies increase
    centers = fb.argmax(axis=1)
    assert (np.diff(centers.astype(int)) >= 0).all()


def test_mel_filterbank_slaney_normalization():
    """Slaney norm: filter i scaled by 2/(hz[i+2]-hz[i]) — peak heights fall
    roughly as 1/bandwidth, so low-frequency (narrow) filters peak higher."""
    fb = mel_filterbank(SR, 2048, 128)
    peaks = fb.max(axis=1)
    assert peaks[0] > peaks[-1]


def test_mel_to_linear_matrix_is_regularized_pinv():
    m = mel_filterbank(8000, 256, 40).astype(np.float64)
    inv = mel_to_linear_matrix(8000, 256, 40)
    assert inv.shape == (129, 40)
    # mel of reconstructed mag approximately reproduces mel for smooth spectra
    mag = np.exp(-np.linspace(0, 3, 129))[:, None] * np.ones((129, 4))
    mel = m @ mag
    mag_rec = inv @ mel
    mel_rec = m @ mag_rec
    assert np.abs(mel_rec - mel).max() / mel.max() < 0.35


# ---------------------------------------------------------------------------
# STFT / ISTFT
# ---------------------------------------------------------------------------


def test_stft_np_shapes():
    y = sine_speechish(8000, 8000)
    S = stft_np(y, 256, 64, 192)
    assert S.shape == (129, frame_count(8000, 256, 64))


def test_istft_np_inverts_stft():
    """center-padded STFT -> ISTFT reproduces the interior of the signal."""
    y = sine_speechish(4096, 8000)
    S = stft_np(y, 256, 64, 192)
    y_rec = istft_np(S, 256, 64, 192)
    n = min(len(y), len(y_rec))
    # interior comparison (edges suffer from window normalization)
    sl = slice(256, n - 256)
    err = np.abs(y_rec[sl] - y[sl]).max()
    assert err < 1e-3, err


def test_stft_jax_matches_np():
    y = sine_speechish(4096, 8000)
    S_np = stft_np(y, 256, 64, 192)
    S_jx = np.asarray(stft_jax(jnp.asarray(y), 256, 64, 192))
    np.testing.assert_allclose(np.abs(S_jx), np.abs(S_np), atol=2e-3)
    np.testing.assert_allclose(S_jx.real, S_np.real, atol=2e-3)
    np.testing.assert_allclose(S_jx.imag, S_np.imag, atol=2e-3)


def test_istft_jax_matches_np():
    y = sine_speechish(4096, 8000)
    S = stft_np(y, 256, 64, 192)
    r_np = istft_np(S, 256, 64, 192)
    r_jx = np.asarray(istft_jax(jnp.asarray(S.astype(np.complex64)), 256, 64, 192))
    assert r_jx.shape == r_np.shape
    np.testing.assert_allclose(r_jx, r_np, atol=2e-3)


def test_stft_jax_batched():
    y = np.stack([sine_speechish(2048, 8000, s) for s in range(3)])
    S = np.asarray(stft_jax(jnp.asarray(y), 256, 64, 192))
    for i in range(3):
        Si = stft_np(y[i], 256, 64, 192)
        np.testing.assert_allclose(np.abs(S[i]), np.abs(Si), atol=2e-3)


# ---------------------------------------------------------------------------
# audio utilities
# ---------------------------------------------------------------------------


def test_preemphasis_roundtrip():
    y = sine_speechish(1000, 8000)
    z = deemphasis(preemphasis(y, 0.97), 0.97)
    np.testing.assert_allclose(z, y, atol=1e-4)


def test_trim_silence_removes_padding():
    y = sine_speechish(8000, 8000)
    padded = np.concatenate([np.zeros(4000, np.float32), y, np.zeros(4000, np.float32)])
    trimmed, (s, e) = trim_silence(padded, top_db=30)
    assert s > 2000 and e < len(padded) - 2000
    assert len(trimmed) < len(padded)


def test_wav_io_roundtrip(tmp_path):
    y = sine_speechish(4000, SR)
    p = str(tmp_path / "t.wav")
    save_wav(p, y, SR)
    y2 = load_wav(p, SR)
    np.testing.assert_allclose(y2, y, atol=1e-6)


def test_load_wav_resamples(tmp_path):
    y = sine_speechish(8000, 16000)
    p = str(tmp_path / "t16.wav")
    save_wav(p, y, 16000)
    y24 = load_wav(p, 24000)
    assert abs(len(y24) - 12000) <= 2


# ---------------------------------------------------------------------------
# featurizer
# ---------------------------------------------------------------------------


def test_mel_from_wave_range_and_shape():
    y = preemphasis(sine_speechish(4096, SMALL.sr), SMALL.preemphasis)
    mel, mag = mel_from_wave(y, SMALL)
    assert mel.shape[1] == SMALL.n_mels
    assert mag.shape[1] == 1 + SMALL.n_fft // 2
    assert mel.min() >= 1e-8 and mel.max() <= 1.0


def test_mel_from_wave_jax_matches_np():
    y = preemphasis(sine_speechish(4096, SMALL.sr), SMALL.preemphasis)
    mel_np, mag_np = mel_from_wave(y, SMALL)
    mel_jx, mag_jx = mel_from_wave_jax(jnp.asarray(y), SMALL)
    np.testing.assert_allclose(np.asarray(mel_jx), mel_np, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mag_jx), mag_np, atol=1e-4)


def test_get_spectrograms_from_file(tmp_path):
    y = sine_speechish(SR, SR)  # 1 second
    p = str(tmp_path / "u.wav")
    save_wav(p, y, SR)
    mel, mag = get_spectrograms(p)
    assert mel.shape[1] == 512 and mag.shape[1] == 1025
    assert mel.dtype == np.float32
    # ~1s at hop 300 => ~80 frames
    assert 50 < mel.shape[0] < 110


# ---------------------------------------------------------------------------
# Griffin-Lim vocoder
# ---------------------------------------------------------------------------


def _spectral_convergence(mag_ref, wav, cfg):
    est = np.abs(stft_np(wav, cfg.n_fft, cfg.hop_length, cfg.win_length))
    t = min(est.shape[1], mag_ref.shape[1])
    num = np.linalg.norm(est[:, :t] - mag_ref[:, :t])
    return num / (np.linalg.norm(mag_ref[:, :t]) + 1e-9)


def test_griffin_lim_np_reduces_spectral_error():
    y = sine_speechish(4096, SMALL.sr)
    mag = np.abs(stft_np(y, SMALL.n_fft, SMALL.hop_length, SMALL.win_length))
    w1 = griffin_lim_np(mag, SMALL, n_iter=1)
    w30 = griffin_lim_np(mag, SMALL, n_iter=30)
    assert _spectral_convergence(mag, w30, SMALL) < _spectral_convergence(mag, w1, SMALL)
    assert _spectral_convergence(mag, w30, SMALL) < 0.2


def test_griffin_lim_jax_matches_np():
    y = sine_speechish(4096, SMALL.sr)
    mag = np.abs(stft_np(y, SMALL.n_fft, SMALL.hop_length, SMALL.win_length)).astype(
        np.float32
    )
    w_np = griffin_lim_np(mag, SMALL, n_iter=4)
    w_jx = np.asarray(griffin_lim_jax(jnp.asarray(mag), SMALL, n_iter=4))
    assert w_jx.shape == w_np.shape
    # iterative FFT accumulates small float32 diffs; compare spectrally
    sc_np = _spectral_convergence(mag, w_np, SMALL)
    sc_jx = _spectral_convergence(mag, w_jx.astype(np.float64), SMALL)
    assert abs(sc_np - sc_jx) < 0.02


def test_griffin_lim_jax_batched():
    mags = []
    for s in range(2):
        y = sine_speechish(2048, SMALL.sr, s)
        mags.append(
            np.abs(stft_np(y, SMALL.n_fft, SMALL.hop_length, SMALL.win_length))
        )
    mag_b = np.stack(mags).astype(np.float32)
    w = np.asarray(griffin_lim_jax(jnp.asarray(mag_b), SMALL, n_iter=3))
    assert w.shape[0] == 2
    for i in range(2):
        wi = np.asarray(
            griffin_lim_jax(jnp.asarray(mag_b[i]), SMALL, n_iter=3)
        )
        np.testing.assert_allclose(w[i], wi, atol=1e-4)


def test_melspectrogram2wav_end_to_end():
    """wav -> mel -> Griffin-Lim wav round trip preserves rough energy
    profile (the full reference vocoder chain, small config)."""
    y = preemphasis(sine_speechish(4096, SMALL.sr), SMALL.preemphasis)
    mel, _ = mel_from_wave(y, SMALL)
    wav = melspectrogram2wav(mel, SMALL)
    assert wav.dtype == np.float32
    assert len(wav) > 1000
    assert np.isfinite(wav).all()


# ---------------------------------------------------------------------------
# Pinned Griffin-Lim quality metric (the BASELINE.md "GL tolerance", as a
# number): spectral convergence SC = |||STFT(wav)| - mag||_F / ||mag||_F
# after the reference's full 100 iterations at the FULL signal config
# (n_fft 2048, hop 300, win 1200; reference hyperparams.py:23-31).
# Measured on this host: direct-magnitude SC = 0.0494, mel-pinv SC = 0.1416
# (the mel path is worse because the 512->1025 pseudo-inverse magnitude is
# not exactly realizable). Thresholds below carry ~40% headroom.
# ---------------------------------------------------------------------------

FULL = SignalConfig()


def _sc(mag_ref, wav, cfg):
    est = np.abs(stft_np(wav, cfg.n_fft, cfg.hop_length, cfg.win_length))
    t = min(est.shape[1], mag_ref.shape[1])
    num = np.linalg.norm(est[:, :t] - mag_ref[:, :t])
    return num / (np.linalg.norm(mag_ref[:, :t]) + 1e-9)


def _full_cfg_wave(n=12000):
    rng = np.random.default_rng(0)
    t = np.arange(n) / FULL.sr
    y = (
        0.4 * np.sin(2 * np.pi * 180 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
        + 0.2 * np.sin(2 * np.pi * 460 * t)
        + 0.01 * rng.standard_normal(n)
    )
    return y.astype(np.float32)


def test_griffin_lim_quality_pinned_full_config_np():
    y = _full_cfg_wave()
    mag = np.abs(
        stft_np(y, FULL.n_fft, FULL.hop_length, FULL.win_length)
    ).astype(np.float32)
    assert _sc(mag, griffin_lim_np(mag, FULL, n_iter=100), FULL) < 0.08
    mel, _ = mel_from_wave(y, FULL)
    mag_m = mel_to_mag(mel, FULL).astype(np.float32)
    assert _sc(mag_m, griffin_lim_np(mag_m, FULL, n_iter=100), FULL) < 0.20


def test_griffin_lim_quality_pinned_full_config_jax():
    """The TPU serving path must meet the same pinned SC bound, and agree
    with the numpy oracle's SC within 0.02 at 100 iterations."""
    y = _full_cfg_wave()
    mag = np.abs(
        stft_np(y, FULL.n_fft, FULL.hop_length, FULL.win_length)
    ).astype(np.float32)
    w_np = griffin_lim_np(mag, FULL, n_iter=100)
    w_jx = np.asarray(griffin_lim_jax(jnp.asarray(mag), FULL, n_iter=100))
    sc_np = _sc(mag, w_np, FULL)
    sc_jx = _sc(mag, w_jx.astype(np.float64), FULL)
    assert sc_jx < 0.08
    assert abs(sc_np - sc_jx) < 0.02


def test_deemphasis_jax_matches_lfilter():
    """On-device truncated-FIR de-preemphasis vs the scipy IIR oracle
    (reference: utils.py:106), including batch + causality-under-padding."""
    import jax.numpy as jnp

    from adaptive_voice_conversion_tpu.dsp.audio import (
        deemphasis,
        deemphasis_jax,
    )

    rng = np.random.default_rng(0)
    y = rng.standard_normal(24000).astype(np.float32) * 0.3
    ref = deemphasis(y, 0.97)
    ours = np.asarray(deemphasis_jax(y, 0.97))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(ref - ours)) < 2e-5 * scale

    # batched, and a zero-padded tail must not change the kept prefix
    yb = np.stack([y, np.pad(y[:20000], (0, 4000))])
    outb = np.asarray(deemphasis_jax(yb, 0.97))
    np.testing.assert_allclose(outb[0], ours, rtol=0, atol=1e-6)
    np.testing.assert_allclose(
        outb[1][:20000],
        np.asarray(deemphasis_jax(y[:20000], 0.97)),
        rtol=0,
        atol=1e-6,
    )
