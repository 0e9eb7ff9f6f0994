"""Pallas kernel tests (interpret mode on CPU; the compiled path is
exercised on TPU by bench/verify runs).

The fused STFT-mel featurizer kernel that lived alongside the Griffin-Lim
kernel was retired in round 5 as a recorded negative (0.92x of the
XLA-rfft path on clean device-resident medians; KERNELS_r05.json,
COMPONENTS.md) — its tests left with it. The ETL featurizer's TPU path
(XLA-rfft) keeps its own host-vs-TPU agreement test below."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from adaptive_voice_conversion_tpu.core.config import SignalConfig
from adaptive_voice_conversion_tpu.dsp import mel_from_wave_jax, preemphasis

CFG = SignalConfig()


def make_wave(n=24000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / CFG.sr
    y = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.01 * rng.standard_normal(n)
    return preemphasis(y.astype(np.float32), CFG.preemphasis)


def test_etl_tpu_path_matches_host():
    """featurize_paths(use_tpu=True) — the XLA-rfft batched featurizer —
    agrees with the host numpy featurizer (the production ETL wiring)."""
    import tempfile, os
    from adaptive_voice_conversion_tpu.tools.etl import featurize_paths
    from adaptive_voice_conversion_tpu.dsp.audio import save_wav

    rng = np.random.default_rng(3)
    t = np.arange(CFG.sr) / CFG.sr
    wav = (0.5 * np.sin(2 * np.pi * 330 * t)
           + 0.02 * rng.standard_normal(CFG.sr)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "a.wav")
        save_wav(p, wav, CFG.sr)
        host = featurize_paths([p], CFG, use_tpu=False)
        tpu = featurize_paths([p], CFG, use_tpu=True)
    assert host["a.wav"].shape == tpu["a.wav"].shape
    np.testing.assert_allclose(tpu["a.wav"], host["a.wav"], atol=5e-4)


def test_griffin_lim_pallas_quality_tracks_xla():
    """Fused GL iteration kernel (interpret mode off-TPU) must converge to
    the same spectral-convergence neighborhood as the exact XLA-FFT path;
    the kernel's interior-band approximation + bf16 MXU may cost a bounded
    SC increase (measured ~0.01-0.03 at 100 iters) but must not diverge."""
    from adaptive_voice_conversion_tpu.dsp.stft import stft_np
    from adaptive_voice_conversion_tpu.dsp.vocoder import griffin_lim_jax
    from adaptive_voice_conversion_tpu.kernels.griffin_lim import (
        griffin_lim_pallas,
    )

    cfg = SignalConfig()
    t = np.arange(int(0.7 * cfg.sr)) / cfg.sr
    y = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 440 * t) * np.exp(-2 * t)
    ).astype(np.float32)
    mag = np.abs(
        stft_np(y, cfg.n_fft, cfg.hop_length, cfg.win_length)
    ).astype(np.float32)

    def sc(wav):
        est = np.abs(
            stft_np(np.asarray(wav), cfg.n_fft, cfg.hop_length, cfg.win_length)
        )
        f = min(est.shape[1], mag.shape[1])
        return float(
            np.linalg.norm(est[:, :f] - mag[:, :f]) / np.linalg.norm(mag[:, :f])
        )

    n_it = 30  # interpret mode: keep CPU cost bounded
    sc_x = sc(griffin_lim_jax(jnp.asarray(mag), cfg, n_iter=n_it))
    w_p = griffin_lim_pallas(jnp.asarray(mag), cfg, n_iter=n_it, interpret=True)
    sc_p = sc(w_p)
    assert np.isfinite(np.asarray(w_p)).all()
    # converged to a real phase estimate, within a bounded gap of exact
    assert sc_p < sc_x + 0.05, (sc_p, sc_x)

    # batched path agrees with single (same mag twice -> identical rows)
    w_b = griffin_lim_pallas(
        jnp.asarray(np.stack([mag, mag])), cfg, n_iter=5, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(w_b[0]), np.asarray(w_b[1]), rtol=0, atol=1e-6
    )


def test_segment_starts_cover_and_overlap():
    """Segmentation geometry: windows cover [0, T), keep-regions partition
    [0, T), and every kept frame is > n_taps from its segment edge."""
    from adaptive_voice_conversion_tpu.kernels.griffin_lim import (
        SEG_FRAMES,
        SEG_OVERLAP,
        _segment_starts,
    )

    for t in (385, 500, 737, 768, 1024, 2000, 5000):
        starts = _segment_starts(t)
        assert starts[0] == 0 and starts[-1] == t - SEG_FRAMES
        assert all(b > a for a, b in zip(starts, starts[1:]))
        # consecutive windows overlap by >= SEG_OVERLAP
        for a, b in zip(starts, starts[1:]):
            assert a + SEG_FRAMES - b >= SEG_OVERLAP
        # keep-regions partition [0, t) and stay away from segment edges
        covered = 0
        for i, s in enumerate(starts):
            lo = 0 if i == 0 else (starts[i - 1] + SEG_FRAMES + s) // 2 - s
            hi = (
                SEG_FRAMES
                if i == len(starts) - 1
                else (s + SEG_FRAMES + starts[i + 1]) // 2 - s
            )
            assert 0 <= lo < hi <= SEG_FRAMES
            if 0 < i:
                assert lo >= SEG_OVERLAP // 2 - 1
            if i < len(starts) - 1:
                assert SEG_FRAMES - hi >= SEG_OVERLAP // 2 - 1
            assert s + lo == covered
            covered = s + hi
        assert covered == t


def test_griffin_lim_pallas_long_input_segments():
    """Utterances beyond the kernel's VMEM frame cap run the segmented
    kernel (round-3 verdict item 2: no fallback, no length cap)."""
    from adaptive_voice_conversion_tpu.dsp.stft import stft_np
    from adaptive_voice_conversion_tpu.dsp.vocoder import griffin_lim_jax
    from adaptive_voice_conversion_tpu.kernels.griffin_lim import (
        MAX_KERNEL_FRAMES,
    )

    cfg = SignalConfig()
    t_frames = MAX_KERNEL_FRAMES + 40
    t = np.arange(cfg.hop_length * (t_frames - 1) + cfg.n_fft) / cfg.sr
    y = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    mag = np.abs(
        stft_np(y, cfg.n_fft, cfg.hop_length, cfg.win_length)
    ).astype(np.float32)[None, :, :t_frames]
    wav = griffin_lim_jax(jnp.asarray(mag), cfg, n_iter=3, method="pallas")
    assert wav.shape == (1, cfg.hop_length * (t_frames - 1))
    assert np.isfinite(np.asarray(wav)).all()

    def sc(w):
        est = np.abs(
            stft_np(np.asarray(w), cfg.n_fft, cfg.hop_length, cfg.win_length)
        )
        f = min(est.shape[1], mag.shape[2])
        return float(
            np.linalg.norm(est[:, :f] - mag[0, :, :f])
            / np.linalg.norm(mag[0, :, :f])
        )

    sc_x = sc(griffin_lim_jax(jnp.asarray(mag), cfg, n_iter=3)[0])
    sc_p = sc(np.asarray(wav)[0])
    assert sc_p < sc_x + 0.05, (sc_p, sc_x)


def test_g2d_exact_recorded_experiment():
    """The aperiodic-edge normalizer (recorded negative result): interior
    rows must equal the hop-periodic gain; edge rows must exceed it (fewer
    overlapping windows -> larger 1/wss)."""
    from adaptive_voice_conversion_tpu.kernels.griffin_lim import (
        _g2d_exact,
        _gl_constants,
    )

    cfg = SignalConfig()
    _, _, _, g_per, off, _ = _gl_constants(
        cfg.n_fft, cfg.win_length, cfg.hop_length
    )
    t = 64
    g2d = _g2d_exact(
        cfg.n_fft, cfg.win_length, cfg.hop_length, t, 128, g_per.shape[0], off
    )
    assert g2d.shape == (128, g_per.shape[0])
    mid = t // 2
    np.testing.assert_allclose(g2d[mid], g_per, rtol=1e-5)
    assert float(g2d[0].max()) > float(g_per.max())


def test_griffin_lim_pallas_schedules_and_warm_start():
    """The hybrid schedule knobs (warm_start, interleaved, polish) all run
    and stay within the exact path's SC neighborhood (interpret mode)."""
    from adaptive_voice_conversion_tpu.dsp.stft import stft_np
    from adaptive_voice_conversion_tpu.dsp.vocoder import griffin_lim_jax
    from adaptive_voice_conversion_tpu.kernels.griffin_lim import (
        griffin_lim_pallas,
    )

    cfg = SignalConfig()
    t = np.arange(int(0.7 * cfg.sr)) / cfg.sr
    y = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    mag = np.abs(
        stft_np(y, cfg.n_fft, cfg.hop_length, cfg.win_length)
    ).astype(np.float32)

    def sc(wav):
        est = np.abs(
            stft_np(np.asarray(wav), cfg.n_fft, cfg.hop_length, cfg.win_length)
        )
        f = min(est.shape[1], mag.shape[1])
        return float(
            np.linalg.norm(est[:, :f] - mag[:, :f]) / np.linalg.norm(mag[:, :f])
        )

    n_it = 12
    sc_x = sc(griffin_lim_jax(jnp.asarray(mag), cfg, n_iter=n_it))
    for kw in (
        dict(warm_start=2, polish_iters=2, ext_frames=4),
        dict(warm_start=0, polish_iters=3, schedule="interleaved"),
        dict(warm_start=0, polish_iters=0, ext_frames=0),
    ):
        w = griffin_lim_pallas(
            jnp.asarray(mag), cfg, n_iter=n_it, interpret=True, **kw
        )
        assert np.isfinite(np.asarray(w)).all()
        assert sc(w) < sc_x + 0.08, (kw, sc(w), sc_x)
