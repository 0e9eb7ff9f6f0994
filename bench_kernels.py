"""Kernel benchmark: Pallas fused STFT-mel vs the XLA rfft featurizer.

Runs BOTH implementations compiled on the current backend (the real chip
under axon; CPU if no TPU) over identical inputs, verifies they agree,
and prints one JSON line with throughputs + speedup. The driver-style
artifact is also written to KERNELS_r02.json when --out is given.

Two measurements:
  1. frames-level: stft_mel_pallas vs the equivalent XLA ops on
     pre-framed input — isolates the fused kernel from framing/padding.
  2. end-to-end: mel_from_wave_pallas vs mel_from_wave_jax on a raw wave
     (what tools/etl.py --tpu actually calls).

Reference chain being computed: preprocess/tacotron/utils.py:62-80.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

WARMUP = 3
ITERS = 20


def _note(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def _time(fn, *args) -> float:
    import jax

    for _ in range(WARMUP):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # host fetch (axon-safe)
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / ITERS


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=None, help="also write JSON here")
    parser.add_argument("--seconds", type=float, default=60.0,
                        help="length of the benchmark wave in audio-seconds")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from adaptive_voice_conversion_tpu.core.config import SignalConfig
    from adaptive_voice_conversion_tpu.dsp.features import mel_from_wave_jax
    from adaptive_voice_conversion_tpu.dsp.mel import mel_filterbank
    from adaptive_voice_conversion_tpu.dsp.stft import frame_signal_jax
    from adaptive_voice_conversion_tpu.kernels.stft_mel import (
        FRAME_BLOCK,
        mel_from_wave_pallas,
        stft_mel_pallas,
    )

    cfg = SignalConfig()
    backend = jax.default_backend()
    interpret = backend != "tpu"
    n_samples = int(args.seconds * cfg.sr)
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal(n_samples).astype(np.float32))

    # ---- frames-level: isolate the fused kernel ----
    frames_raw = frame_signal_jax(wave, cfg.n_fft, cfg.hop_length)
    t = frames_raw.shape[0]
    t_pad = -(-t // FRAME_BLOCK) * FRAME_BLOCK
    frames = jnp.pad(frames_raw, ((0, t_pad - t), (0, 0)))

    pallas_frames = jax.jit(
        lambda f: stft_mel_pallas(f, cfg, interpret=interpret)
    )

    mel_basis = jnp.asarray(mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels))
    from adaptive_voice_conversion_tpu.dsp.stft import hann_window

    win = jnp.asarray(hann_window(cfg.win_length, cfg.n_fft))

    @jax.jit
    def xla_frames(f):
        spec = jnp.fft.rfft(f * win[None, :], n=cfg.n_fft, axis=-1)
        mag = jnp.abs(spec)  # (T, n_freq)
        mel = mag @ mel_basis.T
        mel = 20.0 * jnp.log10(jnp.maximum(1e-5, mel))
        return jnp.clip((mel - cfg.ref_db + cfg.max_db) / cfg.max_db, 1e-8, 1.0)

    _note(f"backend={backend} n_frames={t} compiling pallas frames kernel...")
    mel_p = np.asarray(pallas_frames(frames))[:t]
    _note("pallas frames kernel compiled+ran; compiling xla rfft...")
    mel_x = np.asarray(xla_frames(frames))[:t]
    frames_max_abs = float(np.max(np.abs(mel_p - mel_x)))
    _note(f"frames-level max_abs_diff={frames_max_abs:.2e}; timing...")

    dt_pallas_frames = _time(pallas_frames, frames)
    _note(f"pallas frames {dt_pallas_frames*1e3:.2f} ms")
    dt_xla_frames = _time(xla_frames, frames)
    _note(f"xla frames {dt_xla_frames*1e3:.2f} ms")

    # ---- end-to-end wave->mel (the tools/etl.py --tpu call) ----
    e2e_pallas = jax.jit(
        lambda y: mel_from_wave_pallas(y, cfg, interpret=interpret)
    )
    e2e_xla = jax.jit(lambda y: mel_from_wave_jax(y, cfg)[0])
    _note("compiling e2e pallas...")
    mel_pe = np.asarray(e2e_pallas(wave))
    _note("compiling e2e xla...")
    mel_xe = np.asarray(e2e_xla(wave))
    e2e_max_abs = float(np.max(np.abs(mel_pe - mel_xe)))
    _note(f"e2e max_abs_diff={e2e_max_abs:.2e}; timing...")

    dt_pallas_e2e = _time(e2e_pallas, wave)
    _note(f"pallas e2e {dt_pallas_e2e*1e3:.2f} ms")
    dt_xla_e2e = _time(e2e_xla, wave)
    _note(f"xla e2e {dt_xla_e2e*1e3:.2f} ms")

    # ---- Griffin-Lim: fused Pallas iteration kernel vs XLA-FFT fori_loop ----
    # (round-2 verdict item 4: measure the deferred kernel, either way)
    from adaptive_voice_conversion_tpu.dsp.stft import stft_np
    from adaptive_voice_conversion_tpu.dsp.vocoder import griffin_lim_jax
    from adaptive_voice_conversion_tpu.kernels.griffin_lim import (
        griffin_lim_pallas,
    )

    gl_b, gl_t = 8, 128  # a serving-grid-shaped batch of seg-128 mags
    tt = np.arange(int(1.6 * cfg.sr)) / cfg.sr
    sig = (
        0.4 * np.sin(2 * np.pi * 220 * tt)
        + 0.3 * np.sin(2 * np.pi * 467 * tt) * np.exp(-tt)
    ).astype(np.float32)
    mag1 = np.abs(
        stft_np(sig, cfg.n_fft, cfg.hop_length, cfg.win_length)
    ).astype(np.float32)[:, :gl_t]
    mags = jnp.asarray(np.stack([mag1 * (1.0 + 0.01 * i) for i in range(gl_b)]))

    def _sc(wav_row):
        est = np.abs(
            stft_np(np.asarray(wav_row), cfg.n_fft, cfg.hop_length,
                    cfg.win_length)
        )
        f = min(est.shape[1], mag1.shape[1])
        return float(
            np.linalg.norm(est[:, :f] - mag1[:, :f]) / np.linalg.norm(mag1[:, :f])
        )

    gl_xla = jax.jit(lambda m: griffin_lim_jax(m, cfg, n_iter=cfg.n_iter))
    gl_pal = jax.jit(
        lambda m: griffin_lim_pallas(m, cfg, n_iter=cfg.n_iter,
                                     interpret=interpret)
    )
    _note("compiling griffin-lim xla...")
    w_x = np.asarray(gl_xla(mags))
    _note("compiling griffin-lim pallas...")
    w_p = np.asarray(gl_pal(mags))
    sc_x, sc_p = _sc(w_x[0]), _sc(w_p[0])
    _note(f"GL quality (SC, lower=better): xla={sc_x:.4f} pallas={sc_p:.4f}")
    if interpret:
        # interpret-mode timing is meaningless; record quality only
        dt_gl_xla = dt_gl_pal = float("nan")
    else:
        dt_gl_xla = _time(gl_xla, mags)
        _note(f"griffin-lim xla {dt_gl_xla*1e3:.2f} ms / batch of {gl_b}")
        dt_gl_pal = _time(gl_pal, mags)
        _note(f"griffin-lim pallas {dt_gl_pal*1e3:.2f} ms / batch of {gl_b}")

    audio_s = n_samples / cfg.sr
    out = {
        "metric": "stft_mel_kernel_audio_s_per_s",
        "value": round(audio_s / dt_pallas_e2e, 1),
        "unit": "audio-s/s",
        "backend": backend,
        "interpret": interpret,
        "device": str(jax.devices()[0]),
        "wave_audio_s": audio_s,
        "n_frames": int(t),
        "frames_level": {
            "pallas_ms": round(dt_pallas_frames * 1e3, 3),
            "xla_rfft_ms": round(dt_xla_frames * 1e3, 3),
            "speedup_pallas_over_xla": round(
                dt_xla_frames / dt_pallas_frames, 3
            ),
            "max_abs_diff": frames_max_abs,
        },
        "end_to_end": {
            "pallas_ms": round(dt_pallas_e2e * 1e3, 3),
            "xla_rfft_ms": round(dt_xla_e2e * 1e3, 3),
            "speedup_pallas_over_xla": round(dt_xla_e2e / dt_pallas_e2e, 3),
            "pallas_audio_s_per_s": round(audio_s / dt_pallas_e2e, 1),
            "xla_audio_s_per_s": round(audio_s / dt_xla_e2e, 1),
            "max_abs_diff": e2e_max_abs,
        },
        "griffin_lim": {
            "batch": gl_b,
            "frames": gl_t,
            "n_iter": cfg.n_iter,
            "pallas_ms": round(dt_gl_pal * 1e3, 2),
            "xla_fft_ms": round(dt_gl_xla * 1e3, 2),
            "speedup_pallas_over_xla": round(dt_gl_xla / dt_gl_pal, 3)
            if dt_gl_pal == dt_gl_pal and dt_gl_pal > 0
            else None,
            "spectral_convergence_xla": round(sc_x, 4),
            "spectral_convergence_pallas": round(sc_p, 4),
        },
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
