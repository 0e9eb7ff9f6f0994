"""Kernel benchmark: fused Pallas Griffin-Lim vs XLA + the featurizer.

Runs the implementations compiled on the current backend (the real chip
under axon; CPU if no TPU) over identical inputs, verifies they agree,
and prints one JSON line. Driver-style artifact written with --out.

All timings are MEDIAN-of-N trials with IQR (round-3 verdict item 3: the
single-shot numbers of earlier rounds were tunnel-weather-dominated — the
axon host reaches the chip through a network tunnel whose latency varies
22-400 MB/s hour to hour, so each measurement below repeats TRIALS
timed blocks and reports median + IQR, and the kernel-vs-XLA defaults are
decided on the medians).

Measurements:
  1. wave->mel featurizer throughput on the production XLA-rfft path
     (what tools/etl.py --tpu calls). The fused Pallas STFT-mel kernel
     that used to be A/B'd here was RETIRED in round 5 as a recorded
     negative: 0.92x of XLA at frame_block 128 (0.915x at 256) on clean
     device-resident medians, with Mosaic rejecting the 3-pass HIGH dot
     precision that was the remaining lever — KERNELS_r05.json,
     COMPONENTS.md.
  2. Griffin-Lim: the fused VMEM-resident iteration kernel
     (kernels/griffin_lim.py) raw and at its production hybrid defaults
     (warm-start 4 + reflect-ext 6 + end-polish 2) vs the exact XLA-FFT
     fori_loop, with spectral convergence measured both directly and
     through the mel pseudo-inverse chain, plus a long-utterance
     (segmented-kernel, no length cap) section.

Reference chain being computed: preprocess/tacotron/utils.py:62-80 (mel),
:136-155 (Griffin-Lim).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

WARMUP = 3
ITERS = 10
TRIALS = 7


def _note(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def _sync_scalar(out):
    """Force completion by fetching ONE element, not the whole result.

    Fetching the full output through the axon tunnel (22-400 MB/s,
    hour-dependent) would dominate the timed region — a 9.4 MB mel fetch
    is 25-400 ms of pure transfer, which is what polluted the round-3
    kernel numbers (KERNELS_r03 lost ~35% absolute vs round 2 on BOTH
    paths). A scalar element forces the same device-side completion for
    4 bytes on the wire; the one-off full-fetch cost is reported
    separately as ``d2h_fetch_ms``.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def _time(fn, *args) -> dict:
    """Median-of-TRIALS timing: each trial times ITERS dispatches."""
    for _ in range(WARMUP):
        out = fn(*args)
    _sync_scalar(out)
    samples = []
    for _ in range(TRIALS):
        t0 = time.time()
        for _ in range(ITERS):
            out = fn(*args)
        _sync_scalar(out)
        samples.append((time.time() - t0) / ITERS)
    s = np.sort(np.array(samples))
    q1, med, q3 = np.percentile(s, [25, 50, 75])
    # one-off: what a FULL result fetch costs through the tunnel right now
    import jax

    t0 = time.time()
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    fetch = time.time() - t0
    return {
        "ms": float(med * 1e3),
        "iqr_ms": float((q3 - q1) * 1e3),
        "d2h_fetch_ms": float(fetch * 1e3),
    }


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

    cfg = SignalConfig()
    backend = jax.default_backend()
    interpret = backend != "tpu"
    n_samples = int(args.seconds * cfg.sr)
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal(n_samples).astype(np.float32))

    # ---- end-to-end wave->mel (the tools/etl.py --tpu call) ----
    e2e_xla = jax.jit(lambda y: mel_from_wave_jax(y, cfg)[0])
    _note("compiling e2e xla featurizer...")
    mel_xe = np.asarray(e2e_xla(wave))
    t = mel_xe.shape[0]
    tx_e2e = _time(e2e_xla, wave)
    _note(f"xla e2e {tx_e2e}")

    # ---- Griffin-Lim: fused Pallas iteration kernel vs XLA-FFT fori_loop ----
    from adaptive_voice_conversion_tpu.dsp.stft import stft_np
    from adaptive_voice_conversion_tpu.dsp.vocoder import (
        griffin_lim_jax,
        mel_to_mag,
    )
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
    # mel-pinv chain input: featurize -> normalized mel -> pseudo-inverse
    # magnitude (what serving actually vocodes)
    mel_n = (
        20.0 * np.log10(np.maximum(1e-5, mel_filterbank(
            cfg.sr, cfg.n_fft, cfg.n_mels) @ mag1))
    )
    mel_n = np.clip(
        (mel_n - cfg.ref_db + cfg.max_db) / cfg.max_db, 1e-8, 1.0
    ).T.astype(np.float32)  # (T, n_mels) normalized
    mag_pinv = mel_to_mag(mel_n, cfg).astype(np.float32)[:, :gl_t]
    mags_pinv = jnp.asarray(np.stack([mag_pinv] * gl_b))

    def _sc(wav_row, ref):
        est = np.abs(
            stft_np(np.asarray(wav_row), cfg.n_fft, cfg.hop_length,
                    cfg.win_length)
        )
        f = min(est.shape[1], ref.shape[1])
        return float(
            np.linalg.norm(est[:, :f] - ref[:, :f]) / np.linalg.norm(ref[:, :f])
        )

    gl_xla = jax.jit(lambda m: griffin_lim_jax(m, cfg, n_iter=cfg.n_iter))
    gl_variants = {
        # raw fused kernel, no hybrid schedule (the floor)
        "pallas_raw": jax.jit(
            lambda m: griffin_lim_pallas(
                m, cfg, n_iter=cfg.n_iter, interpret=interpret,
                polish_iters=0, warm_start=0, ext_frames=0,
            )
        ),
        # production defaults: warm 4 + reflect-ext 6 + end-polish 2
        "pallas_default": jax.jit(
            lambda m: griffin_lim_pallas(m, cfg, n_iter=cfg.n_iter,
                                         interpret=interpret)
        ),
    }
    _note("compiling griffin-lim xla...")
    w_x = np.asarray(gl_xla(mags))
    w_x_pinv = np.asarray(gl_xla(mags_pinv))
    gl = {
        "batch": gl_b,
        "frames": gl_t,
        "n_iter": cfg.n_iter,
        "xla": {
            "sc_direct": round(_sc(w_x[0], mag1), 4),
            "sc_mel_pinv": round(_sc(w_x_pinv[0], mag1), 4),
        },
    }
    if not interpret:
        gl["xla"].update(_time(gl_xla, mags))
        _note(f"griffin-lim xla {gl['xla']}")
    for name, fn in gl_variants.items():
        _note(f"compiling griffin-lim {name}...")
        w_p = np.asarray(fn(mags))
        w_p_pinv = np.asarray(fn(mags_pinv))
        ent = {
            "sc_direct": round(_sc(w_p[0], mag1), 4),
            "sc_mel_pinv": round(_sc(w_p_pinv[0], mag1), 4),
        }
        if not interpret:
            ent.update(_time(fn, mags))
            ent["speedup_vs_xla"] = round(gl["xla"]["ms"] / ent["ms"], 3)
        gl[name] = ent
        _note(f"griffin-lim {name} {ent}")

    # ---- long-utterance GL: segmented kernel (no frame cap) ----
    long_t = 768  # 9.6 s at hop 300 / 24 kHz — 2x the VMEM frame window
    sig_l = np.concatenate([sig] * 7)[: cfg.hop_length * (long_t - 1) + cfg.n_fft]
    mag_l1 = np.abs(
        stft_np(sig_l, cfg.n_fft, cfg.hop_length, cfg.win_length)
    ).astype(np.float32)[:, :long_t]
    mags_l = jnp.asarray(mag_l1[None])
    gl_long_xla = jax.jit(lambda m: griffin_lim_jax(m, cfg, n_iter=cfg.n_iter))
    gl_long_pal = jax.jit(
        lambda m: griffin_lim_pallas(m, cfg, n_iter=cfg.n_iter,
                                     interpret=interpret)
    )
    _note("compiling long-utterance griffin-lim (xla + segmented pallas)...")
    wl_x = np.asarray(gl_long_xla(mags_l))
    wl_p = np.asarray(gl_long_pal(mags_l))
    gl_long = {
        "frames": long_t,
        "xla_sc": round(_sc(wl_x[0], mag_l1), 4),
        "pallas_default_sc": round(_sc(wl_p[0], mag_l1), 4),
    }
    if not interpret:
        tl_x = _time(gl_long_xla, mags_l)
        tl_p = _time(gl_long_pal, mags_l)
        gl_long["xla_ms"] = tl_x["ms"]
        gl_long["xla_iqr_ms"] = tl_x["iqr_ms"]
        gl_long["pallas_default_ms"] = tl_p["ms"]
        gl_long["pallas_default_iqr_ms"] = tl_p["iqr_ms"]
        gl_long["speedup_vs_xla"] = round(tl_x["ms"] / tl_p["ms"], 3)
    _note(f"griffin-lim long {gl_long}")

    audio_s = n_samples / cfg.sr
    out = {
        "metric": "featurizer_xla_audio_s_per_s",
        "value": round(audio_s / (tx_e2e["ms"] / 1e3), 1),
        "unit": "audio-s/s",
        "backend": backend,
        "interpret": interpret,
        "device": str(jax.devices()[0]),
        "wave_audio_s": audio_s,
        "n_frames": int(t),
        "timing": f"median of {TRIALS} trials x {ITERS} iters, IQR reported",
        "featurizer": {
            "xla_rfft_ms": round(tx_e2e["ms"], 3),
            "xla_rfft_iqr_ms": round(tx_e2e["iqr_ms"], 3),
            "xla_audio_s_per_s": round(audio_s / (tx_e2e["ms"] / 1e3), 1),
            "note": "Pallas STFT-mel kernel retired round 5 "
            "(0.92x of XLA; KERNELS_r05.json)",
        },
        "griffin_lim": gl,
        "griffin_lim_long": gl_long,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
