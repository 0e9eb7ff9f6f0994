"""Serving benchmark: batched one-shot conversion throughput + quality.

The BASELINE.json serving config: a speakers x contents cross-conversion
grid through one padded model batch + one batched TPU Griffin-Lim call
(infer/inferencer.py convert_grid — length-masked, so mixed-length inputs
convert EXACTLY as one-at-a-time conversion would). Prints one JSON line.

Quality block (round-3 verdict item 9): the grid's converted mels are
compared against the ACTUAL reference implementation
(/root/reference/model.py AE.inference, f32 torch on CPU) running the SAME
weights on the SAME inputs — mel-MAE / max-abs / MCD per the BASELINE.json
"mel MAE" metric. This extends behavioral parity from loss curves to the
served product and is the regression gate for the fast-GL work.

Run separately from bench.py (the driver's canonical metric is training
throughput); both share the one-chip TPU.
"""

import json
import time

import numpy as np


def mcd_db(mel_a_norm: np.ndarray, mel_b_norm: np.ndarray, max_db: float,
           n_coeff: int = 13) -> float:
    """Mel-cepstral distortion (dB) between two normalized log-mels (T, M).

    Standard MCD: 10/ln10 * sqrt(2 * sum_{d=1..n_coeff} (c_d - c'_d)^2)
    averaged over frames, with cepstra from the dB mel via DCT-II.
    """
    from scipy.fftpack import dct

    a_db = mel_a_norm * max_db  # affine offsets cancel in the difference
    b_db = mel_b_norm * max_db
    ca = dct(a_db, type=2, axis=1, norm="ortho")[:, 1 : 1 + n_coeff]
    cb = dct(b_db, type=2, axis=1, norm="ortho")[:, 1 : 1 + n_coeff]
    t = min(ca.shape[0], cb.shape[0])
    d = ca[:t] - cb[:t]
    return float(
        np.mean(10.0 / np.log(10.0) * np.sqrt(2.0 * np.sum(d * d, axis=1)))
    )


def main(argv=None) -> None:
    import argparse
    import os

    import jax
    import torch

    from adaptive_voice_conversion_tpu.core.config import config_from_dict
    from adaptive_voice_conversion_tpu.infer.inferencer import Inferencer
    from adaptive_voice_conversion_tpu.models.reference_oracle import (
        build_reference_ae,
    )
    from adaptive_voice_conversion_tpu.models.torch_import import (
        torch_state_dict_to_params,
    )

    ap = argparse.ArgumentParser()
    default_ckpt = "tests/golden/trained_reference.ckpt"
    ap.add_argument(
        "--ckpt",
        default=default_ckpt if os.path.exists(default_ckpt) else None,
        help="torch state_dict for the served weights. Default: the "
        "TRAINED reference fixture (tools/train_reference_weights.py) when "
        "present, so the quality block measures a model that actually "
        "converts; falls back to the seeded reference init.",
    )
    args = ap.parse_args(argv)

    # The grid serves the reference's own architecture with shared weights
    ae, raw = build_reference_ae(seed=7, ckpt_path=args.ckpt)
    cfg = config_from_dict(raw)
    params = torch_state_dict_to_params(ae.state_dict(), cfg.model)

    rng = np.random.default_rng(0)
    attr = {
        "mean": np.zeros(512, np.float32),
        "std": np.ones(512, np.float32),
    }
    import pickle, tempfile

    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        pickle.dump(attr, f)
        attr_path = f.name
    inf = Inferencer(cfg, params, attr_path)

    # 4 sources x 8 targets, MIXED lengths (the masked serving path makes
    # mixed-length grids exact; uniform-length grids are not a special case
    # any more) — sources ~1.2-1.6 s, targets ~1.2-1.7 s
    n_src, n_tgt = 4, 8
    src_lens = [128, 117, 128, 99]
    srcs = [
        rng.standard_normal((L, 512)).astype(np.float32) for L in src_lens
    ]
    tgts = [
        rng.standard_normal((96 + 8 * i, 512)).astype(np.float32)
        for i in range(n_tgt)
    ]

    # warmup/compile + quality capture
    wavs, mels = inf.convert_grid(srcs, tgts, return_mels=True)
    n_conv = len(wavs)

    # ---- quality vs the actual reference code, f32 torch CPU ----
    ref_mels = []
    for i, s in enumerate(srcs):
        st = torch.from_numpy(s.T[None])  # (1, 512, T)
        for j, t in enumerate(tgts):
            tt = torch.from_numpy(t.T[None])
            with torch.no_grad():
                ref_mels.append(ae.inference(st, tt)[0].numpy().T)  # (T',512)

    def quality_vs_ref(got_mels):
        mae, maxabs, mcds = [], [], []
        for got, ref in zip(got_mels, ref_mels):
            assert got.shape == ref.shape, (got.shape, ref.shape)
            d = np.abs(got - ref)
            mae.append(float(d.mean()))
            maxabs.append(float(d.max()))
            mcds.append(mcd_db(got, ref, cfg.signal.max_db))
        return {
            "mel_mae": round(float(np.mean(mae)), 6),
            "mel_mae_db": round(float(np.mean(mae)) * cfg.signal.max_db, 3),
            "mel_mae_worst_pair": round(float(np.max(mae)), 6),
            "mel_max_abs": round(float(np.max(maxabs)), 6),
            "mcd_db": round(float(np.mean(mcds)), 4),
        }

    quality = {
        "vs": "reference model.py AE.inference, f32 torch CPU, same weights",
        "weights": args.ckpt or "reference-default-init(seed=7)",
        **quality_vs_ref(mels),
        "grid_lengths": {"src": src_lens, "tgt": [t.shape[0] for t in tgts]},
        "note": "TPU default f32 matmuls use bf16 MXU passes; this block "
        "quantifies the served product's total deviation (model precision "
        "+ masked batching) from the f32 reference conversion",
    }

    # median-of-N with spread: the axon-tunnel D2H rate varies ~2x between
    # runs (round 2 recorded 22.3 then 13.1 conv/s 40 min apart); with
    # de-preemphasis on device and one bulk D2H the tunnel exposure is one
    # transfer, and the median over >=5 trials is the reported figure
    reps = 7
    times = []
    for _ in range(reps):
        t0 = time.time()
        wavs = inf.convert_grid(srcs, tgts)
        times.append(time.time() - t0)
    times = np.asarray(times)
    dt = float(np.median(times))

    # ---- compute-only figures (scalar-element sync, no bulk D2H) ----
    # The end-to-end numbers above include shipping every wav through the
    # axon tunnel (22-400 MB/s depending on the hour — a 4.9 MB wav batch
    # is 12-220 ms of pure transfer); production hosts reach the chip over
    # PCIe (>=10 GB/s, ~0.5 ms). d2h_wav_ms quantifies today's tunnel so
    # the compute figure is comparable across rounds.
    import jax.numpy as jnp

    sub = int(np.prod(cfg.model.content_encoder.subsample))
    ts = -(-max(src_lens) // sub) * sub
    tt_len = max(t.shape[0] for t in tgts)
    src_b = jnp.repeat(
        jnp.asarray(
            np.stack([np.pad(s, ((0, ts - s.shape[0]), (0, 0))) for s in srcs])
        ),
        n_tgt, axis=0,
    )
    tar_b = jnp.tile(
        jnp.asarray(
            np.stack(
                [np.pad(t, ((0, tt_len - t.shape[0]), (0, 0))) for t in tgts]
            )
        ),
        (n_src, 1, 1),
    )
    sl_b = jnp.repeat(jnp.asarray(np.array(src_lens, np.int32)), n_tgt)
    tl_b = jnp.tile(
        jnp.asarray(np.array([t.shape[0] for t in tgts], np.int32)), (n_src,)
    )

    # One synchronized call through the axon tunnel costs a ~30 ms round
    # trip REGARDLESS of compute (measured below); a timed region with one
    # dispatch per sync would fold that into "compute". Each timed sample
    # therefore queues INNER_CHAIN async dispatches and syncs once — the
    # RTT amortizes to ~30/INNER_CHAIN ms and the measured rate approaches
    # true device throughput (production PCIe hosts have ~0 RTT, so the
    # quoted compute-only figures remain lower bounds there).
    INNER_CHAIN = 5
    _rtt_probe = jax.jit(lambda x: x + 1.0)
    np.asarray(_rtt_probe(jnp.zeros((8,)))[0])
    _rtt_ts = []
    for _ in range(11):
        t0 = time.time()
        np.asarray(_rtt_probe(jnp.zeros((8,)))[0])
        _rtt_ts.append(time.time() - t0)
    dispatch_rtt_ms = float(np.median(_rtt_ts) * 1e3)

    def compute_only(gl_method, engine=None):
        engine = engine or inf
        vocode = engine._jit_vocode[(gl_method or engine.gl_method, None, False)]
        dec, dec_lens = engine._jit_inference_masked(
            engine.params, src_b, sl_b, tar_b, tl_b
        )
        w = vocode(dec, dec_lens)
        np.asarray(w[0, 0])  # scalar sync
        ts_ = []
        for _ in range(reps):
            t0 = time.time()
            for _ in range(INNER_CHAIN):
                dec, dec_lens = engine._jit_inference_masked(
                    engine.params, src_b, sl_b, tar_b, tl_b
                )
                w = vocode(dec, dec_lens)
            np.asarray(w[0, 0])
            ts_.append((time.time() - t0) / INNER_CHAIN)
        full = vocode(dec, dec_lens)
        t0 = time.time()
        np.asarray(full)
        return float(np.median(ts_)), float(time.time() - t0)

    dt_c, d2h_s = compute_only(None)
    compute = {
        "conversions_per_sec_compute_only": round(n_conv / dt_c, 2),
        "d2h_wav_ms": round(d2h_s * 1e3, 1),
        "dispatch_rtt_ms": round(dispatch_rtt_ms, 1),
        "timing": f"{INNER_CHAIN} chained async dispatches per sync — the "
        "~30 ms tunnel round trip amortizes out of the timed region "
        "(rounds <=5 paid one full RTT per iteration, understating the "
        "fast modes)",
    }

    # fast vocoder: fused Pallas GL kernel (hybrid schedule — spectral
    # convergence at or below the exact path's, KERNELS_r04.json)
    _, mels_p = inf.convert_grid(
        srcs, tgts, gl_method="pallas", return_mels=True
    )  # compile
    times_p = []
    for _ in range(reps):
        t0 = time.time()
        _ = inf.convert_grid(srcs, tgts, gl_method="pallas")
        times_p.append(time.time() - t0)
    dt_p = float(np.median(times_p))
    dt_pc, _ = compute_only("pallas")
    compute["pallas_gl_conversions_per_sec_compute_only"] = round(
        n_conv / dt_pc, 2
    )

    # ---- serving precision knob (round-4 verdict item 3): the same grid
    # through Inferencer(precision="highest") — full-f32 matmul/conv
    # results (TPU multi-pass emulation), the like-for-like quality point
    # vs the reference's implicit f32 serving. Reports BOTH the measured
    # cost and the bought quality so the README can state the tradeoff.
    inf_hi = Inferencer(cfg, params, attr_path, precision="highest")
    _, mels_hi = inf_hi.convert_grid(srcs, tgts, return_mels=True)  # compile
    dt_hc, _ = compute_only(None, inf_hi)
    times_hi = []
    for _ in range(reps):
        t0 = time.time()
        _ = inf_hi.convert_grid(srcs, tgts)
        times_hi.append(time.time() - t0)
    precision_highest = {
        "conversions_per_sec": round(n_conv / float(np.median(times_hi)), 2),
        "conversions_per_sec_compute_only": round(n_conv / dt_hc, 2),
        "cost_vs_default_compute_only": round(dt_hc / dt_c, 2),
        "quality": quality_vs_ref(mels_hi),
    }

    # ---- production-scale grid: 8x16 = 128 mixed-length pairs ----
    # Larger grids amortize per-call fixed cost and fill the MXU better;
    # this block records the conv/s scaling headroom AND where the
    # precision="highest" cost starts to appear once the batch is big
    # enough for matmul pass count to matter.
    n_src_l, n_tgt_l = 8, 16
    src_l = [
        rng.standard_normal((96 + 5 * i, 512)).astype(np.float32)
        for i in range(n_src_l)
    ]
    tgt_l = [
        rng.standard_normal((88 + 4 * i, 512)).astype(np.float32)
        for i in range(n_tgt_l)
    ]
    sub_l = int(np.prod(cfg.model.content_encoder.subsample))
    sl_list = [m.shape[0] for m in src_l]
    tl_list = [m.shape[0] for m in tgt_l]
    ts_l = -(-max(sl_list) // sub_l) * sub_l
    tt_l = max(tl_list)
    src_bl = jnp.repeat(
        jnp.asarray(np.stack(
            [np.pad(s, ((0, ts_l - s.shape[0]), (0, 0))) for s in src_l]
        )), n_tgt_l, axis=0,
    )
    tar_bl = jnp.tile(
        jnp.asarray(np.stack(
            [np.pad(t, ((0, tt_l - t.shape[0]), (0, 0))) for t in tgt_l]
        )), (n_src_l, 1, 1),
    )
    sl_bl = jnp.repeat(jnp.asarray(np.array(sl_list, np.int32)), n_tgt_l)
    tl_bl = jnp.tile(jnp.asarray(np.array(tl_list, np.int32)), (n_src_l,))
    n_conv_l = n_src_l * n_tgt_l

    def compute_only_large(engine, gl_method):
        engine.convert_grid(src_l[:1], tgt_l[:1])  # ensure programs exist
        vocode = engine._get_vocode(gl_method or engine.gl_method, None, False)
        mfn = engine._get_masked_jit()
        dec, dec_lens = mfn(engine.params, src_bl, sl_bl, tar_bl, tl_bl)
        w = vocode(dec, dec_lens)
        np.asarray(w[0, 0])
        ts_ = []
        for _ in range(reps):
            t0 = time.time()
            for _ in range(INNER_CHAIN):
                dec, dec_lens = mfn(
                    engine.params, src_bl, sl_bl, tar_bl, tl_bl
                )
                w = vocode(dec, dec_lens)
            np.asarray(w[0, 0])
            ts_.append((time.time() - t0) / INNER_CHAIN)
        return float(np.median(ts_))

    dt_l = compute_only_large(inf, None)
    dt_l_pallas = compute_only_large(inf, "pallas")
    dt_l_hi = compute_only_large(inf_hi, None)
    large_grid = {
        "grid": f"{n_src_l}x{n_tgt_l} mixed-len ({n_conv_l} pairs)",
        "conversions_per_sec_compute_only": round(n_conv_l / dt_l, 2),
        "pallas_gl_conversions_per_sec_compute_only": round(
            n_conv_l / dt_l_pallas, 2
        ),
        "precision_highest_conversions_per_sec_compute_only": round(
            n_conv_l / dt_l_hi, 2
        ),
        "highest_cost_vs_default": round(dt_l_hi / dt_l, 3),
        "scaling_vs_32pair_grid": round((n_conv_l / dt_l) / (n_conv / dt_c), 2),
    }

    # ---- uniform grid (round-3-comparable): all sources/targets seg-128;
    # convert_grid auto-specializes to the unmasked model + plain GL,
    # which are per-sample-exact when padding is empty ----
    u_srcs = [
        rng.standard_normal((128, 512)).astype(np.float32) for _ in range(4)
    ]
    u_tgts = [
        rng.standard_normal((128, 512)).astype(np.float32) for _ in range(8)
    ]
    _ = inf.convert_grid(u_srcs, u_tgts)  # compile
    tu = []
    for _ in range(reps):
        t0 = time.time()
        _ = inf.convert_grid(u_srcs, u_tgts)
        tu.append(time.time() - t0)
    uniform = {
        "conversions_per_sec": round(n_conv / float(np.median(tu)), 2),
        "grid": "4x8 all-seg-128 (auto-specialized unmasked fast path)",
    }
    audio_s = sum(L - 1 for L in src_lens) * n_tgt * cfg.signal.hop_length / cfg.signal.sr
    print(
        json.dumps(
            {
                "metric": "one_shot_conversions_per_sec",
                "value": round(n_conv / dt, 2),
                "unit": "conversions/s",
                # reference-equivalent CPU vocoding on this host: the numpy
                # melspectrogram2wav (identical math to the reference's
                # librosa chain) converts a seg-128 mel in 0.812 s => 1.23
                # conversions/s, ignoring the neural forward entirely
                "vs_baseline": round(n_conv / dt / 1.23, 1),
                "grid": f"{n_src}x{n_tgt} mixed-len gl{cfg.signal.n_iter} "
                "(length-masked exact batching)",
                "audio_s_per_s": round(audio_s / dt, 1),
                "trials": reps,
                "trial_s_min_med_max": [
                    round(float(times.min()), 3),
                    round(dt, 3),
                    round(float(times.max()), 3),
                ],
                "conv_s_iqr": [
                    round(n_conv / float(np.percentile(times, 75)), 2),
                    round(n_conv / float(np.percentile(times, 25)), 2),
                ],
                "pallas_gl_conversions_per_sec": round(n_conv / dt_p, 2),
                "pallas_gl_speedup": round(dt / dt_p, 2),
                "compute_only": compute,
                "precision_highest": precision_highest,
                "large_grid": large_grid,
                "uniform_grid": uniform,
                "quality": quality,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
