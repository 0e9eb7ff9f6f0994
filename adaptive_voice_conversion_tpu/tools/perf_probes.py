"""On-chip microprobes behind the training-step optimization work.

Methodology: through the axon tunnel a single jitted call carries
~20-35 ms of dispatch latency, so naive per-call timing measures the
tunnel, not the op. Every probe here wraps its unit in a ``lax.scan`` of
N applications inside ONE jit call (input perturbed per iteration so XLA
cannot fold the loop), amortizing dispatch to noise.

Measured on TPU v5e, B=128 T=128 bf16 (round 2):

  Bank formulations (reference bank: 8x Conv1d(512->128, k=1..8),
  model.py:85-91), per application, forward / forward+backward:
      fused1 (one k=8 conv, all heads)    0.993 ms / 1.894 ms
      sep8   (8 singleton convs)          0.795 ms / 2.332 ms
      pair4  (adjacent pairs)             0.750 ms / 1.707 ms   <- shipped
      quad2  (two groups of 4)            1.159 ms / 1.872 ms
      tri3   (3+3+2)                      1.039 ms / 1.781 ms
  => ops/conv.py conv_bank(group_size=2); full train step 5.68 -> 4.82 ms.

  Step decomposition (per application):
      speaker_encoder fwd 1.369 ms | content_encoder fwd 1.387 ms |
      decoder fwd 0.765 ms | full ae fwd 2.489 ms (XLA overlaps modules) |
      loss fwd 2.472 ms
  => the two conv banks dominate the forward; backward+optimizer is the
     remaining ~2.3 ms of the 4.82 ms step.

  Dispatch pipelining: inner_steps K=10 vs K=50 fused steps per call both
  measure 4.80-4.82 ms/step — the host dispatch loop is fully pipelined
  behind device compute; K=10 loses nothing.

Run:  python -m adaptive_voice_conversion_tpu.tools.perf_probes [bank|parts]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _scan_time(unit, x0, n=50):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(x):
        def body(c, i):
            return c, unit(c + i.astype(jnp.float32) * 1e-6)

        _, s = lax.scan(body, x, jnp.arange(n))
        return s

    out = run(x0)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    out = run(x0)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / n


def probe_bank() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..models.modules import _init_conv
    from ..ops.conv import DIMENSION_NUMBERS, make_fused_bank_weight
    from ..ops.padding import conv_pad_amounts, reflect_pad_time

    B, T, C_IN, C_BANK = 128, 128, 512, 128
    KS = list(range(1, 9))
    DT = jnp.bfloat16
    keys = jax.random.split(jax.random.PRNGKey(0), len(KS))
    bank = [_init_conv(k_, k, C_IN, C_BANK) for k_, k in zip(keys, KS)]
    ws = [p["w"] for p in bank]
    bs = [p["b"] for p in bank]
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, C_IN)).astype(np.float32)
    )
    act = jax.nn.relu

    def grouped(groups):
        def fn(xx):
            outs = []
            for idx in groups:
                g_ks = [KS[i] for i in idx]
                w = make_fused_bank_weight([ws[i] for i in idx], g_ks)
                b = jnp.concatenate([bs[i] for i in idx], axis=0)
                left, right = conv_pad_amounts(max(g_ks))
                xp = reflect_pad_time(xx, left, right).astype(DT)
                o = lax.conv_general_dilated(
                    xp, w.astype(DT), (1,), "VALID",
                    dimension_numbers=DIMENSION_NUMBERS,
                    preferred_element_type=DT,
                )
                outs.append(act(o + b.astype(o.dtype)))
            return jnp.concatenate(outs + [xx.astype(DT)], axis=-1)

        return fn

    variants = {
        "fused1": [tuple(range(8))],
        "sep8": [(i,) for i in range(8)],
        "pair4": [(0, 1), (2, 3), (4, 5), (6, 7)],
        "quad2": [(0, 1, 2, 3), (4, 5, 6, 7)],
        "tri3": [(0, 1, 2), (3, 4, 5), (6, 7)],
    }
    ref = None
    for name, groups in variants.items():
        fn = grouped(groups)
        y = np.asarray(fn(x), np.float32)
        if ref is None:
            ref = y
        else:
            assert np.array_equal(ref, y), f"{name} output differs"
        dt_f = _scan_time(lambda xx: jnp.sum(fn(xx).astype(jnp.float32)), x)
        dt_b = _scan_time(
            lambda xx: jnp.sum(
                jax.grad(lambda d: jnp.sum(fn(d).astype(jnp.float32) ** 2))(xx)
            ),
            x,
        )
        print(f"{name}: fwd {dt_f*1e3:.4f} ms   fwd+bwd {dt_b*1e3:.4f} ms",
              flush=True)


def probe_parts() -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..core.config import TrainConfig
    from ..models import init_ae
    from ..models.ae import ae_forward
    from ..models.modules import (
        content_encoder_apply,
        decoder_apply,
        speaker_encoder_apply,
    )
    from ..train.step import loss_terms

    cfg = dataclasses.replace(TrainConfig(), compute_dtype="bfloat16")
    B, T = 128, 128
    DT = jnp.bfloat16
    params = init_ae(jax.random.PRNGKey(0), cfg.model)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, 512)).astype(np.float32)
    )
    rng = jax.random.PRNGKey(1)
    z = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, T // 8, 128)).astype(np.float32)
    )
    emb = jnp.asarray(
        np.random.default_rng(2).standard_normal((B, 128)).astype(np.float32)
    )

    def f32sum(v):
        return jnp.sum(v.astype(jnp.float32))

    units = {
        "spk_fwd": lambda xx: f32sum(
            speaker_encoder_apply(
                params["speaker_encoder"], cfg.model.speaker_encoder, xx,
                compute_dtype=DT,
            )
        ),
        "cnt_fwd": lambda xx: f32sum(
            content_encoder_apply(
                params["content_encoder"], cfg.model.content_encoder, xx,
                compute_dtype=DT,
            )[0]
        ),
        "dec_fwd": lambda xx: f32sum(
            decoder_apply(
                params["decoder"], cfg.model.decoder,
                z + f32sum(xx) * 0.0, emb, compute_dtype=DT,
            )
        ),
        "ae_fwd": lambda xx: f32sum(
            ae_forward(params, cfg.model, xx, rng, compute_dtype=DT)[3]
        ),
        "loss_fwd": lambda xx: 10.0 * loss_terms(cfg, params, xx, rng)[0]
        + 0.5 * loss_terms(cfg, params, xx, rng)[1],
    }
    for name, u in units.items():
        print(f"{name}: {_scan_time(u, x)*1e3:.4f} ms", flush=True)


def probe_residual() -> None:
    """Residual-conv chain formulations (22.5% of step FLOPs, round-2
    roofline): the content-encoder residual chain is 6 blocks of two k=5
    c_h=128 convs (2nd strided), IN at pre-activation (reference:
    model.py:309-320). Compares lax.conv vs im2col-matmul vs
    sum-of-shifted-matmuls, per application, fwd / fwd+bwd."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..models.modules import _init_conv
    from ..ops.conv import DIMENSION_NUMBERS
    from ..ops.norm import instance_norm_time
    from ..ops.padding import conv_pad_amounts, reflect_pad_time

    B, C = 128, 128
    K = 5
    DT = jnp.bfloat16
    subsample = (1, 2, 1, 2, 1, 2)
    keys = jax.random.split(jax.random.PRNGKey(0), 12)
    convs = [_init_conv(k, K, C, C) for k in keys]
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 128, C)).astype(np.float32)
    )
    act = jax.nn.relu
    left, right = conv_pad_amounts(K)

    def conv_lax(xx, w, b, stride):
        xp = reflect_pad_time(xx, left, right).astype(DT)
        o = lax.conv_general_dilated(
            xp, w.astype(DT), (stride,), "VALID",
            dimension_numbers=DIMENSION_NUMBERS, preferred_element_type=DT,
        )
        return o + b.astype(o.dtype)

    def conv_im2col(xx, w, b, stride):
        xp = reflect_pad_time(xx, left, right).astype(DT)
        T_out = (xp.shape[1] - K) // stride + 1
        cols = jnp.stack(
            [xp[:, j : j + stride * T_out : stride, :] for j in range(K)],
            axis=2,
        )  # (B, T_out, K, C)
        cols = cols.reshape(B, T_out, K * C)
        wm = w.reshape(K * C, C).astype(DT)
        return jnp.dot(cols, wm, preferred_element_type=DT) + b.astype(DT)

    def conv_shifts(xx, w, b, stride):
        xp = reflect_pad_time(xx, left, right).astype(DT)
        T_out = (xp.shape[1] - K) // stride + 1
        o = None
        for j in range(K):
            term = jnp.dot(
                xp[:, j : j + stride * T_out : stride, :],
                w[j].astype(DT),
                preferred_element_type=DT,
            )
            o = term if o is None else o + term
        return o + b.astype(DT)

    def chain(conv):
        def fn(xx):
            out = xx
            for l in range(6):
                sub = subsample[l]
                w1, b1 = convs[2 * l]["w"], convs[2 * l]["b"]
                w2, b2 = convs[2 * l + 1]["w"], convs[2 * l + 1]["b"]
                y = act(instance_norm_time(conv(out, w1, b1, 1)))
                y = act(instance_norm_time(conv(y, w2, b2, sub)))
                if sub > 1:
                    out = out[:, ::2, :] * 0.5 + out[:, 1::2, :] * 0.5
                out = y + out
            return out

        return fn

    variants = {"conv": conv_lax, "im2col": conv_im2col, "shifts": conv_shifts}
    ref = None
    for name, conv in variants.items():
        fn = chain(conv)
        # jit the correctness check: eager mode would remote-compile every
        # op of the 6-block chain separately through the tunnel (minutes)
        y = np.asarray(jax.jit(fn)(x), np.float32)
        if ref is None:
            ref = y
        else:
            d = np.max(np.abs(ref - y))
            print(f"{name}: max|diff| vs conv = {d:.2e}")
        dt_f = _scan_time(lambda xx: jnp.sum(fn(xx).astype(jnp.float32)), x)
        dt_b = _scan_time(
            lambda xx: jnp.sum(
                jax.grad(lambda d_: jnp.sum(fn(d_).astype(jnp.float32) ** 2))(xx)
            ),
            x,
        )
        print(f"{name}: fwd {dt_f*1e3:.4f} ms   fwd+bwd {dt_b*1e3:.4f} ms",
              flush=True)


def probe_bank_split() -> None:
    """Can the (B,T,1536) bank-concat materialization be avoided?

    The round-3 trace shows ~0.08 ms/step of copy + 0.06 ms of concat loop
    fusion around the bank output. The 1x1 in_conv over a concat equals the
    SUM of per-group 1x1 partial products (split weight rows), which never
    materializes the 1536-channel tensor. Compares bank->concat->1x1
    against bank->partial-matmuls->sum, fwd and fwd+bwd, B=128 T=128 bf16.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..models.modules import _init_conv
    from ..ops.conv import (
        DIMENSION_NUMBERS,
        make_fused_bank_weight,
    )
    from ..ops.padding import conv_pad_amounts, reflect_pad_time

    B, T, C_IN, C_BANK, C_H = 128, 128, 512, 128, 128
    KS = list(range(1, 9))
    DT = jnp.bfloat16
    keys = jax.random.split(jax.random.PRNGKey(0), len(KS) + 1)
    bank = [_init_conv(k_, k, C_IN, C_BANK) for k_, k in zip(keys, KS)]
    in_conv = _init_conv(keys[-1], 1, C_BANK * len(KS) + C_IN, C_H)
    w_in = in_conv["w"][0]  # (1536, C_H)
    b_in = in_conv["b"]
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, C_IN)).astype(np.float32)
    )
    act = jax.nn.relu
    groups = [(0, 1), (2, 3), (4, 5), (6, 7)]

    def group_outs(xx):
        outs = []
        for idx in groups:
            g_ks = [KS[i] for i in idx]
            w = make_fused_bank_weight([bank[i]["w"] for i in idx], g_ks)
            b = jnp.concatenate([bank[i]["b"] for i in idx], axis=0)
            left, right = conv_pad_amounts(max(g_ks))
            xp = reflect_pad_time(xx, left, right).astype(DT)
            o = lax.conv_general_dilated(
                xp, w.astype(DT), (1,), "VALID",
                dimension_numbers=DIMENSION_NUMBERS,
                preferred_element_type=DT,
            )
            outs.append(act(o + b.astype(o.dtype)))
        return outs

    def concat_then_1x1(xx):
        outs = group_outs(xx) + [xx.astype(DT)]
        cat = jnp.concatenate(outs, axis=-1)
        return act(
            jnp.dot(cat, w_in.astype(DT), preferred_element_type=DT)
            + b_in.astype(DT)
        )

    def split_partials(xx):
        outs = group_outs(xx)
        acc = None
        off = 0
        for o in outs + [xx.astype(DT)]:
            n = o.shape[-1]
            term = jnp.dot(
                o, w_in[off : off + n].astype(DT),
                preferred_element_type=DT,
            )
            acc = term if acc is None else acc + term
            off += n
        return act(acc + b_in.astype(DT))

    y0 = np.asarray(jax.jit(concat_then_1x1)(x), np.float32)
    y1 = np.asarray(jax.jit(split_partials)(x), np.float32)
    print(f"split vs concat max|diff| = {np.max(np.abs(y0 - y1)):.2e}")
    for name, fn in (("concat+1x1", concat_then_1x1),
                     ("split-partials", split_partials)):
        dt_f = _scan_time(lambda xx: jnp.sum(fn(xx).astype(jnp.float32)), x)
        dt_b = _scan_time(
            lambda xx: jnp.sum(
                jax.grad(lambda d_: jnp.sum(fn(d_).astype(jnp.float32) ** 2))(xx)
            ),
            x,
        )
        print(f"{name}: fwd {dt_f*1e3:.4f} ms   fwd+bwd {dt_b*1e3:.4f} ms",
              flush=True)


def probe_opt() -> None:
    """Full fused multi-step A/B: opt_state_dtype float32 vs bfloat16."""
    import dataclasses
    import time as _time

    import jax
    import jax.numpy as jnp

    from ..core.config import TrainConfig
    from ..data.device_sampler import DeviceResidentDataset
    from ..models import init_ae
    from ..train.step import make_device_data_train_step

    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.standard_normal((40_000, 512)).astype(np.float32),
                         dtype=jnp.bfloat16)
    starts = jnp.asarray(rng.integers(0, 40_000 - 128, size=200_000)
                         .astype(np.int32))
    for sd, fused, unroll in (
        ("float32", False, 1), ("bfloat16", False, 1),
        ("bfloat16", False, 2), ("bfloat16", False, 5),
    ):
        cfg = dataclasses.replace(
            TrainConfig(), compute_dtype="bfloat16", data_dtype="bfloat16",
            opt_state_dtype=sd, opt_fused=fused, inner_steps=10,
        )
        params = init_ae(jax.random.PRNGKey(0), cfg.model)
        init_fn, fn = make_device_data_train_step(
            cfg, None, inner_steps=10, unroll=unroll
        )
        opt_state = init_fn(params)
        key = np.asarray(jax.random.PRNGKey(1))
        p, o, ms = fn(params, opt_state, packed, starts, key, np.int32(0))
        jax.block_until_ready(ms)
        n_calls, it = 30, 10
        t0 = _time.time()
        for c in range(n_calls):
            p, o, ms = fn(p, o, packed, starts, key, np.int32(it))
            it += 10
        jax.block_until_ready(ms)
        dt = (_time.time() - t0) / (n_calls * 10)
        print(
            f"opt_state_dtype={sd} fused={fused} unroll={unroll}: "
            f"{dt*1e3:.3f} ms/step", flush=True,
        )


def probe_profile() -> None:
    """Attempt a real jax.profiler capture of the production multi-step
    (round-2 verdict item 2: trace or a recorded failure)."""
    import dataclasses
    import glob
    import os

    import jax
    import jax.numpy as jnp

    from ..core.config import TrainConfig
    from ..models import init_ae
    from ..train.step import make_device_data_train_step

    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.standard_normal((40_000, 512)).astype(np.float32),
                         dtype=jnp.bfloat16)
    starts = jnp.asarray(rng.integers(0, 40_000 - 128, size=200_000)
                         .astype(np.int32))
    cfg = dataclasses.replace(
        TrainConfig(), compute_dtype="bfloat16", data_dtype="bfloat16",
        inner_steps=10,
    )
    params = init_ae(jax.random.PRNGKey(0), cfg.model)
    init_fn, fn = make_device_data_train_step(cfg, None, inner_steps=10)
    opt_state = init_fn(params)
    key = np.asarray(jax.random.PRNGKey(1))
    p, o, ms = fn(params, opt_state, packed, starts, key, np.int32(0))
    jax.block_until_ready(ms)
    out_dir = "/tmp/avc_profile"
    os.makedirs(out_dir, exist_ok=True)
    try:
        with jax.profiler.trace(out_dir):
            it = 10
            for c in range(5):
                p, o, ms = fn(p, o, packed, starts, key, np.int32(it))
                it += 10
            jax.block_until_ready(ms)
        files = glob.glob(os.path.join(out_dir, "**", "*"), recursive=True)
        files = [f for f in files if os.path.isfile(f)]
        print("trace captured:", flush=True)
        for f in sorted(files):
            print(f"  {os.path.relpath(f, out_dir)}  {os.path.getsize(f)} B",
                  flush=True)
    except Exception as e:  # record the failure — that's a result too
        print(f"trace FAILED: {type(e).__name__}: {e}", flush=True)


def main(argv=None) -> None:
    which = (argv or sys.argv[1:] or ["bank"])[0]
    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    print("devices:", jax.devices(), flush=True)
    if which == "bank":
        probe_bank()
    elif which == "parts":
        probe_parts()
    elif which == "residual":
        probe_residual()
    elif which == "bank_split":
        probe_bank_split()
    elif which == "opt":
        probe_opt()
    elif which == "profile":
        probe_profile()
    else:
        raise SystemExit(
            f"unknown probe {which!r} (bank|parts|residual|bank_split|opt|profile)"
        )


if __name__ == "__main__":
    main()
