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
    else:
        raise SystemExit(f"unknown probe {which!r} (bank|parts)")


if __name__ == "__main__":
    main()
