"""AdaIN-VC modules as pure functions over param pytrees.

Re-designs the three live modules of the reference (model.py:209-371) —
SpeakerEncoder, ContentEncoder, Decoder — as init/apply pairs on
channels-last (B, T, C) activations. Parameters are plain nested dicts
(easy to shard, checkpoint, and convert from the PyTorch state_dict).

Weight layouts: conv (K, C_in, C_out); dense (C_in, C_out). Initialization
matches torch's Conv1d/Linear default (kaiming_uniform(a=sqrt(5)) =>
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weights and biases) so training
dynamics are comparable to the reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import ContentEncoderConfig, DecoderConfig, SpeakerEncoderConfig
from ..ops import (
    act_fn,
    adain,
    avg_pool_time_ceil,
    conv1d,
    conv_bank,
    dense,
    global_avg_pool_time,
    instance_norm_time,
    upsample_nearest_time,
    pixel_shuffle_time,
)


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _init_conv(key, k, c_in, c_out):
    kw, kb = jax.random.split(key)
    bound = 1.0 / (c_in * k) ** 0.5
    return {"w": _uniform(kw, (k, c_in, c_out), bound), "b": _uniform(kb, (c_out,), bound)}


def _init_dense(key, c_in, c_out):
    kw, kb = jax.random.split(key)
    bound = 1.0 / c_in**0.5
    return {"w": _uniform(kw, (c_in, c_out), bound), "b": _uniform(kb, (c_out,), bound)}


def _bank_kernel_sizes(cfg) -> list:
    # reference: model.py:223-225 — kernels range(bank_scale, bank_size+1, bank_scale)
    return list(range(cfg.bank_scale, cfg.bank_size + 1, cfg.bank_scale))


def _dropout(x, rate, key, deterministic):
    if deterministic or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _split_or_none(key, n):
    if key is None:
        return [None] * n
    return list(jax.random.split(key, n))


# ---------------------------------------------------------------------------
# SpeakerEncoder (reference: model.py:209-277)
# ---------------------------------------------------------------------------


def init_speaker_encoder(key, cfg: SpeakerEncoderConfig) -> dict:
    ks = _bank_kernel_sizes(cfg)
    keys = jax.random.split(key, len(ks) + 2 + 2 * cfg.n_conv_blocks + 2 * cfg.n_dense_blocks + 1)
    it = iter(keys)
    bank = [_init_conv(next(it), k, cfg.c_in, cfg.c_bank) for k in ks]
    in_channels = cfg.c_bank * len(ks) + cfg.c_in
    params = {
        "conv_bank": bank,
        "in_conv": _init_conv(next(it), 1, in_channels, cfg.c_h),
        "conv_blocks": [
            {
                "first": _init_conv(next(it), cfg.kernel_size, cfg.c_h, cfg.c_h),
                "second": _init_conv(next(it), cfg.kernel_size, cfg.c_h, cfg.c_h),
            }
            for _ in range(cfg.n_conv_blocks)
        ],
        "dense_blocks": [
            {
                "first": _init_dense(next(it), cfg.c_h, cfg.c_h),
                "second": _init_dense(next(it), cfg.c_h, cfg.c_h),
            }
            for _ in range(cfg.n_dense_blocks)
        ],
        "output": _init_dense(next(it), cfg.c_h, cfg.c_out),
    }
    return params


def speaker_encoder_apply(
    params: dict,
    cfg: SpeakerEncoderConfig,
    x: jnp.ndarray,
    *,
    dropout_key=None,
    deterministic: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
    bank_out: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x: (B, T, c_in) -> speaker embedding (B, c_out).

    ``bank_out``: optionally precomputed conv-bank output (e.g. from
    ops/conv.py ``dual_conv_bank``); when given the bank here is
    skipped."""
    act = act_fn(cfg.act)
    ks = _bank_kernel_sizes(cfg)
    dkeys = _split_or_none(dropout_key, 4 * cfg.n_conv_blocks)  # 2 per block used
    rate = cfg.dropout_rate

    out = bank_out if bank_out is not None else conv_bank(
        x,
        [p["w"] for p in params["conv_bank"]],
        [p["b"] for p in params["conv_bank"]],
        ks,
        act,
        compute_dtype=compute_dtype,
    )
    # NOTE ops/conv.py conv_bank_in (concat-free fused bank + split 1x1)
    # wins in isolation (1.98 vs 2.32 ms fwd+bwd) but measured SLOWER in
    # the full train step (5.52 vs 4.76 ms) — recorded negative result,
    # same lesson as dual_conv_bank: the concat feeds XLA a single fusion
    # root the split partial sums destroy.
    out = act(conv1d(out, **params["in_conv"], compute_dtype=compute_dtype))
    # conv blocks (model.py:237-250): strided second conv, ceil avg-pool residual
    for l in range(cfg.n_conv_blocks):
        sub = cfg.subsample[l]
        y = act(conv1d(out, **params["conv_blocks"][l]["first"], compute_dtype=compute_dtype))
        y = _dropout(y, rate, dkeys[2 * l], deterministic)
        y = act(
            conv1d(y, **params["conv_blocks"][l]["second"], stride=sub, compute_dtype=compute_dtype)
        )
        y = _dropout(y, rate, dkeys[2 * l + 1], deterministic)
        if sub > 1:
            out = avg_pool_time_ceil(out, sub)
        out = y + out
    out = global_avg_pool_time(out)
    # dense blocks (model.py:252-263)
    dkeys2 = _split_or_none(
        None if dropout_key is None else jax.random.fold_in(dropout_key, 1),
        2 * cfg.n_dense_blocks,
    )
    for l in range(cfg.n_dense_blocks):
        y = act(dense(out, **params["dense_blocks"][l]["first"], compute_dtype=compute_dtype))
        y = _dropout(y, rate, dkeys2[2 * l], deterministic)
        y = act(dense(y, **params["dense_blocks"][l]["second"], compute_dtype=compute_dtype))
        y = _dropout(y, rate, dkeys2[2 * l + 1], deterministic)
        out = y + out
    return dense(out, **params["output"], compute_dtype=compute_dtype)


# ---------------------------------------------------------------------------
# ContentEncoder (reference: model.py:279-323)
# ---------------------------------------------------------------------------


def init_content_encoder(key, cfg: ContentEncoderConfig) -> dict:
    ks = _bank_kernel_sizes(cfg)
    keys = jax.random.split(key, len(ks) + 2 + 2 * cfg.n_conv_blocks + 2)
    it = iter(keys)
    bank = [_init_conv(next(it), k, cfg.c_in, cfg.c_bank) for k in ks]
    in_channels = cfg.c_bank * len(ks) + cfg.c_in
    return {
        "conv_bank": bank,
        "in_conv": _init_conv(next(it), 1, in_channels, cfg.c_h),
        "conv_blocks": [
            {
                "first": _init_conv(next(it), cfg.kernel_size, cfg.c_h, cfg.c_h),
                "second": _init_conv(next(it), cfg.kernel_size, cfg.c_h, cfg.c_h),
            }
            for _ in range(cfg.n_conv_blocks)
        ],
        "mean": _init_conv(next(it), 1, cfg.c_h, cfg.c_out),
        "std": _init_conv(next(it), 1, cfg.c_h, cfg.c_out),
    }


def content_encoder_apply(
    params: dict,
    cfg: ContentEncoderConfig,
    x: jnp.ndarray,
    *,
    dropout_key=None,
    deterministic: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
    bank_out: Optional[jnp.ndarray] = None,
):
    """x: (B, T, c_in) -> (mu, log_sigma) each (B, T/prod(subsample), c_out).

    ``bank_out``: precomputed conv-bank output (see speaker_encoder_apply)."""
    act = act_fn(cfg.act)
    ks = _bank_kernel_sizes(cfg)
    rate = cfg.dropout_rate
    dkeys = _split_or_none(dropout_key, 1 + 2 * cfg.n_conv_blocks)

    out = bank_out if bank_out is not None else conv_bank(
        x,
        [p["w"] for p in params["conv_bank"]],
        [p["b"] for p in params["conv_bank"]],
        ks,
        act,
        compute_dtype=compute_dtype,
    )
    # IN at pre-activation on every conv (model.py:301-320).
    # conv_bank_in rejected here too — see speaker_encoder_apply NOTE.
    out = conv1d(out, **params["in_conv"], compute_dtype=compute_dtype)
    out = act(instance_norm_time(out))
    out = _dropout(out, rate, dkeys[0], deterministic)
    for l in range(cfg.n_conv_blocks):
        sub = cfg.subsample[l]
        y = conv1d(out, **params["conv_blocks"][l]["first"], compute_dtype=compute_dtype)
        y = act(instance_norm_time(y))
        y = _dropout(y, rate, dkeys[1 + 2 * l], deterministic)
        y = conv1d(
            y, **params["conv_blocks"][l]["second"], stride=sub, compute_dtype=compute_dtype
        )
        y = act(instance_norm_time(y))
        y = _dropout(y, rate, dkeys[2 + 2 * l], deterministic)
        if sub > 1:
            out = avg_pool_time_ceil(out, sub)
        out = y + out
    mu = conv1d(out, **params["mean"], compute_dtype=compute_dtype)
    log_sigma = conv1d(out, **params["std"], compute_dtype=compute_dtype)
    return mu, log_sigma


# ---------------------------------------------------------------------------
# Decoder (reference: model.py:325-371)
# ---------------------------------------------------------------------------


def init_decoder(key, cfg: DecoderConfig) -> dict:
    keys = jax.random.split(key, 2 + 4 * cfg.n_conv_blocks)
    it = iter(keys)
    params = {
        "in_conv": _init_conv(next(it), 1, cfg.c_in, cfg.c_h),
        "conv_blocks": [
            {
                "first": _init_conv(next(it), cfg.kernel_size, cfg.c_h, cfg.c_h),
                "second": _init_conv(
                    next(it), cfg.kernel_size, cfg.c_h, cfg.c_h * cfg.upsample[l]
                ),
                "affine1": _init_dense(next(it), cfg.c_cond, cfg.c_h * 2),
                "affine2": _init_dense(next(it), cfg.c_cond, cfg.c_h * 2),
            }
            for l in range(cfg.n_conv_blocks)
        ],
        "out_conv": _init_conv(next(it), 1, cfg.c_h, cfg.c_out),
    }
    if cfg.sn:
        params = _add_spectral_norm_state(params, key)
    return params


def decoder_apply(
    params: dict,
    cfg: DecoderConfig,
    z: jnp.ndarray,
    cond: jnp.ndarray,
    *,
    dropout_key=None,
    deterministic: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """z: (B, T, c_in), cond: (B, c_cond) -> (B, T*prod(upsample), c_out)."""
    act = act_fn(cfg.act)
    rate = cfg.dropout_rate
    dkeys = _split_or_none(dropout_key, 1 + 2 * cfg.n_conv_blocks)
    get = (lambda p: _sn_params(p)) if cfg.sn else (lambda p: p)

    out = conv1d(z, **get(params["in_conv"]), compute_dtype=compute_dtype)
    out = act(instance_norm_time(out))
    out = _dropout(out, rate, dkeys[0], deterministic)
    for l in range(cfg.n_conv_blocks):
        up = cfg.upsample[l]
        blk = params["conv_blocks"][l]
        y = conv1d(out, **get(blk["first"]), compute_dtype=compute_dtype)
        y = instance_norm_time(y)
        y = adain(y, dense(cond, **get(blk["affine1"]), compute_dtype=compute_dtype))
        y = act(y)
        y = _dropout(y, rate, dkeys[1 + 2 * l], deterministic)
        y = conv1d(y, **get(blk["second"]), compute_dtype=compute_dtype)
        if up > 1:
            y = pixel_shuffle_time(y, up)
        y = instance_norm_time(y)
        y = adain(y, dense(cond, **get(blk["affine2"]), compute_dtype=compute_dtype))
        y = act(y)
        y = _dropout(y, rate, dkeys[2 + 2 * l], deterministic)
        if up > 1:
            out = y + upsample_nearest_time(out, up)
        else:
            out = y + out
    return conv1d(out, **get(params["out_conv"]), compute_dtype=compute_dtype)


# ---------------------------------------------------------------------------
# Spectral norm (decoder sn=True support; reference: model.py:334 wraps conv &
# affine layers in torch spectral_norm). Power-iteration state `u` lives in
# the param tree (non-trainable; update via `spectral_norm_update` each step).
# ---------------------------------------------------------------------------


def _w2d(w: jnp.ndarray) -> jnp.ndarray:
    """Flatten to (out, in*k): torch reshapes weight (O, I, K) to (O, -1).

    Our conv layout is (K, I, O); permute to (O, I, K) first so sigma matches
    torch's spectral_norm exactly.
    """
    if w.ndim == 3:
        return w.transpose(2, 1, 0).reshape(w.shape[2], -1)
    return w.T  # dense (I, O) -> (O, I)


def _add_spectral_norm_state(params: dict, key) -> dict:
    def add_u(p, k):
        wm = _w2d(p["w"])
        u = jax.random.normal(k, (wm.shape[0],), jnp.float32)
        p = dict(p)
        p["u"] = u / (jnp.linalg.norm(u) + 1e-12)
        return p

    out = dict(params)
    out["in_conv"] = add_u(out["in_conv"], jax.random.fold_in(key, 101))
    out["out_conv"] = add_u(out["out_conv"], jax.random.fold_in(key, 102))
    blocks = []
    for l, blk in enumerate(out["conv_blocks"]):
        blk = {
            name: add_u(p, jax.random.fold_in(key, 1000 + 10 * l + i))
            for i, (name, p) in enumerate(blk.items())
        }
        blocks.append(blk)
    out["conv_blocks"] = blocks
    return out


def _sn_params(p: dict) -> dict:
    """Return {'w': w/sigma, 'b': b} using the stored power-iteration vector.

    Matches torch spectral_norm's training forward exactly: one power
    iteration from the stored ``u`` with the ITERATES detached (torch runs
    it under no_grad), then sigma = u'^T W v with gradient flowing through
    W — torch does NOT detach sigma, so d(W/sigma)/dW includes the
    -W (u v^T)/sigma^2 term. Persist the iterated u each training step via
    ``spectral_norm_update`` (train/step.py wires this when cfg.decoder.sn).
    """
    if "u" not in p:
        return p
    wm = _w2d(p["w"]).astype(jnp.float32)
    u = jax.lax.stop_gradient(p["u"])
    v = jax.lax.stop_gradient(wm).T @ u
    v = v / (jnp.linalg.norm(v) + 1e-12)
    u2 = jax.lax.stop_gradient(wm) @ v
    u2 = u2 / (jnp.linalg.norm(u2) + 1e-12)
    sigma = jnp.dot(u2, wm @ v)  # differentiable through wm, like torch
    return {"w": p["w"] / sigma.astype(p["w"].dtype), "b": p["b"]}


def trainable_mask(params):
    """Bool pytree: True for trainable leaves, False for spectral-norm ``u``
    buffers (torch registers u as a BUFFER — the optimizer never sees it;
    optax must likewise skip weight decay / moments for u)."""
    import jax.tree_util as jtu

    def is_u(path) -> bool:
        return any(
            isinstance(k, jtu.DictKey) and k.key == "u" for k in path
        )

    return jtu.tree_map_with_path(lambda path, _: not is_u(path), params)


def spectral_norm_update(params: dict) -> dict:
    """One power-iteration update of every stored `u` (call once per step)."""

    def upd(p):
        if not (isinstance(p, dict) and "u" in p):
            return p
        wm = _w2d(p["w"]).astype(jnp.float32)
        v = wm.T @ p["u"]
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = wm @ v
        p = dict(p)
        p["u"] = u / (jnp.linalg.norm(u) + 1e-12)
        return p

    def walk(node):
        if isinstance(node, dict):
            if "u" in node:
                return upd(node)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)
