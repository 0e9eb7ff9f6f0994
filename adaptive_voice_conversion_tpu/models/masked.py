"""Length-masked (ragged-batch) inference applies for the AdaIN-VC modules.

Mirrors the block structure of models/modules.py (reference:
model.py:209-371) with every length-sensitive op replaced by its masked
variant from ops/masked.py, so a single padded batch of mixed-length
utterances produces, per sample, EXACTLY the activations the unmasked
apply produces on that sample alone at its true length. This is what makes
the batched ``convert_grid`` serving path equal to one-at-a-time
conversion (round-3 verdict item 1) while remaining ONE static-shape
compiled program per padded shape.

Inference-only: no dropout, deterministic. The training hot path
(models/modules.py) is untouched.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..core.config import (
    AEConfig,
    ContentEncoderConfig,
    DecoderConfig,
    SpeakerEncoderConfig,
)
from ..ops import act_fn, adain, dense, pixel_shuffle_time, upsample_nearest_time
from ..ops.masked import (
    avg_pool_time_ceil_masked,
    conv1d_masked,
    conv_bank_masked,
    global_avg_pool_time_masked,
    instance_norm_time_masked,
)
from .modules import _bank_kernel_sizes, _sn_params


def speaker_encoder_apply_masked(
    params: dict,
    cfg: SpeakerEncoderConfig,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """x (B, T, c_in) + per-sample lengths -> (B, c_out) speaker embeddings,
    each equal to speaker_encoder_apply on the sample at its true length
    (reference: model.py:209-277; masked global pool replaces the padded
    AdaptiveAvgPool1d at model.py:231,273)."""
    act = act_fn(cfg.act)
    ks = _bank_kernel_sizes(cfg)
    out = conv_bank_masked(
        x,
        lengths,
        [p["w"] for p in params["conv_bank"]],
        [p["b"] for p in params["conv_bank"]],
        ks,
        act,
        compute_dtype=compute_dtype,
    )
    out, _ = conv1d_masked(
        out, lengths, **params["in_conv"], compute_dtype=compute_dtype
    )
    out = act(out)
    lens = lengths
    for l in range(cfg.n_conv_blocks):
        sub = cfg.subsample[l]
        y, _ = conv1d_masked(
            out, lens, **params["conv_blocks"][l]["first"], compute_dtype=compute_dtype
        )
        y = act(y)
        y, y_lens = conv1d_masked(
            y, lens, **params["conv_blocks"][l]["second"], stride=sub,
            compute_dtype=compute_dtype,
        )
        y = act(y)
        if sub > 1:
            out, _ = avg_pool_time_ceil_masked(out, lens, sub)
        out = y + out
        lens = y_lens
    out = global_avg_pool_time_masked(out, lens)
    for l in range(cfg.n_dense_blocks):
        y = act(dense(out, **params["dense_blocks"][l]["first"], compute_dtype=compute_dtype))
        y = act(dense(y, **params["dense_blocks"][l]["second"], compute_dtype=compute_dtype))
        out = y + out
    return dense(out, **params["output"], compute_dtype=compute_dtype)


def content_encoder_apply_masked(
    params: dict,
    cfg: ContentEncoderConfig,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (mu, log_sigma, content_lengths): per-sample content length
    is ceil(L / prod(subsample)) (reference: model.py:279-323; masked IN
    replaces the padded statistics at model.py:296,305,311,315)."""
    act = act_fn(cfg.act)
    ks = _bank_kernel_sizes(cfg)
    out = conv_bank_masked(
        x,
        lengths,
        [p["w"] for p in params["conv_bank"]],
        [p["b"] for p in params["conv_bank"]],
        ks,
        act,
        compute_dtype=compute_dtype,
    )
    out, _ = conv1d_masked(
        out, lengths, **params["in_conv"], compute_dtype=compute_dtype
    )
    out = act(instance_norm_time_masked(out, lengths))
    lens = lengths
    for l in range(cfg.n_conv_blocks):
        sub = cfg.subsample[l]
        y, _ = conv1d_masked(
            out, lens, **params["conv_blocks"][l]["first"], compute_dtype=compute_dtype
        )
        y = act(instance_norm_time_masked(y, lens))
        y, y_lens = conv1d_masked(
            y, lens, **params["conv_blocks"][l]["second"], stride=sub,
            compute_dtype=compute_dtype,
        )
        y = act(instance_norm_time_masked(y, y_lens))
        if sub > 1:
            out, _ = avg_pool_time_ceil_masked(out, lens, sub)
        out = y + out
        lens = y_lens
    mu, _ = conv1d_masked(out, lens, **params["mean"], compute_dtype=compute_dtype)
    log_sigma, _ = conv1d_masked(out, lens, **params["std"], compute_dtype=compute_dtype)
    return mu, log_sigma, lens


def decoder_apply_masked(
    params: dict,
    cfg: DecoderConfig,
    z: jnp.ndarray,
    cond: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """z (B, T_c, c_in) + content lengths -> (dec, out_lengths); per-sample
    output length is L_c * prod(upsample) (reference: model.py:325-371)."""
    act = act_fn(cfg.act)
    get = (lambda p: _sn_params(p)) if cfg.sn else (lambda p: p)
    out, _ = conv1d_masked(
        z, lengths, **get(params["in_conv"]), compute_dtype=compute_dtype
    )
    out = act(instance_norm_time_masked(out, lengths))
    lens = lengths
    for l in range(cfg.n_conv_blocks):
        up = cfg.upsample[l]
        blk = params["conv_blocks"][l]
        y, _ = conv1d_masked(
            out, lens, **get(blk["first"]), compute_dtype=compute_dtype
        )
        y = instance_norm_time_masked(y, lens)
        y = adain(y, dense(cond, **get(blk["affine1"]), compute_dtype=compute_dtype))
        y = act(y)
        y, _ = conv1d_masked(
            y, lens, **get(blk["second"]), compute_dtype=compute_dtype
        )
        if up > 1:
            y = pixel_shuffle_time(y, up)
            lens = lens * up
        y = instance_norm_time_masked(y, lens)
        y = adain(y, dense(cond, **get(blk["affine2"]), compute_dtype=compute_dtype))
        y = act(y)
        if up > 1:
            out = y + upsample_nearest_time(out, up)
        else:
            out = y + out
    out, _ = conv1d_masked(
        out, lens, **get(params["out_conv"]), compute_dtype=compute_dtype
    )
    return out, lens


def ae_inference_masked(
    params: dict,
    cfg: AEConfig,
    x: jnp.ndarray,
    x_lengths: jnp.ndarray,
    x_cond: jnp.ndarray,
    cond_lengths: jnp.ndarray,
    *,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ragged-batch one-shot conversion (reference: model.py:387-391).

    Returns (dec, dec_lengths): dec (B, T_out, n_mels) where sample b's
    first dec_lengths[b] = ceil(x_lengths[b]/8)*8 frames equal
    ae_inference on the pair alone at true lengths.
    """
    emb = speaker_encoder_apply_masked(
        params["speaker_encoder"], cfg.speaker_encoder, x_cond, cond_lengths,
        compute_dtype=compute_dtype,
    )
    mu, _, c_lens = content_encoder_apply_masked(
        params["content_encoder"], cfg.content_encoder, x, x_lengths,
        compute_dtype=compute_dtype,
    )
    return decoder_apply_masked(
        params["decoder"], cfg.decoder, mu, emb, c_lens,
        compute_dtype=compute_dtype,
    )
