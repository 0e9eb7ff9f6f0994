"""Length-masked variants of the model ops for exact ragged-batch serving.

A conversion grid batches utterances of DIFFERENT lengths into one padded
(B, T, C) array. Zero padding is not neutral for this model: reflect-pad
convolutions read the pad region near each sample's true end
(reference: model.py:21-32), instance-norm statistics average over every
frame (reference: model.py:296,305,311,315), and the speaker encoder's
global average pool divides by the padded length (reference: model.py:231).

These ops take a per-sample ``lengths`` (B,) int32 array and compute, for
every sample, EXACTLY what the unmasked op computes on that sample alone at
its true length — in one static-shape compiled program (TPU-native: the
ragged structure is data, not shape). Positions at or beyond a sample's
length may hold garbage between ops; every masked op here either ignores
them (gather-based reflect padding reads only valid frames) or excludes
them from its reductions, so garbage never flows into valid outputs.

Used by models/masked.py (inference-only); the training hot path keeps the
unmasked ops untouched.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from jax import lax

from .conv import DIMENSION_NUMBERS, make_fused_bank_weight
from .padding import conv_pad_amounts


def valid_mask(lengths: jnp.ndarray, t: int) -> jnp.ndarray:
    """(B,) lengths -> (B, t) float32 mask of valid positions."""
    return (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.float32)


def ceil_lengths(lengths: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Valid length after a SAME-padded strided conv: ceil(L / stride)."""
    return -(-lengths // stride)


def reflect_pad_time_masked(
    x: jnp.ndarray, lengths: jnp.ndarray, left: int, right: int
) -> jnp.ndarray:
    """Per-sample reflect pad of (B, T, C) around [0, L_b), torch-style
    (edge sample not repeated). Output (B, left + T + right, C); positions
    past L_b + right are clamped garbage (finite, never read downstream).

    The right-reflect is applied AFTER the left |pos| fold, so a sample
    whose valid length is smaller than the pad width still resolves every
    index into [0, L_b) (folded reflection, clamped to edge-extension for
    the deepest pads) — reads NEVER land in another layer's garbage
    region. Such ultra-short samples have no single-sample reference
    behavior to match (torch's F.pad(reflect) raises when pad >= length);
    normal-length samples are bit-identical to the per-sample pad.
    """
    t = x.shape[1]
    pos = jnp.arange(-left, t + right)[None, :]  # (1, P)
    l = lengths[:, None]
    idx = jnp.abs(pos)  # left reflect: -j -> j (same for every sample)
    idx = jnp.where(idx >= l, 2 * l - 2 - idx, idx)  # right reflect at L_b
    idx = jnp.clip(idx, 0, t - 1)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def conv1d_masked(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    compute_dtype: Optional[jnp.dtype] = None,
):
    """ops.conv1d with per-sample reflect semantics.

    Returns (out, out_lengths): out (B, ceil(T/stride), C_out); sample b's
    first ceil(L_b/stride) frames equal conv1d on that sample alone.
    """
    k = w.shape[0]
    left, right = conv_pad_amounts(k)
    xp = x if (left == 0 and right == 0) else reflect_pad_time_masked(
        x, lengths, left, right
    )
    if compute_dtype is not None:
        xp = xp.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = lax.conv_general_dilated(
        xp,
        w,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=compute_dtype if compute_dtype is not None else jnp.float32,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out, ceil_lengths(lengths, stride)


def conv_bank_masked(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    bank_ws: Sequence[jnp.ndarray],
    bank_bs: Sequence[jnp.ndarray],
    kernel_sizes: Sequence[int],
    act,
    compute_dtype: Optional[jnp.dtype] = None,
    group_size: int = 2,
) -> jnp.ndarray:
    """ops.conv_bank with per-sample reflect padding (same pair grouping —
    the tap-offset embed is exact for any reflect extension, so numerics
    match conv_bank on each sample at its true length)."""
    b_all = jnp.concatenate([jnp.asarray(bb) for bb in bank_bs], axis=0)
    outs = []
    c_off = 0
    for g in range(0, len(kernel_sizes), group_size):
        g_ws = list(bank_ws[g : g + group_size])
        g_ks = list(kernel_sizes[g : g + group_size])
        k_max = max(g_ks)
        left, right = conv_pad_amounts(k_max)
        w = make_fused_bank_weight(g_ws, g_ks)
        xp = reflect_pad_time_masked(x, lengths, left, right)
        if compute_dtype is not None:
            xp = xp.astype(compute_dtype)
            w = w.astype(compute_dtype)
        out = lax.conv_general_dilated(
            xp,
            w,
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=DIMENSION_NUMBERS,
            preferred_element_type=compute_dtype
            if compute_dtype is not None
            else jnp.float32,
        )
        n_out = w.shape[2]
        out = act(out + b_all[c_off : c_off + n_out].astype(out.dtype))
        c_off += n_out
        outs.append(out)
    return jnp.concatenate(outs + [x.astype(outs[0].dtype)], axis=-1)


def instance_norm_time_masked(
    x: jnp.ndarray, lengths: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """ops.instance_norm_time with statistics over valid frames only
    (matches torch InstanceNorm1d on each sample at its true length)."""
    xf = x.astype(jnp.float32)
    m = valid_mask(lengths, x.shape[1])[:, :, None]
    n = lengths.astype(jnp.float32)[:, None, None]
    mean = jnp.sum(xf * m, axis=1, keepdims=True) / n
    var = jnp.sum(jnp.square(xf - mean) * m, axis=1, keepdims=True) / n
    out = (xf - mean) * lax.rsqrt(var + eps)
    return out.astype(x.dtype)


def avg_pool_time_ceil_masked(
    x: jnp.ndarray, lengths: jnp.ndarray, kernel: int
):
    """ops.avg_pool_time_ceil with per-sample trailing-window divisors:
    window o of sample b averages over min(kernel, L_b - o*kernel) valid
    elements (torch ceil_mode semantics at the sample's true length)."""
    if kernel == 1:
        return x, lengths
    b, t, c = x.shape
    t_out = -(-t // kernel)
    pad = t_out * kernel - t
    xm = x * valid_mask(lengths, t)[:, :, None].astype(x.dtype)
    if pad:
        xm = jnp.pad(xm, ((0, 0), (0, pad), (0, 0)))
    summed = xm.reshape(b, t_out, kernel, c).sum(axis=2)
    counts = jnp.clip(
        lengths[:, None] - kernel * jnp.arange(t_out)[None, :], 1, kernel
    ).astype(x.dtype)
    return summed / counts[:, :, None], ceil_lengths(lengths, kernel)


def global_avg_pool_time_masked(
    x: jnp.ndarray, lengths: jnp.ndarray
) -> jnp.ndarray:
    """ops.global_avg_pool_time over valid frames only: (B, T, C) -> (B, C)."""
    m = valid_mask(lengths, x.shape[1])[:, :, None].astype(x.dtype)
    return jnp.sum(x * m, axis=1) / lengths.astype(x.dtype)[:, None]
