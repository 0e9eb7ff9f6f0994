"""Channels-last 1-D convolutions and the fused conv bank.

Layout: activations (B, T, C); conv weights (K, C_in, C_out) ["WIO"];
dense weights (C_in, C_out). These map directly onto the TPU MXU with
channels on the 128-wide lane dimension.

The reference's conv bank runs 8 separate Conv1d(512->128, k=1..8) ops and
concatenates (reference: model.py:85-91, 223-225). Here the whole bank is a
single K=8 convolution: because reflect padding of width p satisfies
x[-j] == x[j] independent of p, each small-kernel conv (with its own
asymmetric pad, model.py:21-32) equals a K_max-tap conv over one shared
reflect-padded input with the small kernel embedded at tap offset
``K_max//2 - k//2``. One conv => one big MXU matmul instead of 8 small ones.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from .padding import conv_pad_amounts, reflect_pad_time

# (batch, time, channel) activations; (tap, in, out) weights
DIMENSION_NUMBERS = ("NWC", "WIO", "NWC")


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    pad_mode: str = "reflect",
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """SAME-length 1-D conv with reference pad semantics.

    x: (B, T, C_in); w: (K, C_in, C_out); returns (B, ceil(T/stride), C_out).
    Matches torch ``pad_layer`` + ``Conv1d(stride=s)`` (reference:
    model.py:21-32): pad first, then strided valid conv.
    """
    k = w.shape[0]
    left, right = conv_pad_amounts(k)
    if pad_mode == "none":
        xp = x
    else:
        xp = reflect_pad_time(x, left, right)
    if compute_dtype is not None:
        xp = xp.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # bf16 path: keep outputs bf16 (MXU accumulates f32 internally); an f32
    # preferred_element_type here would make the VJP's transposed conv mix
    # f32 cotangents with bf16 weights and fail to trace.
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
    return out


def dense(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """x: (..., C_in) @ w: (C_in, C_out) + b."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = jnp.dot(
        x, w,
        preferred_element_type=compute_dtype if compute_dtype is not None else jnp.float32,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def make_fused_bank_weight(
    bank_ws: Sequence[jnp.ndarray], kernel_sizes: Sequence[int]
) -> jnp.ndarray:
    """Embed per-kernel bank weights into one (K_max, C_in, n_k*c_bank) weight.

    ``bank_ws[i]`` has shape (k_i, C_in, c_bank). Kernel k sits at tap offset
    ``K_max//2 - k//2`` (derivation in the module docstring), so the single
    fused conv over a shared reflect pad reproduces every per-kernel output
    exactly. Output channels are ordered [k_1-block | k_2-block | ...],
    matching the reference's concat order (model.py:85-91).
    """
    k_max = max(kernel_sizes)
    blocks = []
    for w, k in zip(bank_ws, kernel_sizes):
        off = k_max // 2 - k // 2
        blocks.append(jnp.pad(w, ((off, k_max - k - off), (0, 0), (0, 0))))
    return jnp.concatenate(blocks, axis=2)


def conv_bank(
    x: jnp.ndarray,
    bank_ws: Sequence[jnp.ndarray],
    bank_bs: Sequence[jnp.ndarray],
    kernel_sizes: Sequence[int],
    act,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Fused conv bank: act(conv_k(x)) for each k, concat with x on channels.

    Equals the reference ``conv_bank`` (model.py:85-91): returns
    (B, T, n_k*c_bank + C_in).
    """
    k_max = max(kernel_sizes)
    left, right = conv_pad_amounts(k_max)
    w = make_fused_bank_weight(bank_ws, kernel_sizes)
    b = jnp.concatenate([jnp.asarray(bb) for bb in bank_bs], axis=0)
    xp = reflect_pad_time(x, left, right)
    if compute_dtype is not None:
        xp = xp.astype(compute_dtype)
        w = w.astype(compute_dtype)
    out = lax.conv_general_dilated(
        xp,
        w,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=compute_dtype if compute_dtype is not None else jnp.float32,
    )
    out = act(out + b.astype(out.dtype))
    return jnp.concatenate([out, x.astype(out.dtype)], axis=-1)
