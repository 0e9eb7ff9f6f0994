"""Channels-last 1-D convolutions and the fused conv bank.

Layout: activations (B, T, C); conv weights (K, C_in, C_out) ["WIO"];
dense weights (C_in, C_out). These map directly onto the TPU MXU with
channels on the 128-wide lane dimension.

The reference's conv bank runs 8 separate Conv1d(512->128, k=1..8) ops and
concatenates (reference: model.py:85-91, 223-225). Here kernels are fused
in GROUPS: because reflect padding of width p satisfies x[-j] == x[j]
independent of p, each small-kernel conv (with its own asymmetric pad,
model.py:21-32) equals a K_max-tap conv over one shared reflect-padded
input with the small kernel embedded at tap offset ``K_max//2 - k//2``.
The group size trades zero-tap FLOPs against MXU op granularity; pairs of
adjacent sizes measured fastest on a v5e in BOTH directions (see
``conv_bank``), cutting the full training step 5.68 -> 4.82 ms.
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
    group_size: int = 2,
) -> jnp.ndarray:
    """Fused conv bank: act(conv_k(x)) for each k, concat with x on channels.

    Equals the reference ``conv_bank`` (model.py:85-91): returns
    (B, T, n_k*c_bank + C_in).

    ``group_size`` controls the FLOPs/fusion tradeoff: kernel sizes are
    embedded into one conv per group of ``group_size`` adjacent sizes.
    One group of 8 executes 8*C_in taps for all heads (1.78x the
    sum-of-kernels FLOPs); 8 singleton convs execute minimal FLOPs but 8
    small MXU ops. Measured on a v5e at B=128 T=128 bf16 (bank_probe,
    round 2): pairs win both directions — fwd 0.75 ms vs 0.99 (one group)
    / 0.79 (singletons), fwd+bwd 1.71 vs 1.89 / 2.33 — so pairs of
    adjacent sizes are the default. Output ordering and numerics are
    bit-identical across groupings (the tap-offset embed is exact).
    """
    b_all = jnp.concatenate([jnp.asarray(bb) for bb in bank_bs], axis=0)
    outs = []
    c_off = 0
    for g in range(0, len(kernel_sizes), group_size):
        g_ws = list(bank_ws[g : g + group_size])
        g_ks = list(kernel_sizes[g : g + group_size])
        k_max = max(g_ks)
        left, right = conv_pad_amounts(k_max)
        w = make_fused_bank_weight(g_ws, g_ks)
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
            preferred_element_type=compute_dtype
            if compute_dtype is not None
            else jnp.float32,
        )
        n_out = w.shape[2]
        out = act(out + b_all[c_off : c_off + n_out].astype(out.dtype))
        c_off += n_out
        outs.append(out)
    return jnp.concatenate(outs + [x.astype(outs[0].dtype)], axis=-1)


def conv_bank_in(
    x: jnp.ndarray,
    bank_ws: Sequence[jnp.ndarray],
    bank_bs: Sequence[jnp.ndarray],
    kernel_sizes: Sequence[int],
    act,
    w_in: jnp.ndarray,
    b_in: Optional[jnp.ndarray],
    compute_dtype: Optional[jnp.dtype] = None,
    group_size: int = 2,
) -> jnp.ndarray:
    """Fused bank + 1x1 in-conv WITHOUT materializing the concat.

    The encoders follow the bank with a 1x1 conv over the concatenated
    (n_k*c_bank + C_in) channels (reference: model.py:226,268-269). A 1x1
    conv over a concat equals the SUM of per-block partial products with
    the corresponding weight rows, so the (B, T, 1536) concat tensor never
    exists. RECORDED EXPERIMENT, not on the production path: the
    scan-amortized probe measured bank+in_conv fwd+bwd 1.98 vs 2.32 ms in
    isolation (tools/perf_probes.py probe_bank_split), but the FULL train
    step regressed 4.76 -> 5.52 ms with this op on both encoders — the
    same lesson as dual_conv_bank: splitting the 1x1 into partial sums
    destroys the single fusion root XLA builds around the concat.
    Production keeps conv_bank -> conv1d (models/modules.py NOTE).

    Returns the 1x1 conv OUTPUT (pre-activation), f32-or-compute_dtype —
    numerically a reordered sum vs conv_bank->conv1d (identical math,
    different float association; parity pinned in tests/test_ops.py).
    """
    w_in2d = w_in[0] if w_in.ndim == 3 else w_in  # (C_total, C_out)
    pdt = compute_dtype if compute_dtype is not None else jnp.float32
    b_all = jnp.concatenate([jnp.asarray(bb) for bb in bank_bs], axis=0)
    acc = None
    c_off = 0
    for g in range(0, len(kernel_sizes), group_size):
        g_ws = list(bank_ws[g : g + group_size])
        g_ks = list(kernel_sizes[g : g + group_size])
        k_max = max(g_ks)
        left, right = conv_pad_amounts(k_max)
        w = make_fused_bank_weight(g_ws, g_ks)
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
            preferred_element_type=pdt,
        )
        n_out = w.shape[2]
        out = act(out + b_all[c_off : c_off + n_out].astype(out.dtype))
        w_blk = w_in2d[c_off : c_off + n_out].astype(out.dtype)
        term = jnp.dot(out, w_blk, preferred_element_type=pdt)
        acc = term if acc is None else acc + term
        c_off += n_out
    x_dt = x.astype(pdt if compute_dtype is None else compute_dtype)
    w_x = w_in2d[c_off:].astype(x_dt.dtype)
    acc = acc + jnp.dot(x_dt, w_x, preferred_element_type=pdt)
    if b_in is not None:
        acc = acc + b_in.astype(acc.dtype)
    return acc


def dual_conv_bank(
    x: jnp.ndarray,
    banks,
    kernel_sizes: Sequence[int],
    acts,
    compute_dtype: Optional[jnp.dtype] = None,
    group_size: int = 2,
):
    """TWO conv banks over the SAME input as one set of fused convs.

    The training forward feeds the identical utterance batch to both
    encoders (reference model.py:380-382), so their banks can share
    framing and input reads by concatenating the two banks' weights per
    kernel group. RECORDED EXPERIMENT, not on the production path: in
    isolation this wins (fwd+bwd 3.32 ms vs 3.83 ms for two separate
    pair-grouped banks, v5e B=128 T=128 bf16) but the FULL training step
    measured slower (5.15 vs 4.82 ms) — the post-conv split slices stop
    XLA fusing each encoder's bank epilogue into its downstream chain —
    so ae_forward keeps per-encoder banks (models/ae.py docstring).

    ``banks`` is ((ws_a, bs_a), (ws_b, bs_b)); both must share
    ``kernel_sizes`` and per-kernel output width. ``acts`` is the pair of
    per-encoder activations (applied after splitting, so differing
    activations are fine). Returns (out_a, out_b), each bit-identical to
    ``conv_bank`` with the same ``group_size``.
    """
    (ws_a, bs_a), (ws_b, bs_b) = banks
    act_a, act_b = acts
    outs_a, outs_b = [], []
    for g in range(0, len(kernel_sizes), group_size):
        g_ks = list(kernel_sizes[g : g + group_size])
        k_max = max(g_ks)
        w_a = make_fused_bank_weight(list(ws_a[g : g + group_size]), g_ks)
        w_b = make_fused_bank_weight(list(ws_b[g : g + group_size]), g_ks)
        w = jnp.concatenate([w_a, w_b], axis=2)
        b = jnp.concatenate(
            [jnp.asarray(bb) for bb in bs_a[g : g + group_size]]
            + [jnp.asarray(bb) for bb in bs_b[g : g + group_size]],
            axis=0,
        )
        left, right = conv_pad_amounts(k_max)
        xp = reflect_pad_time(x, left, right)
        if compute_dtype is not None:
            xp = xp.astype(compute_dtype)
            w = w.astype(compute_dtype)
        o = lax.conv_general_dilated(
            xp,
            w,
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=DIMENSION_NUMBERS,
            preferred_element_type=compute_dtype
            if compute_dtype is not None
            else jnp.float32,
        )
        o = o + b.astype(o.dtype)
        n_a = w_a.shape[2]
        outs_a.append(act_a(o[..., :n_a]))
        outs_b.append(act_b(o[..., n_a:]))
    xdt = x.astype(outs_a[0].dtype)
    return (
        jnp.concatenate(outs_a + [xdt], axis=-1),
        jnp.concatenate(outs_b + [xdt], axis=-1),
    )
