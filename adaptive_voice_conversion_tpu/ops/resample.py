"""Time-axis resampling ops: pixel shuffle, nearest upsample, ceil avg-pool.

All operate on channels-last (B, T, C) activations and reproduce the exact
PyTorch semantics the reference relies on:
- ``pixel_shuffle_1d`` channel interleave order (reference: model.py:52-59)
- ``F.interpolate(mode='nearest')`` (reference: model.py:61-63)
- ``F.avg_pool1d(ceil_mode=True)`` partial-window averaging that divides by
  the true element count (reference: model.py:248,319)
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle_time(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(B, T, C*r) -> (B, T*r, C).

    Torch layout (model.py:52-59): input channel index ``c*r + phase`` feeds
    output time ``t*r + phase`` of channel ``c``. In channels-last terms the
    last axis factors as (C, r); moving r next to T gives the interleave.
    """
    if scale == 1:
        return x
    b, t, cr = x.shape
    c = cr // scale
    return x.reshape(b, t, c, scale).transpose(0, 1, 3, 2).reshape(b, t * scale, c)


def upsample_nearest_time(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(B, T, C) -> (B, T*r, C) by repeating each frame r times."""
    if scale == 1:
        return x
    return jnp.repeat(x, scale, axis=1)


def avg_pool_time_ceil(x: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """avg_pool1d(kernel, stride=kernel, ceil_mode=True) over the time axis.

    A trailing partial window is averaged over its actual length (verified
    torch behavior: divisor is the valid-element count, not ``kernel``).
    """
    if kernel == 1:
        return x
    b, t, c = x.shape
    t_out = -(-t // kernel)
    pad = t_out * kernel - t
    if pad:
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        counts = jnp.full((t_out,), kernel, dtype=x.dtype).at[-1].set(kernel - pad)
        summed = xp.reshape(b, t_out, kernel, c).sum(axis=2)
        return summed / counts[None, :, None]
    return x.reshape(b, t_out, kernel, c).mean(axis=2)


def global_avg_pool_time(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool1d(1) + squeeze: (B, T, C) -> (B, C) (model.py:231,273)."""
    return jnp.mean(x, axis=1)
