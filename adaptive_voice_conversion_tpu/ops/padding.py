"""Time-axis padding with PyTorch-parity asymmetry.

The reference pads every conv input with reflect padding whose amounts depend
on kernel parity: even kernels pad ``(k//2, k//2 - 1)``, odd kernels
``(k//2, k//2)`` (reference: model.py:21-32). Activations here are
channels-last ``(B, T, C)``, so padding applies to axis 1.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def conv_pad_amounts(kernel_size: int) -> Tuple[int, int]:
    """'SAME'-length pad amounts with the reference's even-kernel asymmetry."""
    if kernel_size % 2 == 0:
        return kernel_size // 2, kernel_size // 2 - 1
    return kernel_size // 2, kernel_size // 2


def reflect_pad_time(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """Reflect-pad the time axis of a (..., T, C) array.

    Matches torch ``F.pad(mode='reflect')``: the edge sample is not repeated
    (x[-1] == x[1]).
    """
    if left == 0 and right == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (left, right)
    return jnp.pad(x, pad, mode="reflect")
