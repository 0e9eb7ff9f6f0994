"""Instance normalization and AdaIN for (B, T, C) activations.

Reference semantics: ``nn.InstanceNorm1d(c_h, affine=False)`` — per-sample,
per-channel statistics over the time axis, biased variance, eps 1e-5
(reference: model.py:296,341); AdaIN is ``append_cond``: a per-channel affine
whose (mean, std) come from a Linear projection of the speaker embedding
split in half (reference: model.py:77-83).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def instance_norm_time(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over time: x (B, T, C) -> (x - mean_T) / sqrt(var_T + eps).

    Statistics are computed in float32 regardless of activation dtype.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return out.astype(x.dtype)


def adain(x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
    """append_cond: x (B, T, C), cond (B, 2C) -> x * std + mean.

    cond[:, :C] is the mean, cond[:, C:] the std (reference: model.py:77-83).
    """
    c = x.shape[-1]
    mean = cond[:, :c][:, None, :]
    std = cond[:, c:][:, None, :]
    return x * std.astype(x.dtype) + mean.astype(x.dtype)


def act_fn(name: str):
    """'relu' or 'lrelu' (reference: model.py:93-99; lrelu slope 0.01)."""
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.01)
    return jax.nn.relu
