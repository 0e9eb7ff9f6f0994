"""Top-level AdaIN-VC autoencoder (reference: model.py:373-395).

Pure functions over the AE param pytree:
- ``ae_forward``   — training forward with VAE reparameterization
- ``ae_inference`` — one-shot conversion (mu only, no sampling)
- ``get_speaker_embedding``
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import AEConfig
from .modules import (
    content_encoder_apply,
    decoder_apply,
    init_content_encoder,
    init_decoder,
    init_speaker_encoder,
    speaker_encoder_apply,
)


def init_ae(key, cfg: AEConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "speaker_encoder": init_speaker_encoder(k1, cfg.speaker_encoder),
        "content_encoder": init_content_encoder(k2, cfg.content_encoder),
        "decoder": init_decoder(k3, cfg.decoder),
    }


def ae_forward(
    params: dict,
    cfg: AEConfig,
    x: jnp.ndarray,
    rng: jax.Array,
    *,
    deterministic: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Training forward (model.py:380-385): the same utterance feeds both
    encoders; z = mu + exp(log_sigma/2) * eps.

    x: (B, T, n_mels). Returns (mu, log_sigma, emb, dec).

    Note: sharing one width-doubled dual-fused bank evaluation between
    the two encoders (ops/conv.py ``dual_conv_bank``) was measured and
    REJECTED — it wins in isolation (fwd+bwd 3.32 vs 3.83 ms for the two
    banks) but loses in the full training program (5.15 vs 4.82 ms/step
    on a v5e): the post-conv split slices block XLA from fusing each
    encoder's bank epilogue into its downstream chain. The op and its
    bit-exactness test are kept as the recorded experiment.
    """
    k_eps, k_d1, k_d2, k_d3 = jax.random.split(rng, 4)
    dk = None if deterministic else k_d1
    emb = speaker_encoder_apply(
        params["speaker_encoder"], cfg.speaker_encoder, x,
        dropout_key=dk, deterministic=deterministic, compute_dtype=compute_dtype,
    )
    dk = None if deterministic else k_d2
    mu, log_sigma = content_encoder_apply(
        params["content_encoder"], cfg.content_encoder, x,
        dropout_key=dk, deterministic=deterministic, compute_dtype=compute_dtype,
    )
    eps = jax.random.normal(k_eps, log_sigma.shape, jnp.float32)
    z = mu + jnp.exp(log_sigma / 2) * eps
    dk = None if deterministic else k_d3
    dec = decoder_apply(
        params["decoder"], cfg.decoder, z, emb,
        dropout_key=dk, deterministic=deterministic, compute_dtype=compute_dtype,
    )
    return mu, log_sigma, emb, dec


def ae_inference(
    params: dict,
    cfg: AEConfig,
    x: jnp.ndarray,
    x_cond: jnp.ndarray,
    *,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """One-shot conversion (model.py:387-391): speaker embedding from the
    target utterance, content mu (no sampling) from the source."""
    emb = speaker_encoder_apply(
        params["speaker_encoder"], cfg.speaker_encoder, x_cond,
        compute_dtype=compute_dtype,
    )
    mu, _ = content_encoder_apply(
        params["content_encoder"], cfg.content_encoder, x,
        compute_dtype=compute_dtype,
    )
    return decoder_apply(
        params["decoder"], cfg.decoder, mu, emb, compute_dtype=compute_dtype
    )


def get_speaker_embedding(
    params: dict, cfg: AEConfig, x: jnp.ndarray, *, compute_dtype=None
) -> jnp.ndarray:
    """model.py:393-395."""
    return speaker_encoder_apply(
        params["speaker_encoder"], cfg.speaker_encoder, x, compute_dtype=compute_dtype
    )


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
