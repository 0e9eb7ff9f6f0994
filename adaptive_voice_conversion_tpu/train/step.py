"""Jitted training / eval steps, optionally sharded over a device mesh.

The per-step computation mirrors the reference ae_step (solver.py:81-97):
loss = lambda_rec * L1(dec, x) + lambda_kl * KL, grad-clip 5, Adam(amsgrad,
wd). TPU-native differences: the whole step (fwd + bwd + update) is one XLA
program with donated params/opt_state (no per-step host sync — the reference
does ``.item()`` every step, solver.py:94-96); with a mesh, the batch axis is
sharded over 'data' and gradient reduction is the psum XLA inserts.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import TrainConfig
from ..models.ae import ae_forward, ae_inference
from .optim import make_optimizer


def loss_terms(cfg: TrainConfig, params, x, rng, deterministic=True):
    """Returns (loss_rec, loss_kl, aux) for batch x (B, T, n_mels)."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    mu, log_sigma, emb, dec = ae_forward(
        params, cfg.model, x, rng, deterministic=deterministic, compute_dtype=dtype
    )
    loss_rec = jnp.mean(jnp.abs(dec.astype(jnp.float32) - x))
    loss_kl = 0.5 * jnp.mean(
        jnp.exp(log_sigma) + jnp.square(mu) - 1.0 - log_sigma
    )
    return loss_rec, loss_kl, (mu, log_sigma, emb, dec)


def make_train_step(cfg: TrainConfig, mesh: Optional[Mesh] = None):
    """Build (init_fn, step_fn).

    step_fn(params, opt_state, x, rng, lambda_kl) ->
        (params, opt_state, metrics) with metrics = {loss_rec, loss_kl,
        loss, grad_norm} (grad_norm is the pre-clip global norm, like torch
        clip_grad_norm_'s return value).
    """
    opt = make_optimizer(cfg.optimizer)
    any_dropout = (
        cfg.model.speaker_encoder.dropout_rate > 0
        or cfg.model.content_encoder.dropout_rate > 0
        or cfg.model.decoder.dropout_rate > 0
    )

    def init_fn(params):
        return opt.init(params)

    def _step(params, opt_state, x, rng, lambda_kl):
        def loss_fn(p):
            loss_rec, loss_kl, _ = loss_terms(
                cfg, p, x, rng, deterministic=not any_dropout
            )
            loss = cfg.loss.lambda_rec * loss_rec + lambda_kl * loss_kl
            return loss, (loss_rec, loss_kl)

        (loss, (loss_rec, loss_kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": loss,
            "loss_rec": loss_rec,
            "loss_kl": loss_kl,
            "grad_norm": grad_norm,
        }
        return params, opt_state, metrics

    if mesh is None:
        step = jax.jit(_step, donate_argnums=(0, 1))
    else:
        repl = NamedSharding(mesh, P())
        batch = NamedSharding(mesh, P("data"))
        step = jax.jit(
            _step,
            in_shardings=(repl, repl, batch, repl, repl),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
        )
    return init_fn, step


def make_eval_step(cfg: TrainConfig, mesh: Optional[Mesh] = None):
    """Deterministic loss evaluation on held-out segments (the reference
    creates in_test/out_test splits but never evaluates them; we do)."""

    def _eval(params, x, lambda_kl):
        loss_rec, loss_kl, _ = loss_terms(
            cfg, params, x, jax.random.PRNGKey(0), deterministic=True
        )
        return {
            "loss_rec": loss_rec,
            "loss_kl": loss_kl,
            "loss": cfg.loss.lambda_rec * loss_rec + lambda_kl * loss_kl,
        }

    if mesh is None:
        return jax.jit(_eval)
    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P("data"))
    return jax.jit(_eval, in_shardings=(repl, batch, repl), out_shardings=repl)
