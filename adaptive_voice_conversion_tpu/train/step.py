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
from ..models.modules import spectral_norm_update
from .optim import kl_lambda, make_optimizer


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


def _any_dropout(cfg: TrainConfig) -> bool:
    return (
        cfg.model.speaker_encoder.dropout_rate > 0
        or cfg.model.content_encoder.dropout_rate > 0
        or cfg.model.decoder.dropout_rate > 0
    )


def build_step_fn(cfg: TrainConfig, opt):
    """The un-jitted fwd+bwd+update step shared by the replicated
    (make_train_step) and tensor-parallel (parallel/tp.py) trainers."""
    any_dropout = _any_dropout(cfg)
    sn = cfg.model.decoder.sn

    def _step(params, opt_state, x, rng, lambda_kl):
        if x.dtype == jnp.uint16:
            # bf16 wire format (data/loader.py as_wire_format)
            x = jax.lax.bitcast_convert_type(x, jnp.bfloat16)

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
        if sn:
            # persist the power iteration torch runs in its training
            # forward (reference model.py:334): u' from the PRE-update W
            params = spectral_norm_update(params)
        params = optax.apply_updates(params, updates)
        metrics = {
            "loss": loss,
            "loss_rec": loss_rec,
            "loss_kl": loss_kl,
            "grad_norm": grad_norm,
        }
        return params, opt_state, metrics

    return _step


def make_train_step(cfg: TrainConfig, mesh: Optional[Mesh] = None):
    """Build (init_fn, step_fn).

    step_fn(params, opt_state, x, rng, lambda_kl) ->
        (params, opt_state, metrics) with metrics = {loss_rec, loss_kl,
        loss, grad_norm} (grad_norm is the pre-clip global norm, like torch
        clip_grad_norm_'s return value).
    """
    opt = make_optimizer(
        cfg.optimizer, sn=cfg.model.decoder.sn,
        state_dtype=cfg.opt_state_dtype, fused=cfg.opt_fused,
    )

    def init_fn(params):
        return opt.init(params)

    _step = build_step_fn(cfg, opt)

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


def make_device_data_train_step(
    cfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    inner_steps: int = 10,
    sharded_data: bool = False,
    padded_starts: bool = False,
    unroll: int = 1,
):
    """Multi-step trainer over a device-resident dataset
    (data/device_sampler.py): one XLA call runs ``inner_steps`` iterations of
    sample -> fwd -> bwd -> update via lax.scan — zero per-step host traffic
    and one dispatch per chunk, which is what the thin-host/tunnel setup
    needs (SURVEY.md §7 hard part 4).

    Returns (init_fn, multi_step) with
        multi_step(params, opt_state, packed, starts, base_key, it0)
            -> (params, opt_state, metrics (inner_steps, 4) [loss, rec, kl,
               grad_norm])
    RNG discipline matches the host path: step i uses fold_in(base_key,
    it0 + i), so resume mid-run is deterministic.

    ``sharded_data=True``: packed/starts are a ShardedDeviceDataset's stacked
    arrays sharded P('data'); each device samples its batch share from its
    own HBM shard (data/sharded.py) — aggregate-HBM capacity, zero sampling
    communication. Per-device RNG additionally folds in the device index.

    ``padded_starts=True``: the returned fn takes an extra int32 ``n_starts``
    argument after ``starts`` giving the number of VALID entries; starts may
    be padded to a fixed length so differently-sized HBM chunks reuse one
    compiled program (data/chunked.py double-buffered >HBM streaming).
    """
    opt = make_optimizer(
        cfg.optimizer, sn=cfg.model.decoder.sn,
        state_dtype=cfg.opt_state_dtype, fused=cfg.opt_fused,
    )
    sn = cfg.model.decoder.sn
    b = cfg.data_loader.batch_size
    seg = cfg.data_loader.segment_size
    any_dropout = (
        cfg.model.speaker_encoder.dropout_rate > 0
        or cfg.model.content_encoder.dropout_rate > 0
        or cfg.model.decoder.dropout_rate > 0
    )
    if sharded_data and padded_starts:
        raise NotImplementedError("sharded_data with padded_starts")
    if sharded_data and mesh is None:
        raise ValueError("sharded_data requires a mesh")

    from ..data.device_sampler import sample_segments
    from ..data.sharded import sample_segments_sharded

    def init_fn(params):
        return opt.init(params)

    def _multi_step(params, opt_state, packed, starts, n_starts, base_key, it0):
        if packed.dtype == jnp.uint16:
            # bf16 wire format (chunked streaming sends raw views)
            packed = jax.lax.bitcast_convert_type(packed, jnp.bfloat16)
        batch_spec = (
            NamedSharding(mesh, P("data")) if mesh is not None else None
        )

        def body(carry, i):
            params, opt_state = carry
            key = jax.random.fold_in(base_key, it0 + i)
            k_idx, k_step = jax.random.split(key)
            if sharded_data:
                x = sample_segments_sharded(packed, starts, seg, b, k_idx, mesh)
            else:
                x = sample_segments(packed, starts, seg, b, k_idx, n_valid=n_starts)
            if batch_spec is not None:
                x = jax.lax.with_sharding_constraint(x, batch_spec)
            lam = kl_lambda(it0 + i, cfg.loss.lambda_kl, cfg.annealing_iters)

            def loss_fn(p):
                loss_rec, loss_kl, _ = loss_terms(
                    cfg, p, x, k_step, deterministic=not any_dropout
                )
                return (
                    cfg.loss.lambda_rec * loss_rec + lam * loss_kl,
                    (loss_rec, loss_kl),
                )

            (loss, (loss_rec, loss_kl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            grad_norm = optax.global_norm(grads)
            updates, opt_state = opt.update(grads, opt_state, params)
            if sn:
                # torch's in-forward power iteration, from the pre-update W
                params = spectral_norm_update(params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), jnp.stack(
                [loss, loss_rec, loss_kl, grad_norm]
            )

        (params, opt_state), ms = jax.lax.scan(
            body, (params, opt_state), jnp.arange(inner_steps), unroll=unroll
        )
        return params, opt_state, ms

    if padded_starts:
        wrapped = _multi_step
    else:
        def wrapped(params, opt_state, packed, starts, base_key, it0):
            return _multi_step(
                params, opt_state, packed, starts, None, base_key, it0
            )

    n_extra = 1 if padded_starts else 0
    if mesh is None:
        step = jax.jit(wrapped, donate_argnums=(0, 1))
    else:
        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("data")) if sharded_data else repl
        step = jax.jit(
            wrapped,
            in_shardings=(repl, repl, data_sh, data_sh)
            + (repl,) * n_extra
            + (repl, repl),
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
