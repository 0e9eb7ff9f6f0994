"""Tensor parallelism: channel-sharded params over the mesh 'model' axis.

The reference has no distributed support of any kind (SURVEY.md §2.4); the
default AdaIN-VC config (~9M params) replicates, and pure DP is the
production sharding. This module exists for scaled-up variants (wider
conv banks / more mels) whose params or activations outgrow one chip: it
assigns Megatron-style PartitionSpecs to the param pytree and builds a
train step that runs with params and optimizer state sharded over
('data', 'model') — gradients psum over 'data', channel contractions
reduce over 'model', both inserted by GSPMD from the param shardings.

Sharding scheme (params are channels-last: conv w (k, in, out),
dense w (in, out), bias (out,)):

- residual-block *second* layers are row-parallel: input-channel axis
  sharded, bias replicated — the preceding *first* layer is
  column-parallel (output channels sharded), so the pair's pointwise ops
  run on local channel shards and the only collective is the psum after
  the second contraction (the classic Megatron pairing).
- everything else (conv banks, 1x1 in/out convs, mu/log_sigma heads,
  AdaIN affines, speaker output) is column-parallel: output-channel axis
  sharded, bias sharded to match.
- any axis not divisible by the 'model' axis size stays replicated.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import MODEL_AXIS


def _leaf_spec(path, leaf, n_model: int) -> P:
    """PartitionSpec for one param leaf given its key path."""
    names = [
        k.key for k in path if isinstance(k, jax.tree_util.DictKey)
    ]
    is_second = "second" in names
    is_bias = names and names[-1] == "b"
    nd = leaf.ndim
    if is_second:
        if is_bias:
            return P()  # row-parallel output is replicated after the psum
        # weight (k, in, out) or (in, out): shard the input-channel axis
        in_axis = nd - 2
        if leaf.shape[in_axis] % n_model == 0:
            spec = [None] * nd
            spec[in_axis] = MODEL_AXIS
            return P(*spec)
        return P()
    # column-parallel: shard the output axis (last) of weights and biases
    if leaf.shape[-1] % n_model == 0:
        spec = [None] * nd
        spec[-1] = MODEL_AXIS
        return P(*spec)
    return P()


def tp_param_specs(params, n_model: int):
    """Pytree of PartitionSpec matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_spec(path, leaf, n_model), params
    )


def shard_params_tp(params, mesh: Mesh):
    """Place params on ``mesh`` with tensor-parallel channel sharding."""
    specs = tp_param_specs(params, mesh.shape[MODEL_AXIS])
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    return jax.device_put(params, shardings)


def make_tp_train_step(cfg, mesh: Mesh):
    """(init_fn, step_fn) with params + opt state tensor-parallel sharded.

    Contract: call ``params = shard_params_tp(params, mesh)`` first, then
    ``opt_state = init_fn(params)`` (the jitted optax init propagates the
    param shardings into the moment trees), and device_put batches with
    ``batch_sharding(mesh)``. The step jit infers shardings from its
    arguments, so GSPMD lays out the whole fwd+bwd+update program around
    the channel shards; semantics are identical to the replicated step
    (tests/test_distributed.py pins this against the single-device step).
    """
    from ..train.optim import make_optimizer
    from ..train.step import build_step_fn

    opt = make_optimizer(
        cfg.optimizer, sn=cfg.model.decoder.sn,
        state_dtype=cfg.opt_state_dtype, fused=cfg.opt_fused,
    )
    init_fn = jax.jit(opt.init)
    return init_fn, jax.jit(build_step_fn(cfg, opt), donate_argnums=(0, 1))
