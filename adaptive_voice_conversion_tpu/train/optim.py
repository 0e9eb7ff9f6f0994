"""Optimizer chain matching the reference's torch Adam semantics.

Reference (solver.py:74-77,89-93): grads are clipped by global norm 5 FIRST
(clip_grad_norm_ before opt.step), then torch Adam applies weight_decay as
L2-into-grad (grad += wd * param) before the (amsgrad) moment updates.
The optax chain reproduces that exact order:

    clip_by_global_norm(grad_norm) -> add_decayed_weights(wd) -> amsgrad(lr)

(Decoupled AdamW would be WRONG here — torch Adam's weight_decay feeds the
moments.) The KL anneal schedule (solver.py:101-104) is a pure function of
the iteration, passed into the jitted step as a scalar.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import OptimizerConfig


class ScaleByTorchAmsgradState(NamedTuple):
    count: chex.Array
    mu: chex.Array
    nu: chex.Array
    nu_max: chex.Array


def scale_by_torch_amsgrad(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    state_dtype=None,
) -> optax.GradientTransformation:
    """AMSGrad with torch.optim.Adam(amsgrad=True) semantics.

    torch maxes the RAW second moment (max_exp_avg_sq = max(prev, nu)) and
    bias-corrects with the CURRENT step's (1 - b2^t); optax's built-in
    amsgrad maxes the bias-corrected moments, which diverges after step 1.

    ``state_dtype``: storage dtype for the three moment trees. ``None``
    keeps the param dtype (f32 — torch-bit-exact, the parity-gate mode);
    ``jnp.bfloat16`` halves the Adam-state HBM traffic (the largest
    memory-bound term left in the train step after round 2's roofline:
    3 moment trees read+written per step). Moment ARITHMETIC always runs in
    f32 — only the carried state is rounded, so the f32 master params see
    f32 update math either way.
    """

    def _store(x):
        return x if state_dtype is None else x.astype(state_dtype)

    def init_fn(params):
        z = lambda: jax.tree.map(
            lambda p: jnp.zeros(p.shape, state_dtype or p.dtype), params
        )
        return ScaleByTorchAmsgradState(
            count=jnp.zeros([], jnp.int32), mu=z(), nu=z(), nu_max=z()
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        f32 = lambda t: jax.tree.map(
            lambda l: l.astype(jnp.float32), t
        ) if state_dtype is not None else t
        mu = jax.tree.map(
            lambda g, m: b1 * m + (1 - b1) * g, updates, f32(state.mu)
        )
        nu = jax.tree.map(
            lambda g, v: b2 * v + (1 - b2) * jnp.square(g),
            updates,
            f32(state.nu),
        )
        nu_max = jax.tree.map(jnp.maximum, f32(state.nu_max), nu)
        bc1 = 1 - b1**count.astype(jnp.float32)
        bc2 = 1 - b2**count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu_max
        )
        return out, ScaleByTorchAmsgradState(
            count=count,
            mu=jax.tree.map(_store, mu),
            nu=jax.tree.map(_store, nu),
            nu_max=jax.tree.map(_store, nu_max),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def _cast_nu_storage(
    inner: optax.GradientTransformation, dtype
) -> optax.GradientTransformation:
    """Store the second moment of ``optax.scale_by_adam`` in ``dtype``.

    scale_by_adam only exposes ``mu_dtype``; nu would stay f32, so the
    'bf16 state halves Adam-state HBM traffic' property would silently not
    hold on the non-amsgrad path (round-3 advisor finding). Mirror the
    custom amsgrad transform's semantics: arithmetic in f32 (the stored
    bf16 nu is upcast before the update), only the carried state rounded.
    """

    def _to(t, dt):
        return jax.tree.map(lambda x: x.astype(dt), t)

    def init_fn(params):
        state = inner.init(params)
        return state._replace(nu=_to(state.nu, dtype))

    def update_fn(updates, state, params=None):
        state = state._replace(nu=_to(state.nu, jnp.float32))
        out, new_state = inner.update(updates, state, params)
        return out, new_state._replace(nu=_to(new_state.nu, dtype))

    return optax.GradientTransformation(init_fn, update_fn)


def bucketed_flatten(
    inner: optax.GradientTransformation, n_buckets: int = 4
) -> optax.GradientTransformation:
    """Run ``inner`` on ``n_buckets`` flat same-dtype vectors instead of the
    ~85-leaf param tree.

    Middle ground between the per-leaf chain (round-3 trace: optax
    ``apply_updates`` exploded into 166 small fusions, 0.34 ms of the
    4.75 ms step) and ``optax.flatten`` (measured negative: ONE 9M-element
    ravel + per-leaf unravel slices was slower than the per-leaf chain).
    Leaves are greedily packed into size-balanced buckets (largest first),
    so the optimizer runs as a handful of ~2M-element fused elementwise
    ops. Elementwise math is identical; only the global-norm reduction
    order changes (K flat partials vs per-leaf partials).

    RECORDED NEGATIVE RESULT (round-4 verdict item 4, measured on the
    production device-resident multi-step, v5e, batch 128 seg 128 bf16,
    median of 5 x 120 steps): per-leaf chain 4.95 ms/step, bucketed8
    5.07, bucketed4 5.16, optax.flatten 5.25. The pack/unpack concats and
    slices move ~2 extra param-tree copies of HBM traffic per step —
    about what the 166 small fusions cost — and XLA overlaps the small
    per-leaf fusions with surrounding work better than the trace's
    isolated attribution suggested. The default stays the per-leaf chain;
    the knob remains for other model scales.

    Works for chains whose transforms treat params/updates elementwise +
    global reductions (true of clip_by_global_norm -> add_decayed_weights
    -> adam variants); NOT for the sn=True masked chain (needs tree
    structure), mirroring optax.flatten's constraint.
    """

    def _plan(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        k = max(1, min(n_buckets, len(leaves)))  # never an empty bucket
        order = sorted(
            range(len(leaves)), key=lambda i: -int(leaves[i].size)
        )
        fill = [0] * k
        assign = [0] * len(leaves)
        for i in order:  # greedy size balancing
            b = min(range(k), key=lambda j: fill[j])
            assign[i] = b
            fill[b] += int(leaves[i].size)
        return leaves, treedef, assign, k

    def _pack(tree):
        leaves, treedef, assign, k = _plan(tree)
        buckets = [
            jnp.concatenate(
                [leaves[i].ravel() for i in range(len(leaves)) if assign[i] == b]
            )
            for b in range(k)
        ]
        return buckets, (treedef, assign, [l.shape for l in leaves], k)

    def _unpack(buckets, spec):
        treedef, assign, shapes, k = spec
        out = [None] * len(shapes)
        offs = [0] * k
        for i, shape in enumerate(shapes):
            b = assign[i]
            n = int(np.prod(shape)) if shape else 1
            out[i] = jax.lax.dynamic_slice_in_dim(
                buckets[b], offs[b], n
            ).reshape(shape)
            offs[b] += n
        return jax.tree_util.tree_unflatten(treedef, out)

    def init_fn(params):
        buckets, _ = _pack(params)
        return inner.init(buckets)

    def update_fn(updates, state, params=None):
        u_buckets, spec = _pack(updates)
        p_buckets = _pack(params)[0] if params is not None else None
        out_buckets, state = inner.update(u_buckets, state, p_buckets)
        return _unpack(out_buckets, spec), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    cfg: OptimizerConfig,
    sn: bool = False,
    state_dtype: str = "float32",
    fused=False,
) -> optax.GradientTransformation:
    """``fused=True`` wraps the chain in ``optax.flatten``: the whole update
    runs on ONE raveled parameter vector instead of ~85 leaves. The round-3
    profiler trace showed apply_updates alone exploding into 166 small
    fusions costing 0.34 ms of the 4.75 ms step; flattening turns the
    optimizer into a handful of 9M-element elementwise ops.
    ``fused="bucketed"`` (or ``"bucketed<K>"``, e.g. "bucketed8") instead
    flattens into K size-balanced flat buckets (bucketed_flatten) — the
    round-3-verdict-item-4 middle ground. Element-wise math is identical
    either way; only the global-norm reduction order changes (flat sums vs
    per-leaf partials), a <1 ulp-level difference — the torch-bit-exact
    parity mode keeps the default unflattened chain.
    Incompatible with sn=True (the masked-u chain needs tree structure)."""
    if fused and sn:
        raise ValueError(
            "make_optimizer(fused=True, sn=True) is unsupported: "
            "optax.flatten cannot carry the spectral-norm masked-u tree "
            "structure — drop opt_fused or sn"
        )
    sd = jnp.bfloat16 if state_dtype == "bfloat16" else None
    if cfg.amsgrad:
        inner = scale_by_torch_amsgrad(
            b1=cfg.beta1, b2=cfg.beta2, eps=1e-8, state_dtype=sd
        )
    else:
        inner = optax.scale_by_adam(
            b1=cfg.beta1, b2=cfg.beta2, eps=1e-8, mu_dtype=sd
        )
        if sd is not None:
            inner = _cast_nu_storage(inner, sd)
    chain = optax.chain(
        optax.clip_by_global_norm(cfg.grad_norm),
        optax.add_decayed_weights(cfg.weight_decay),
        inner,
        optax.scale(-cfg.lr),
    )
    if not sn:
        if not fused:
            return chain
        if fused is True:
            return optax.flatten(chain)
        if isinstance(fused, str) and fused.startswith("bucketed"):
            k = int(fused[len("bucketed"):] or 4)
            return bucketed_flatten(chain, n_buckets=k)
        raise ValueError(f"unknown fused mode {fused!r}")
    # sn=True: the param tree carries spectral-norm power-iteration buffers
    # `u` (like torch's weight_u). Their grads are exactly zero (the
    # iterates are detached), so clipping is unaffected — but weight decay
    # and Adam moments must skip them (torch's optimizer never sees
    # buffers). optax.masked leaves un-masked updates untouched (still 0).
    from ..models.modules import trainable_mask

    return optax.masked(chain, trainable_mask)


def kl_lambda(iteration, lambda_kl: float, annealing_iters: int):
    """lambda_kl * min(1, (it+1)/annealing_iters) (solver.py:101-104)."""
    frac = jnp.minimum(1.0, (iteration + 1) / annealing_iters)
    return lambda_kl * frac
