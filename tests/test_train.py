"""Training-step tests (SURVEY.md §4.3): loss/grad finiteness, KL anneal
schedule, optimizer parity vs torch Adam(amsgrad, wd), loss decrease, and
seeded determinism."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from adaptive_voice_conversion_tpu.core.config import (
    AEConfig,
    ContentEncoderConfig,
    DataLoaderConfig,
    DecoderConfig,
    OptimizerConfig,
    SpeakerEncoderConfig,
    TrainConfig,
)
from adaptive_voice_conversion_tpu.models import init_ae
from adaptive_voice_conversion_tpu.train import (
    kl_lambda,
    make_optimizer,
    make_train_step,
)

TINY = TrainConfig(
    model=AEConfig(
        speaker_encoder=SpeakerEncoderConfig(
            c_in=8, c_h=8, c_out=8, kernel_size=5, bank_size=4, bank_scale=1,
            c_bank=4, n_conv_blocks=2, n_dense_blocks=1, subsample=(1, 2),
        ),
        content_encoder=ContentEncoderConfig(
            c_in=8, c_h=8, c_out=8, kernel_size=5, bank_size=4, bank_scale=1,
            c_bank=4, n_conv_blocks=2, subsample=(1, 2),
        ),
        decoder=DecoderConfig(
            c_in=8, c_cond=8, c_h=8, c_out=8, kernel_size=5,
            n_conv_blocks=2, upsample=(2, 1),
        ),
    ),
    data_loader=DataLoaderConfig(segment_size=16, batch_size=4),
)


def batch(seed=0, b=4, t=16, c=8):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))


def test_kl_anneal_schedule():
    """lambda_kl * min(1, (it+1)/20000) (solver.py:101-104)."""
    assert float(kl_lambda(0, 1.0, 20000)) == pytest.approx(1 / 20000)
    assert float(kl_lambda(9999, 1.0, 20000)) == pytest.approx(0.5)
    assert float(kl_lambda(19999, 1.0, 20000)) == pytest.approx(1.0)
    assert float(kl_lambda(50000, 1.0, 20000)) == pytest.approx(1.0)


def test_train_step_finite_and_decreasing():
    params = init_ae(jax.random.PRNGKey(0), TINY.model)
    init_fn, step = make_train_step(TINY)
    opt_state = init_fn(params)
    x = batch()
    losses = []
    for i in range(30):
        params, opt_state, m = step(
            params, opt_state, x, jax.random.PRNGKey(i), jnp.float32(0.01)
        )
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(m["grad_norm"]))
    assert losses[-1] < losses[0]


def test_train_step_deterministic():
    params = init_ae(jax.random.PRNGKey(0), TINY.model)
    init_fn, step = make_train_step(TINY)

    def run():
        # step donates its params/opt_state buffers — give each run copies
        p = jax.tree.map(jnp.array, params)
        s = init_fn(p)
        for i in range(3):
            p, s, m = step(p, s, batch(i), jax.random.PRNGKey(i), jnp.float32(0.5))
        return m

    m1, m2 = run(), run()
    assert float(m1["loss"]) == float(m2["loss"])


def test_loss_matches_reference_formula():
    """loss = lambda_rec * L1 + lambda_kl * 0.5*mean(e^ls + mu^2 - 1 - ls)
    (solver.py:84-88) — recompute from the forward outputs."""
    from adaptive_voice_conversion_tpu.train.step import loss_terms
    from adaptive_voice_conversion_tpu.models import ae_forward

    params = init_ae(jax.random.PRNGKey(0), TINY.model)
    x = batch()
    rng = jax.random.PRNGKey(7)
    loss_rec, loss_kl, (mu, ls, emb, dec) = loss_terms(TINY, params, x, rng)
    np.testing.assert_allclose(
        float(loss_rec), float(jnp.mean(jnp.abs(dec - x))), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(loss_kl),
        float(0.5 * jnp.mean(jnp.exp(ls) + mu**2 - 1 - ls)),
        rtol=1e-6,
    )


def test_optimizer_matches_torch_adam():
    """Our chain (clip -> L2-into-grad -> amsgrad) must track
    torch.optim.Adam(amsgrad=True, weight_decay=wd) + clip_grad_norm_
    on a toy quadratic for several steps."""
    import torch

    w0 = np.array([1.5, -2.0, 0.5], dtype=np.float32)
    target = np.array([0.0, 1.0, -1.0], dtype=np.float32)
    lr, wd, clip = 0.1, 0.1, 0.05

    # torch side
    wt = torch.tensor(w0, requires_grad=True)
    opt_t = torch.optim.Adam([wt], lr=lr, betas=(0.9, 0.999), amsgrad=True,
                             weight_decay=wd)
    torch_traj = []
    for _ in range(10):
        opt_t.zero_grad()
        loss = ((wt - torch.tensor(target)) ** 2).sum()
        loss.backward()
        torch.nn.utils.clip_grad_norm_([wt], max_norm=clip)
        opt_t.step()
        torch_traj.append(wt.detach().numpy().copy())

    # ours
    cfg = OptimizerConfig(lr=lr, weight_decay=wd, grad_norm=clip, amsgrad=True)
    opt = make_optimizer(cfg)
    w = jnp.asarray(w0)
    state = opt.init(w)
    ours_traj = []
    for _ in range(10):
        g = 2 * (w - jnp.asarray(target))
        updates, state = opt.update(g, state, w)
        w = w + updates
        ours_traj.append(np.asarray(w))

    np.testing.assert_allclose(ours_traj[0], torch_traj[0], atol=1e-5)
    np.testing.assert_allclose(ours_traj[-1], torch_traj[-1], atol=1e-4)


def test_grad_norm_metric_is_preclip():
    params = init_ae(jax.random.PRNGKey(0), TINY.model)
    init_fn, step = make_train_step(TINY)
    opt_state = init_fn(params)
    _, _, m = step(params, opt_state, batch() * 50, jax.random.PRNGKey(0),
                   jnp.float32(1.0))
    # huge input -> pre-clip norm far above the clip threshold of 5
    assert float(m["grad_norm"]) > TINY.optimizer.grad_norm


def test_bfloat16_compute_path():
    cfg = TrainConfig(
        model=TINY.model, data_loader=TINY.data_loader, compute_dtype="bfloat16"
    )
    params = init_ae(jax.random.PRNGKey(0), cfg.model)
    init_fn, step = make_train_step(cfg)
    opt_state = init_fn(params)
    p, s, m = step(params, opt_state, batch(), jax.random.PRNGKey(0),
                   jnp.float32(0.5))
    assert np.isfinite(float(m["loss"]))
    # params remain f32 master copies
    assert jax.tree_util.tree_leaves(p)[0].dtype == jnp.float32


@pytest.mark.slow
def test_bf16_optimizer_state_tracks_f32():
    """opt_state_dtype='bfloat16' stores Adam moments in bf16 (halved HBM
    traffic) with f32 update math and f32 master params; the short-horizon
    trajectory must stay close to the torch-bit-exact f32 mode."""
    cfg16 = TrainConfig(
        model=TINY.model, data_loader=TINY.data_loader,
        opt_state_dtype="bfloat16",
    )
    p32 = init_ae(jax.random.PRNGKey(0), TINY.model)
    p16 = init_ae(jax.random.PRNGKey(0), TINY.model)
    i32, s32f = make_train_step(TINY)
    i16, s16f = make_train_step(cfg16)
    o32, o16 = i32(p32), i16(p16)
    mus16 = jax.tree_util.tree_leaves(o16[2].mu)
    assert all(l.dtype == jnp.bfloat16 for l in mus16)
    for it in range(10):
        x = batch(seed=it)
        rng = jax.random.PRNGKey(100 + it)
        p32, o32, m32 = s32f(p32, o32, x, rng, jnp.float32(0.5))
        p16, o16, m16 = s16f(p16, o16, x, rng, jnp.float32(0.5))
    # master params f32 in both modes
    assert jax.tree_util.tree_leaves(p16)[0].dtype == jnp.float32
    a = np.concatenate([np.ravel(l) for l in jax.tree_util.tree_leaves(p32)])
    b = np.concatenate([np.ravel(l) for l in jax.tree_util.tree_leaves(p16)])
    np.testing.assert_allclose(a, b, atol=5e-4)
    assert abs(float(m32["loss"]) - float(m16["loss"])) < 1e-2


def test_fused_optimizer_modes_match_per_leaf_chain():
    """optax.flatten and bucketed_flatten (both recorded perf negatives,
    train/optim.py) must stay numerically equivalent to the per-leaf
    chain: same updates up to flat-vs-per-leaf reduction-order noise."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from adaptive_voice_conversion_tpu.core.config import OptimizerConfig
    from adaptive_voice_conversion_tpu.train.optim import make_optimizer

    cfg = OptimizerConfig()
    rng = np.random.default_rng(0)
    params = {
        "a": {"w": jnp.asarray(rng.standard_normal((7, 5)).astype(np.float32)),
              "b": jnp.asarray(rng.standard_normal(5).astype(np.float32))},
        "c": [jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32)),
              jnp.asarray(rng.standard_normal((11,)).astype(np.float32))],
    }
    grads = jax.tree.map(
        lambda p: jnp.asarray(
            rng.standard_normal(p.shape).astype(np.float32)
        ),
        params,
    )
    ref_opt = make_optimizer(cfg)
    ref_state = ref_opt.init(params)
    ref_u, _ = ref_opt.update(grads, ref_state, params)
    for mode in (True, "bucketed", "bucketed2", "bucketed8"):
        opt = make_optimizer(cfg, fused=mode)
        state = opt.init(params)
        u, state2 = opt.update(grads, state, params)
        assert jax.tree_util.tree_structure(u) == jax.tree_util.tree_structure(ref_u)
        for ru, mu in zip(jax.tree.leaves(ref_u), jax.tree.leaves(u)):
            np.testing.assert_allclose(
                np.asarray(mu), np.asarray(ru), rtol=1e-5, atol=1e-7
            )
    # unknown mode rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_optimizer(cfg, fused="nope")
    # config-time validation: 'bucketed0' must fail AT LOAD with the key
    # named, not crash opaquely inside bucketed_flatten's plan at init
    from adaptive_voice_conversion_tpu.core.config import _parse_opt_fused

    with _pytest.raises(ValueError, match="opt_fused"):
        _parse_opt_fused("bucketed0")
    assert _parse_opt_fused("bucketed4") == "bucketed4"
    assert _parse_opt_fused("bucketed") == "bucketed"
