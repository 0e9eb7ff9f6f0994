"""Spectral-norm support tests (decoder sn=True — reference model.py:334).

Torch's spectral_norm does one power iteration per forward (updating u),
then divides the weight by sigma = u^T W v. Our functional version computes
sigma the same way from the stored u; `spectral_norm_update` persists the
power-iteration u like torch's in-place update.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
from torch.nn.utils import spectral_norm as torch_sn
import jax
import jax.numpy as jnp

from adaptive_voice_conversion_tpu.core.config import DecoderConfig
from adaptive_voice_conversion_tpu.models.modules import (
    _sn_params,
    _w2d,
    decoder_apply,
    init_decoder,
    spectral_norm_update,
)

RNG = np.random.default_rng(0)


def _torch_effective_weight(layer, w_t, u):
    """Load (weight_orig, u) into a torch spectral_norm layer and run one
    forward to get the effective (normalized) weight."""
    with torch.no_grad():
        layer.weight_orig.copy_(torch.from_numpy(w_t))
        layer.weight_u.copy_(torch.from_numpy(u))
    layer.train()
    # forward triggers the power iteration + normalization
    if isinstance(layer, nn.Linear):
        layer(torch.zeros(1, layer.in_features))
    else:
        layer(torch.zeros(1, layer.in_channels, 8))
    return layer.weight.detach().numpy()


def test_dense_sigma_matches_torch():
    ci, co = 6, 5
    w = RNG.standard_normal((ci, co)).astype(np.float32)  # ours (I, O)
    u = RNG.standard_normal((co,)).astype(np.float32)
    u /= np.linalg.norm(u)
    p = {"w": jnp.asarray(w), "b": jnp.zeros((co,)), "u": jnp.asarray(u)}
    ours = np.asarray(_sn_params(p)["w"])  # (I, O)

    lin = torch_sn(nn.Linear(ci, co, bias=False))
    eff = _torch_effective_weight(lin, w.T.copy(), u)  # torch (O, I)
    np.testing.assert_allclose(ours, eff.T, atol=1e-5)


def test_conv_sigma_matches_torch():
    k, ci, co = 5, 4, 6
    w = RNG.standard_normal((k, ci, co)).astype(np.float32)  # ours (K, I, O)
    u = RNG.standard_normal((co,)).astype(np.float32)
    u /= np.linalg.norm(u)
    p = {"w": jnp.asarray(w), "b": jnp.zeros((co,)), "u": jnp.asarray(u)}
    ours = np.asarray(_sn_params(p)["w"])

    conv = torch_sn(nn.Conv1d(ci, co, kernel_size=k, bias=False))
    eff = _torch_effective_weight(conv, w.transpose(2, 1, 0).copy(), u)
    np.testing.assert_allclose(ours, eff.transpose(2, 1, 0), atol=1e-5)


def test_w2d_matches_torch_reshape():
    w = RNG.standard_normal((5, 4, 6)).astype(np.float32)
    ours = np.asarray(_w2d(jnp.asarray(w)))
    theirs = torch.from_numpy(w.transpose(2, 1, 0).copy()).reshape(6, -1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=0)


def test_decoder_sn_forward_and_update():
    cfg = DecoderConfig(
        c_in=8, c_cond=8, c_h=8, c_out=8, kernel_size=5,
        n_conv_blocks=2, upsample=(2, 1), sn=True,
    )
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    assert "u" in params["in_conv"]
    z = jnp.asarray(RNG.standard_normal((2, 8, 8)).astype(np.float32))
    cond = jnp.asarray(RNG.standard_normal((2, 8)).astype(np.float32))
    out = decoder_apply(params, cfg, z, cond)
    assert out.shape == (2, 16, 8)
    assert np.isfinite(np.asarray(out)).all()

    params2 = spectral_norm_update(params)
    assert not np.allclose(
        np.asarray(params["in_conv"]["u"]), np.asarray(params2["in_conv"]["u"])
    )
    # u stays unit-norm
    assert np.isclose(np.linalg.norm(np.asarray(params2["in_conv"]["u"])), 1.0, atol=1e-5)


def _convert_ref_decoder_sd(sd, n_blocks):
    """Reference Decoder state_dict (sn=True: weight_orig/weight_u keys) ->
    our decoder param tree, via the production converters."""
    from adaptive_voice_conversion_tpu.models.torch_import import _conv, _dense

    return {
        "in_conv": _conv(sd, "in_conv_layer"),
        "conv_blocks": [
            {
                "first": _conv(sd, f"first_conv_layers.{l}"),
                "second": _conv(sd, f"second_conv_layers.{l}"),
                "affine1": _dense(sd, f"conv_affine_layers.{2 * l}"),
                "affine2": _dense(sd, f"conv_affine_layers.{2 * l + 1}"),
            }
            for l in range(n_blocks)
        ],
        "out_conv": _conv(sd, "out_conv_layer"),
    }


def test_sn_training_trajectory_matches_torch():
    """Train the REFERENCE's own sn=True Decoder (torch spectral_norm,
    model.py:334) and ours for 20 steps on identical data from identical
    weights: per-step losses must agree to f32 tolerance. This pins the
    full sn training mechanics — in-forward power iteration (u persisted),
    sigma differentiable through W, Adam(amsgrad, wd) skipping the u
    buffer — not just the one-shot sigma."""
    import optax
    from adaptive_voice_conversion_tpu.models.reference_oracle import (
        load_reference_model_module,
    )
    from adaptive_voice_conversion_tpu.models.modules import (
        spectral_norm_update,
    )
    from adaptive_voice_conversion_tpu.core.config import OptimizerConfig
    from adaptive_voice_conversion_tpu.train.optim import make_optimizer

    mod = load_reference_model_module()
    torch.manual_seed(0)
    n_blocks = 2
    ref = mod.Decoder(
        c_in=4, c_cond=4, c_h=8, c_out=8, kernel_size=5,
        n_conv_blocks=n_blocks, upsample=[2, 1], act="relu", sn=True,
        dropout_rate=0.0,
    )
    ref.train()
    cfg = DecoderConfig(
        c_in=4, c_cond=4, c_h=8, c_out=8, kernel_size=5,
        n_conv_blocks=n_blocks, upsample=(2, 1), act="relu", sn=True,
        dropout_rate=0.0,
    )
    params = _convert_ref_decoder_sd(ref.state_dict(), n_blocks)
    assert "u" in params["in_conv"] and "u" in params["conv_blocks"][0]["affine1"]

    ocfg = OptimizerConfig()
    t_opt = torch.optim.Adam(
        ref.parameters(), lr=ocfg.lr, betas=(ocfg.beta1, ocfg.beta2),
        amsgrad=ocfg.amsgrad, weight_decay=ocfg.weight_decay,
    )
    opt = make_optimizer(ocfg, sn=True)
    opt_state = opt.init(params)

    rng_np = np.random.default_rng(3)
    z_all = rng_np.standard_normal((20, 2, 8, 4)).astype(np.float32)
    c_all = rng_np.standard_normal((20, 2, 4)).astype(np.float32)
    tgt_all = rng_np.standard_normal((20, 2, 16, 8)).astype(np.float32)

    def loss_fn(p, z, cond, tgt):
        out = decoder_apply(p, cfg, jnp.asarray(z), jnp.asarray(cond))
        return jnp.mean(jnp.abs(out - jnp.asarray(tgt)))

    @jax.jit
    def step(p, s, z, cond, tgt):
        loss, grads = jax.value_and_grad(loss_fn)(p, z, cond, tgt)
        updates, s = opt.update(grads, s, p)
        p = spectral_norm_update(p)  # same order as train/step.py
        p = optax.apply_updates(p, updates)
        return p, s, loss

    crit = torch.nn.L1Loss()
    for it in range(20):
        z_t = torch.from_numpy(z_all[it].transpose(0, 2, 1).copy())
        c_t = torch.from_numpy(c_all[it])
        tgt_t = torch.from_numpy(tgt_all[it].transpose(0, 2, 1).copy())
        out = ref(z_t, c_t)
        t_loss = crit(out, tgt_t)
        t_opt.zero_grad()
        t_loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), max_norm=5.0)
        t_opt.step()

        params, opt_state, loss = step(
            params, opt_state, z_all[it], c_all[it], tgt_all[it]
        )
        np.testing.assert_allclose(
            float(loss), float(t_loss), rtol=2e-4,
            err_msg=f"sn trajectory diverged at step {it}",
        )
    # u buffers tracked torch's power iteration too
    u_ours = np.asarray(params["in_conv"]["u"])
    u_ref = ref.state_dict()["in_conv_layer.weight_u"].numpy()
    np.testing.assert_allclose(u_ours, u_ref, atol=1e-3)


def test_sn_wired_into_production_step():
    """cfg.decoder.sn=True must update u inside the jitted training step
    (round-2 verdict: u was frozen at init — silently unfaithful)."""
    from dataclasses import replace
    from adaptive_voice_conversion_tpu.models import init_ae
    from adaptive_voice_conversion_tpu.train import make_train_step
    from test_train import TINY

    cfg = replace(TINY, model=replace(
        TINY.model, decoder=replace(TINY.model.decoder, sn=True)
    ))
    params = init_ae(jax.random.PRNGKey(0), cfg.model)
    u0 = np.asarray(params["decoder"]["in_conv"]["u"]).copy()
    init_fn, step = make_train_step(cfg)
    opt_state = init_fn(params)
    x = jnp.asarray(RNG.standard_normal(
        (2, cfg.data_loader.segment_size, cfg.model.speaker_encoder.c_in)
    ).astype(np.float32))
    params, opt_state, m = step(
        params, opt_state, x, jax.random.PRNGKey(1), jnp.float32(0.1)
    )
    u1 = np.asarray(params["decoder"]["in_conv"]["u"])
    assert not np.allclose(u0, u1), "u frozen: spectral_norm_update not wired"
    assert np.isclose(np.linalg.norm(u1), 1.0, atol=1e-5)
    assert np.isfinite(float(m["loss"]))
    # second step keeps iterating
    params2, _, _ = step(
        params, opt_state, x, jax.random.PRNGKey(2), jnp.float32(0.1)
    )
    assert not np.allclose(u1, np.asarray(params2["decoder"]["in_conv"]["u"]))


def test_sn_params_are_gradable():
    cfg = DecoderConfig(
        c_in=8, c_cond=8, c_h=8, c_out=8, kernel_size=5,
        n_conv_blocks=1, upsample=(1,), sn=True,
    )
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    z = jnp.asarray(RNG.standard_normal((1, 8, 8)).astype(np.float32))
    cond = jnp.asarray(RNG.standard_normal((1, 8)).astype(np.float32))

    def loss(p):
        return jnp.mean(jnp.abs(decoder_apply(p, cfg, z, cond)))

    g = jax.grad(loss)(params)
    gw = np.asarray(g["in_conv"]["w"])
    assert np.isfinite(gw).all() and np.abs(gw).sum() > 0
