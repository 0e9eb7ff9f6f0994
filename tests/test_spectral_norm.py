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
