"""Full-module parity tests vs a functional PyTorch oracle.

The oracle re-states the reference forward passes (SpeakerEncoder
model.py:265-277, ContentEncoder model.py:301-323, Decoder model.py:347-371)
directly with torch.nn.functional calls, consuming OUR parameters converted
to torch layout. If our JAX modules and the oracle agree for random params
and random inputs, and the torch_import converter round-trips layouts, then
loading the real ``vctk_model.ckpt`` reproduces reference activations.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from adaptive_voice_conversion_tpu.core.config import (
    AEConfig,
    ContentEncoderConfig,
    DecoderConfig,
    SpeakerEncoderConfig,
)
from adaptive_voice_conversion_tpu.models import (
    ae_inference,
    content_encoder_apply,
    decoder_apply,
    init_ae,
    init_content_encoder,
    init_decoder,
    init_speaker_encoder,
    speaker_encoder_apply,
    torch_state_dict_to_params,
)

RNG = np.random.default_rng(42)

# small configs: fast, still exercise bank fusion / stride / upsample paths
SE_CFG = SpeakerEncoderConfig(
    c_in=16, c_h=8, c_out=8, kernel_size=5, bank_size=8, bank_scale=1, c_bank=4,
    n_conv_blocks=3, n_dense_blocks=2, subsample=(1, 2, 2), act="relu", dropout_rate=0.0,
)
CE_CFG = ContentEncoderConfig(
    c_in=16, c_h=8, c_out=8, kernel_size=5, bank_size=8, bank_scale=1, c_bank=4,
    n_conv_blocks=3, subsample=(1, 2, 2), act="relu", dropout_rate=0.0,
)
DE_CFG = DecoderConfig(
    c_in=8, c_cond=8, c_h=8, c_out=16, kernel_size=5,
    n_conv_blocks=3, upsample=(2, 1, 2), act="relu", sn=False, dropout_rate=0.0,
)


# ---------------------------------------------------------------------------
# torch-side helpers consuming our param layout
# ---------------------------------------------------------------------------


def tw_conv(p):
    """our (K, I, O) -> torch (O, I, K)"""
    return torch.from_numpy(np.asarray(p["w"]).transpose(2, 1, 0).copy()), torch.from_numpy(
        np.asarray(p["b"]).copy()
    )


def tw_dense(p):
    return torch.from_numpy(np.asarray(p["w"]).T.copy()), torch.from_numpy(
        np.asarray(p["b"]).copy()
    )


def pad_conv(x, p, stride=1):
    w, b = tw_conv(p)
    k = w.shape[-1]
    pad = (k // 2, k // 2 - 1) if k % 2 == 0 else (k // 2, k // 2)
    if max(pad) > 0:
        x = F.pad(x, pad, mode="reflect")
    return F.conv1d(x, w, b, stride=stride)


def lin(x, p):
    w, b = tw_dense(p)
    return F.linear(x, w, b)


def oracle_bank(x, bank_params, kernel_sizes):
    outs = [torch.relu(pad_conv(x, p)) for p in bank_params]
    return torch.cat(outs + [x], dim=1)


def inorm(x):
    return F.instance_norm(x, eps=1e-5)


def oracle_speaker_encoder(params, cfg, x):
    ks = list(range(cfg.bank_scale, cfg.bank_size + 1, cfg.bank_scale))
    out = oracle_bank(x, params["conv_bank"], ks)
    out = torch.relu(pad_conv(out, params["in_conv"]))
    for l in range(cfg.n_conv_blocks):
        sub = cfg.subsample[l]
        y = torch.relu(pad_conv(out, params["conv_blocks"][l]["first"]))
        y = torch.relu(pad_conv(y, params["conv_blocks"][l]["second"], stride=sub))
        if sub > 1:
            out = F.avg_pool1d(out, kernel_size=sub, ceil_mode=True)
        out = y + out
    out = F.adaptive_avg_pool1d(out, 1).squeeze(2)
    for l in range(cfg.n_dense_blocks):
        y = torch.relu(lin(out, params["dense_blocks"][l]["first"]))
        y = torch.relu(lin(y, params["dense_blocks"][l]["second"]))
        out = y + out
    return lin(out, params["output"])


def oracle_content_encoder(params, cfg, x):
    ks = list(range(cfg.bank_scale, cfg.bank_size + 1, cfg.bank_scale))
    out = oracle_bank(x, params["conv_bank"], ks)
    out = torch.relu(inorm(pad_conv(out, params["in_conv"])))
    for l in range(cfg.n_conv_blocks):
        sub = cfg.subsample[l]
        y = torch.relu(inorm(pad_conv(out, params["conv_blocks"][l]["first"])))
        y = torch.relu(inorm(pad_conv(y, params["conv_blocks"][l]["second"], stride=sub)))
        if sub > 1:
            out = F.avg_pool1d(out, kernel_size=sub, ceil_mode=True)
        out = y + out
    return pad_conv(out, params["mean"]), pad_conv(out, params["std"])


def oracle_append_cond(x, cond):
    c = cond.shape[1] // 2
    return x * cond[:, c:].unsqueeze(2) + cond[:, :c].unsqueeze(2)


def oracle_pixel_shuffle(x, r):
    b, cr, t = x.shape
    c = cr // r
    return x.view(b, c, r, t).permute(0, 1, 3, 2).contiguous().view(b, c, t * r)


def oracle_decoder(params, cfg, z, cond):
    out = torch.relu(inorm(pad_conv(z, params["in_conv"])))
    for l in range(cfg.n_conv_blocks):
        up = cfg.upsample[l]
        blk = params["conv_blocks"][l]
        y = inorm(pad_conv(out, blk["first"]))
        y = torch.relu(oracle_append_cond(y, lin(cond, blk["affine1"])))
        y = pad_conv(y, blk["second"])
        if up > 1:
            y = oracle_pixel_shuffle(y, up)
        y = inorm(y)
        y = torch.relu(oracle_append_cond(y, lin(cond, blk["affine2"])))
        if up > 1:
            out = y + F.interpolate(out, scale_factor=up, mode="nearest")
        else:
            out = y + out
    return pad_conv(out, params["out_conv"])


def to_torch_nct(x_ntc):
    return torch.from_numpy(np.asarray(x_ntc)).transpose(1, 2).contiguous()


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("t", [32, 33])  # 33: odd length exercises ceil paths
def test_speaker_encoder_parity(t):
    key = jax.random.PRNGKey(0)
    params = init_speaker_encoder(key, SE_CFG)
    x = RNG.standard_normal((2, t, SE_CFG.c_in)).astype(np.float32)
    ours = speaker_encoder_apply(params, SE_CFG, jnp.asarray(x))
    theirs = oracle_speaker_encoder(params, SE_CFG, to_torch_nct(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-4)


@pytest.mark.parametrize("t", [32, 33])
def test_content_encoder_parity(t):
    key = jax.random.PRNGKey(1)
    params = init_content_encoder(key, CE_CFG)
    x = RNG.standard_normal((2, t, CE_CFG.c_in)).astype(np.float32)
    mu, ls = content_encoder_apply(params, CE_CFG, jnp.asarray(x))
    tmu, tls = oracle_content_encoder(params, CE_CFG, to_torch_nct(x))
    np.testing.assert_allclose(np.asarray(mu), tmu.numpy().transpose(0, 2, 1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ls), tls.numpy().transpose(0, 2, 1), atol=2e-4)


def test_decoder_parity():
    key = jax.random.PRNGKey(2)
    params = init_decoder(key, DE_CFG)
    z = RNG.standard_normal((2, 8, DE_CFG.c_in)).astype(np.float32)
    cond = RNG.standard_normal((2, DE_CFG.c_cond)).astype(np.float32)
    ours = decoder_apply(params, DE_CFG, jnp.asarray(z), jnp.asarray(cond))
    theirs = oracle_decoder(params, DE_CFG, to_torch_nct(z), torch.from_numpy(cond))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy().transpose(0, 2, 1), atol=2e-4
    )


def test_ae_inference_parity_via_torch_import():
    """Round-trip: build torch-layout state_dict from our params, convert back
    with torch_state_dict_to_params, run inference — must equal direct
    oracle composition (inference path, model.py:387-391)."""
    cfg = AEConfig(speaker_encoder=SE_CFG, content_encoder=CE_CFG, decoder=DE_CFG)
    params = init_ae(jax.random.PRNGKey(3), cfg)

    # build a reference-style state_dict from our params
    sd = {}

    def put_conv(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).transpose(2, 1, 0)
        sd[f"{name}.bias"] = np.asarray(p["b"])

    def put_dense(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).T
        sd[f"{name}.bias"] = np.asarray(p["b"])

    se = params["speaker_encoder"]
    for i, p in enumerate(se["conv_bank"]):
        put_conv(f"speaker_encoder.conv_bank.{i}", p)
    put_conv("speaker_encoder.in_conv_layer", se["in_conv"])
    for l, blk in enumerate(se["conv_blocks"]):
        put_conv(f"speaker_encoder.first_conv_layers.{l}", blk["first"])
        put_conv(f"speaker_encoder.second_conv_layers.{l}", blk["second"])
    for l, blk in enumerate(se["dense_blocks"]):
        put_dense(f"speaker_encoder.first_dense_layers.{l}", blk["first"])
        put_dense(f"speaker_encoder.second_dense_layers.{l}", blk["second"])
    put_dense("speaker_encoder.output_layer", se["output"])

    ce = params["content_encoder"]
    for i, p in enumerate(ce["conv_bank"]):
        put_conv(f"content_encoder.conv_bank.{i}", p)
    put_conv("content_encoder.in_conv_layer", ce["in_conv"])
    for l, blk in enumerate(ce["conv_blocks"]):
        put_conv(f"content_encoder.first_conv_layers.{l}", blk["first"])
        put_conv(f"content_encoder.second_conv_layers.{l}", blk["second"])
    put_conv("content_encoder.mean_layer", ce["mean"])
    put_conv("content_encoder.std_layer", ce["std"])

    de = params["decoder"]
    put_conv("decoder.in_conv_layer", de["in_conv"])
    for l, blk in enumerate(de["conv_blocks"]):
        put_conv(f"decoder.first_conv_layers.{l}", blk["first"])
        put_conv(f"decoder.second_conv_layers.{l}", blk["second"])
        put_dense(f"decoder.conv_affine_layers.{2 * l}", blk["affine1"])
        put_dense(f"decoder.conv_affine_layers.{2 * l + 1}", blk["affine2"])
    put_conv("decoder.out_conv_layer", de["out_conv"])

    params2 = torch_state_dict_to_params(sd, cfg)

    x = RNG.standard_normal((1, 32, SE_CFG.c_in)).astype(np.float32)
    x_cond = RNG.standard_normal((1, 24, SE_CFG.c_in)).astype(np.float32)
    out1 = ae_inference(params, cfg, jnp.asarray(x), jnp.asarray(x_cond))
    out2 = ae_inference(params2, cfg, jnp.asarray(x), jnp.asarray(x_cond))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    # and vs the torch oracle composition
    emb = oracle_speaker_encoder(se, SE_CFG, to_torch_nct(x_cond))
    mu, _ = oracle_content_encoder(ce, CE_CFG, to_torch_nct(x))
    dec = oracle_decoder(de, DE_CFG, mu, emb)
    np.testing.assert_allclose(
        np.asarray(out1), dec.numpy().transpose(0, 2, 1), atol=2e-4
    )


def test_full_config_shapes():
    """Default (paper) config: x (B,128,512) -> content (B,16,128), mel out
    (B,128,512); speaker emb (B,128)."""
    cfg = AEConfig()
    params = init_ae(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(RNG.standard_normal((2, 128, 512)).astype(np.float32))
    from adaptive_voice_conversion_tpu.models import ae_forward, count_params

    mu, log_sigma, emb, dec = ae_forward(params, cfg, x, jax.random.PRNGKey(1))
    assert mu.shape == (2, 16, 128)
    assert log_sigma.shape == (2, 16, 128)
    assert emb.shape == (2, 128)
    assert dec.shape == (2, 128, 512)
    # sanity: parameter count matches the reference AE exactly (9,040,512 =
    # sum of torch state_dict numel for the default config.yaml)
    n = count_params(params)
    assert n == 9_040_512


def test_dropout_active_when_not_deterministic():
    cfg = SpeakerEncoderConfig(
        c_in=8, c_h=8, c_out=4, kernel_size=5, bank_size=4, bank_scale=1, c_bank=4,
        n_conv_blocks=1, n_dense_blocks=1, subsample=(1,), act="relu", dropout_rate=0.5,
    )
    params = init_speaker_encoder(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(RNG.standard_normal((2, 16, 8)).astype(np.float32))
    a = speaker_encoder_apply(params, cfg, x, deterministic=True)
    b = speaker_encoder_apply(
        params, cfg, x, dropout_key=jax.random.PRNGKey(7), deterministic=False
    )
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_torch_export_roundtrip(tmp_path):
    """params -> torch ckpt -> params is the identity (and the ckpt loads
    with plain torch.load)."""
    import torch

    from adaptive_voice_conversion_tpu.models import (
        save_torch_checkpoint,
        torch_state_dict_to_params,
    )

    cfg = AEConfig(speaker_encoder=SE_CFG, content_encoder=CE_CFG, decoder=DE_CFG)
    params = init_ae(jax.random.PRNGKey(9), cfg)
    path = str(tmp_path / "export.ckpt")
    save_torch_checkpoint(params, cfg, path)
    sd = torch.load(path, weights_only=True)
    params2 = torch_state_dict_to_params(sd, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lrelu_and_bank_scale_2_parity():
    """Non-default config knobs: act='lrelu' (slope 0.01) and bank_scale=2
    (kernels 2,4,6,8) against the torch oracle."""
    cfg = SpeakerEncoderConfig(
        c_in=16, c_h=8, c_out=8, kernel_size=5, bank_size=8, bank_scale=2,
        c_bank=4, n_conv_blocks=2, n_dense_blocks=1, subsample=(1, 2),
        act="lrelu", dropout_rate=0.0,
    )
    params = init_speaker_encoder(jax.random.PRNGKey(5), cfg)
    x = RNG.standard_normal((2, 32, 16)).astype(np.float32)
    ours = speaker_encoder_apply(params, cfg, jnp.asarray(x))

    # torch oracle with leaky relu
    act = lambda v: F.leaky_relu(v, 0.01)
    xt = to_torch_nct(x)
    ks = list(range(2, 9, 2))
    outs = [act(pad_conv(xt, p)) for p in params["conv_bank"]]
    out = torch.cat(outs + [xt], dim=1)
    out = act(pad_conv(out, params["in_conv"]))
    for l in range(2):
        sub = cfg.subsample[l]
        y = act(pad_conv(out, params["conv_blocks"][l]["first"]))
        y = act(pad_conv(y, params["conv_blocks"][l]["second"], stride=sub))
        if sub > 1:
            out = F.avg_pool1d(out, kernel_size=sub, ceil_mode=True)
        out = y + out
    out = F.adaptive_avg_pool1d(out, 1).squeeze(2)
    for l in range(1):
        y = act(lin(out, params["dense_blocks"][l]["first"]))
        y = act(lin(y, params["dense_blocks"][l]["second"]))
        out = y + out
    theirs = lin(out, params["output"])
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-4)
