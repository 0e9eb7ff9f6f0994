"""Op-level parity tests vs PyTorch functional ops.

Each op must reproduce the exact torch semantics the reference relies on
(SURVEY.md §7 "fidelity traps"): reflect-pad asymmetry for even kernels,
InstanceNorm1d eps/axis, pixel_shuffle_1d interleave, ceil-mode avg pooling,
nearest upsampling. Oracles are plain torch.nn.functional calls — layouts are
converted at the test boundary (torch (B,C,T) <-> ours (B,T,C)).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from adaptive_voice_conversion_tpu.ops import (
    adain,
    avg_pool_time_ceil,
    conv1d,
    conv_bank,
    instance_norm_time,
    pixel_shuffle_time,
    reflect_pad_time,
    upsample_nearest_time,
    global_avg_pool_time,
)
from adaptive_voice_conversion_tpu.ops.padding import conv_pad_amounts

RNG = np.random.default_rng(0)


def t_nct(x_ntc):
    """ours (B,T,C) -> torch (B,C,T)"""
    return torch.from_numpy(np.asarray(x_ntc)).transpose(1, 2).contiguous()


def to_ntc(x_torch):
    return x_torch.detach().numpy().transpose(0, 2, 1)


def torch_pad_conv(x_nct, w_oik, b, stride=1):
    """Reference pad_layer semantics (model.py:21-32) with F.conv1d."""
    k = w_oik.shape[-1]
    if k % 2 == 0:
        pad = (k // 2, k // 2 - 1)
    else:
        pad = (k // 2, k // 2)
    xp = F.pad(x_nct, pad, mode="reflect") if max(pad) > 0 else x_nct
    return F.conv1d(xp, w_oik, b, stride=stride)


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 7, 8])
def test_conv_pad_amounts(k):
    l, r = conv_pad_amounts(k)
    if k % 2 == 0:
        assert (l, r) == (k // 2, k // 2 - 1)
    else:
        assert (l, r) == (k // 2, k // 2)


def test_reflect_pad_matches_torch():
    x = RNG.standard_normal((2, 16, 4)).astype(np.float32)
    ours = reflect_pad_time(jnp.asarray(x), 4, 3)
    theirs = F.pad(t_nct(x), (4, 3), mode="reflect")
    np.testing.assert_allclose(np.asarray(ours), to_ntc(theirs), atol=1e-6)


@pytest.mark.parametrize("k,stride", [(1, 1), (2, 1), (5, 1), (5, 2), (8, 1), (4, 2)])
def test_conv1d_matches_torch(k, stride):
    b, t, ci, co = 2, 24, 6, 5
    x = RNG.standard_normal((b, t, ci)).astype(np.float32)
    w = RNG.standard_normal((k, ci, co)).astype(np.float32) * 0.1
    bias = RNG.standard_normal((co,)).astype(np.float32)
    ours = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), stride=stride)
    w_t = torch.from_numpy(w.transpose(2, 1, 0).copy())
    theirs = torch_pad_conv(t_nct(x), w_t, torch.from_numpy(bias), stride=stride)
    np.testing.assert_allclose(np.asarray(ours), to_ntc(theirs), atol=1e-4)


def test_instance_norm_matches_torch():
    x = RNG.standard_normal((3, 17, 8)).astype(np.float32) * 3 + 1
    ours = instance_norm_time(jnp.asarray(x))
    theirs = F.instance_norm(t_nct(x), eps=1e-5)
    np.testing.assert_allclose(np.asarray(ours), to_ntc(theirs), atol=1e-5)


def test_adain_matches_torch_append_cond():
    b, t, c = 2, 9, 4
    x = RNG.standard_normal((b, t, c)).astype(np.float32)
    cond = RNG.standard_normal((b, 2 * c)).astype(np.float32)
    ours = adain(jnp.asarray(x), jnp.asarray(cond))
    # append_cond (model.py:77-83): x * std.unsqueeze(2) + mean.unsqueeze(2)
    xt = t_nct(x)
    ct = torch.from_numpy(cond)
    mean, std = ct[:, :c], ct[:, c:]
    theirs = xt * std.unsqueeze(2) + mean.unsqueeze(2)
    np.testing.assert_allclose(np.asarray(ours), to_ntc(theirs), atol=1e-6)


@pytest.mark.parametrize("scale", [2, 3])
def test_pixel_shuffle_matches_torch(scale):
    b, t, c = 2, 7, 4
    x = RNG.standard_normal((b, t, c * scale)).astype(np.float32)
    ours = pixel_shuffle_time(jnp.asarray(x), scale)
    # pixel_shuffle_1d semantics (model.py:52-59)
    xt = t_nct(x)  # (B, C*r, T)
    v = xt.view(b, c, scale, t).permute(0, 1, 3, 2).contiguous().view(b, c, t * scale)
    np.testing.assert_allclose(np.asarray(ours), to_ntc(v), atol=1e-6)


@pytest.mark.parametrize("t,k", [(128, 2), (7, 2), (5, 2), (9, 4), (16, 2)])
def test_avg_pool_ceil_matches_torch(t, k):
    x = RNG.standard_normal((2, t, 3)).astype(np.float32)
    ours = avg_pool_time_ceil(jnp.asarray(x), k)
    theirs = F.avg_pool1d(t_nct(x), kernel_size=k, ceil_mode=True)
    np.testing.assert_allclose(np.asarray(ours), to_ntc(theirs), atol=1e-6)


@pytest.mark.parametrize("scale", [2, 3])
def test_upsample_nearest_matches_torch(scale):
    x = RNG.standard_normal((2, 6, 3)).astype(np.float32)
    ours = upsample_nearest_time(jnp.asarray(x), scale)
    theirs = F.interpolate(t_nct(x), scale_factor=scale, mode="nearest")
    np.testing.assert_allclose(np.asarray(ours), to_ntc(theirs), atol=1e-6)


def test_global_avg_pool_matches_adaptive():
    x = RNG.standard_normal((2, 13, 5)).astype(np.float32)
    ours = global_avg_pool_time(jnp.asarray(x))
    theirs = F.adaptive_avg_pool1d(t_nct(x), 1).squeeze(2)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6)


def test_fused_conv_bank_matches_per_kernel_torch():
    """The single fused K=8 conv must equal 8 separate torch convs + concat
    (reference conv_bank, model.py:85-91)."""
    b, t, ci, cb = 2, 32, 8, 4
    kernel_sizes = list(range(1, 9))
    x = RNG.standard_normal((b, t, ci)).astype(np.float32)
    ws = [RNG.standard_normal((k, ci, cb)).astype(np.float32) * 0.2 for k in kernel_sizes]
    bs = [RNG.standard_normal((cb,)).astype(np.float32) for _ in kernel_sizes]

    ours = conv_bank(
        jnp.asarray(x), [jnp.asarray(w) for w in ws], [jnp.asarray(v) for v in bs],
        kernel_sizes, jnp.maximum if False else (lambda y: jnp.maximum(y, 0)),
    )

    xt = t_nct(x)
    outs = []
    for w, bias, k in zip(ws, bs, kernel_sizes):
        w_t = torch.from_numpy(w.transpose(2, 1, 0).copy())
        outs.append(torch.relu(torch_pad_conv(xt, w_t, torch.from_numpy(bias))))
    theirs = torch.cat(outs + [xt], dim=1)
    np.testing.assert_allclose(np.asarray(ours), to_ntc(theirs), atol=1e-4)


def test_fused_conv_bank_with_scale_2():
    """bank_scale=2 => kernels 2,4,6,8 only (model.py:223-225)."""
    b, t, ci, cb = 1, 16, 4, 3
    kernel_sizes = [2, 4, 6, 8]
    x = RNG.standard_normal((b, t, ci)).astype(np.float32)
    ws = [RNG.standard_normal((k, ci, cb)).astype(np.float32) for k in kernel_sizes]
    bs = [np.zeros((cb,), np.float32) for _ in kernel_sizes]
    ours = conv_bank(
        jnp.asarray(x), [jnp.asarray(w) for w in ws], [jnp.asarray(v) for v in bs],
        kernel_sizes, lambda y: jnp.maximum(y, 0),
    )
    xt = t_nct(x)
    outs = []
    for w, bias, k in zip(ws, bs, kernel_sizes):
        w_t = torch.from_numpy(w.transpose(2, 1, 0).copy())
        outs.append(torch.relu(torch_pad_conv(xt, w_t, torch.from_numpy(bias))))
    theirs = torch.cat(outs + [xt], dim=1)
    np.testing.assert_allclose(np.asarray(ours), to_ntc(theirs), atol=1e-4)


def test_dual_conv_bank_matches_two_single_banks():
    """ae_forward's shared dual-bank evaluation (ops/conv.py
    dual_conv_bank) must be bit-identical to the two per-encoder banks
    for every group size."""
    from adaptive_voice_conversion_tpu.ops.conv import dual_conv_bank

    b, t, ci, cb = 2, 32, 8, 4
    kernel_sizes = list(range(1, 9))
    x = RNG.standard_normal((b, t, ci)).astype(np.float32)

    def mk_bank():
        ws = [RNG.standard_normal((k, ci, cb)).astype(np.float32) * 0.2
              for k in kernel_sizes]
        bs = [RNG.standard_normal((cb,)).astype(np.float32)
              for _ in kernel_sizes]
        return [jnp.asarray(w) for w in ws], [jnp.asarray(v) for v in bs]

    ws_a, bs_a = mk_bank()
    ws_b, bs_b = mk_bank()
    relu = lambda y: jnp.maximum(y, 0)
    lrelu = lambda y: jnp.where(y > 0, y, 0.01 * y)

    for gs in (1, 2, 4, 8):
        ref_a = conv_bank(jnp.asarray(x), ws_a, bs_a, kernel_sizes, relu,
                          group_size=gs)
        ref_b = conv_bank(jnp.asarray(x), ws_b, bs_b, kernel_sizes, lrelu,
                          group_size=gs)
        out_a, out_b = dual_conv_bank(
            jnp.asarray(x), ((ws_a, bs_a), (ws_b, bs_b)), kernel_sizes,
            (relu, lrelu), group_size=gs,
        )
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(ref_a))
        np.testing.assert_array_equal(np.asarray(out_b), np.asarray(ref_b))


def test_ae_forward_matches_standalone_encoders():
    """ae_forward (per-encoder banks — the dual-bank experiment was
    rejected, see models/ae.py docstring) must agree with calling the two
    encoders standalone."""
    import jax
    from adaptive_voice_conversion_tpu.core.config import AEConfig
    from adaptive_voice_conversion_tpu.models import (
        ae_forward,
        init_ae,
    )
    from adaptive_voice_conversion_tpu.models.modules import (
        content_encoder_apply,
        speaker_encoder_apply,
    )

    cfg = AEConfig()
    from test_train import TINY

    cfg = TINY.model
    params = init_ae(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(RNG.standard_normal((2, 16, 8)).astype(np.float32))
    rng = jax.random.PRNGKey(1)
    mu, ls, emb, dec = ae_forward(params, cfg, x, rng)
    emb_ref = speaker_encoder_apply(
        params["speaker_encoder"], cfg.speaker_encoder, x
    )
    mu_ref, ls_ref = content_encoder_apply(
        params["content_encoder"], cfg.content_encoder, x
    )
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(ls_ref), atol=1e-6)


def test_conv_bank_in_matches_concat_then_conv1d():
    """conv_bank_in (fused bank + split 1x1, no concat tensor) must equal
    conv_bank -> conv1d up to float re-association of the 1536-row dot."""
    import jax

    from adaptive_voice_conversion_tpu.ops import conv1d, conv_bank, conv_bank_in

    rng = np.random.default_rng(0)
    B, T, C_IN, C_BANK, C_H = 3, 16, 24, 8, 12
    ks = [1, 2, 3, 4]
    bank_ws = [
        jnp.asarray(rng.standard_normal((k, C_IN, C_BANK)).astype(np.float32))
        for k in ks
    ]
    bank_bs = [
        jnp.asarray(rng.standard_normal(C_BANK).astype(np.float32)) for _ in ks
    ]
    c_total = C_BANK * len(ks) + C_IN
    w_in = jnp.asarray(
        rng.standard_normal((1, c_total, C_H)).astype(np.float32)
    )
    b_in = jnp.asarray(rng.standard_normal(C_H).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((B, T, C_IN)).astype(np.float32))
    act = jax.nn.relu

    ref = conv1d(conv_bank(x, bank_ws, bank_bs, ks, act), w_in, b_in)
    fused = conv_bank_in(x, bank_ws, bank_bs, ks, act, w_in, b_in)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(fused), rtol=1e-5, atol=1e-5
    )
