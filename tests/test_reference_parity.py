"""Full-scale parity gate against the ACTUAL reference implementation.

Unlike test_models_parity.py (which compares against a re-stated
torch-functional oracle at toy dimensions), this file instantiates the
reference's own ``model.py`` (mounted read-only at /root/reference) at the
full shipped config (512 mels, c_h=128, 6 blocks — config.yaml:1-36),
exports its state_dict, converts through ``torch_import``, and asserts
per-module activation agreement plus the converted-mel north-star gate
(BASELINE.md: allclose atol 1e-4) — reference call path
inference.py:62-93 / model.py:373-395.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from adaptive_voice_conversion_tpu.core.config import config_from_dict
from adaptive_voice_conversion_tpu.models.ae import ae_inference, count_params
from adaptive_voice_conversion_tpu.models.modules import (
    content_encoder_apply,
    decoder_apply,
    speaker_encoder_apply,
)
from adaptive_voice_conversion_tpu.models.reference_oracle import (
    build_reference_ae,
)
from adaptive_voice_conversion_tpu.models.torch_import import (
    torch_state_dict_to_params,
)

torch = pytest.importorskip("torch")

ATOL = 1e-4
RTOL = 1e-4


TRAINED_CKPT = os.path.join(
    os.path.dirname(__file__), "golden", "trained_reference.ckpt"
)


@pytest.fixture(scope="module", params=["init", "trained"])
def full_scale(request):
    """Reference AE (full config) + converted JAX params, at BOTH weight
    regimes: seeded default init AND weights trained by the reference's
    own trainer (tools/train_reference_weights.py — round-4 verdict item
    1: trained weights have saturated INs / large AdaIN affines, exactly
    where eps/edge semantics bite; init-only parity misses that regime).
    The trained fixture (~36 MB, deterministic to regenerate) is not
    committed; the battery skips that half when it is absent."""
    if request.param == "trained":
        if not os.path.exists(TRAINED_CKPT):
            pytest.skip(
                "trained_reference.ckpt absent — generate with "
                "python -m adaptive_voice_conversion_tpu.tools."
                "train_reference_weights"
            )
        ae, raw = build_reference_ae(seed=7, ckpt_path=TRAINED_CKPT)
    else:
        ae, raw = build_reference_ae(seed=7)
    cfg = config_from_dict(raw).model
    params = torch_state_dict_to_params(ae.state_dict(), cfg)
    return ae, cfg, params


def _mk_input(seed, b, t, c=512):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, c, t).astype(np.float32)
    return torch.from_numpy(x), jnp.asarray(x.transpose(0, 2, 1))


def test_param_count_matches_reference(full_scale):
    ae, cfg, params = full_scale
    n_torch = sum(p.numel() for p in ae.parameters())
    assert count_params(params) == n_torch == 9_040_512


def test_speaker_encoder_full_config(full_scale):
    ae, cfg, params = full_scale
    xt, xj = _mk_input(1, 2, 128)
    with torch.no_grad():
        ref = ae.speaker_encoder(xt).numpy()
    got = np.asarray(
        speaker_encoder_apply(params["speaker_encoder"], cfg.speaker_encoder, xj)
    )
    np.testing.assert_allclose(got, ref, atol=ATOL, rtol=RTOL)


def test_content_encoder_full_config(full_scale):
    ae, cfg, params = full_scale
    xt, xj = _mk_input(2, 2, 128)
    with torch.no_grad():
        mu_t, ls_t = ae.content_encoder(xt)
    mu, ls = content_encoder_apply(params["content_encoder"], cfg.content_encoder, xj)
    np.testing.assert_allclose(
        np.asarray(mu).transpose(0, 2, 1), mu_t.numpy(), atol=ATOL, rtol=RTOL
    )
    np.testing.assert_allclose(
        np.asarray(ls).transpose(0, 2, 1), ls_t.numpy(), atol=ATOL, rtol=RTOL
    )


def test_decoder_full_config(full_scale):
    ae, cfg, params = full_scale
    rng = np.random.RandomState(3)
    z = rng.randn(2, 128, 16).astype(np.float32)
    cond = rng.randn(2, 128).astype(np.float32)
    with torch.no_grad():
        ref = ae.decoder(torch.from_numpy(z), torch.from_numpy(cond)).numpy()
    got = decoder_apply(
        params["decoder"],
        cfg.decoder,
        jnp.asarray(z.transpose(0, 2, 1)),
        jnp.asarray(cond),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), ref, atol=ATOL, rtol=RTOL
    )


def test_converted_mel_allclose_training_shape(full_scale):
    """North-star gate at the training segment shape (B=2, T=128)."""
    ae, cfg, params = full_scale
    st, sj = _mk_input(4, 2, 128)
    tt, tj = _mk_input(5, 2, 128)
    with torch.no_grad():
        ref = ae.inference(st, tt).numpy()
    got = np.asarray(ae_inference(params, cfg, sj, tj)).transpose(0, 2, 1)
    np.testing.assert_allclose(got, ref, atol=ATOL, rtol=RTOL)


def test_converted_mel_allclose_utterance_shape(full_scale):
    """North-star gate at a realistic full-utterance length (T=435, i.e.
    ~5.4 s at hop 300 / 24 kHz — not a multiple of the x8 downsample), the
    shape inference.py:54-65 actually feeds the model."""
    ae, cfg, params = full_scale
    st, sj = _mk_input(6, 1, 435)
    tt, tj = _mk_input(7, 1, 289)
    with torch.no_grad():
        ref = ae.inference(st, tt).numpy()
    got = np.asarray(ae_inference(params, cfg, sj, tj)).transpose(0, 2, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=ATOL, rtol=RTOL)


def test_converted_mel_realistic_inputs(full_scale):
    """North-star gate on REALISTIC mel-statistics inputs (z-normalized
    structured segments like training data) — random-normal probes don't
    drive trained INs/AdaINs through their operating range; this does."""
    from adaptive_voice_conversion_tpu.tools.loss_trajectory import (
        synthetic_segments,
    )

    ae, cfg, params = full_scale
    pool = synthetic_segments(4, 200, 512, seed=11)
    pool = (pool - pool.mean()) / max(pool.std(), 1e-6)
    st = torch.from_numpy(pool[:2].transpose(0, 2, 1))
    tt = torch.from_numpy(pool[2:].transpose(0, 2, 1))
    with torch.no_grad():
        ref = ae.inference(st, tt).numpy()
    got = np.asarray(
        ae_inference(params, cfg, jnp.asarray(pool[:2]), jnp.asarray(pool[2:]))
    ).transpose(0, 2, 1)
    np.testing.assert_allclose(got, ref, atol=ATOL, rtol=RTOL)


def test_inferencer_from_torch_checkpoint_user_journey():
    """The migration path a reference user actually takes: point
    Inferencer.from_torch_checkpoint at a torch .ckpt file (here the
    trained fixture standing in for vctk_model.ckpt) and convert — the
    result must match the reference's own AE.inference on the same file."""
    if not os.path.exists(TRAINED_CKPT):
        pytest.skip("trained_reference.ckpt absent")
    import pickle
    import tempfile

    from adaptive_voice_conversion_tpu.core.config import config_from_dict
    from adaptive_voice_conversion_tpu.infer.inferencer import Inferencer
    from adaptive_voice_conversion_tpu.models.reference_oracle import (
        load_reference_config,
    )

    raw = load_reference_config()
    cfg = config_from_dict(raw)
    attr = {
        "mean": np.full(512, 0.3, np.float32),
        "std": np.full(512, 0.5, np.float32),
    }
    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        pickle.dump(attr, f)
        attr_path = f.name
    inf = Inferencer.from_torch_checkpoint(cfg, TRAINED_CKPT, attr_path)

    ae, _ = build_reference_ae(seed=7, ckpt_path=TRAINED_CKPT)
    rng = np.random.RandomState(21)
    src = rng.randn(200, 512).astype(np.float32)
    tar = rng.randn(144, 512).astype(np.float32)
    got = inf.convert_mel(src, tar)  # (T', 512) channels-last
    with torch.no_grad():
        ref = ae.inference(
            torch.from_numpy(src.T[None]), torch.from_numpy(tar.T[None])
        )[0].numpy().T
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=ATOL, rtol=RTOL)


def test_speaker_embeddings_entrypoint(full_scale):
    """model.py:393-395 get_speaker_embeddings parity on a long utterance."""
    ae, cfg, params = full_scale
    xt, xj = _mk_input(8, 3, 517)
    with torch.no_grad():
        ref = ae.get_speaker_embeddings(xt).numpy()
    got = np.asarray(
        speaker_encoder_apply(params["speaker_encoder"], cfg.speaker_encoder, xj)
    )
    np.testing.assert_allclose(got, ref, atol=ATOL, rtol=RTOL)
