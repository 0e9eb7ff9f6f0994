"""Length-masked ragged-batch exactness (round-3 verdict item 1).

Pins that the masked ops / model applies / Griffin-Lim produce, per sample
of a mixed-length padded batch, exactly what the unmasked path produces on
that sample alone at its true length — and that the flagship batched
``convert_grid`` serving path equals per-pair ``inference_one_utterance``.
"""

import dataclasses
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_voice_conversion_tpu.core.config import SignalConfig, TrainConfig
from adaptive_voice_conversion_tpu.models import modules as M
from adaptive_voice_conversion_tpu.models import masked as MM
from adaptive_voice_conversion_tpu.models.ae import ae_inference, init_ae
from adaptive_voice_conversion_tpu.ops import (
    avg_pool_time_ceil,
    conv1d,
    instance_norm_time,
    reflect_pad_time,
)
from adaptive_voice_conversion_tpu.ops.masked import (
    avg_pool_time_ceil_masked,
    conv1d_masked,
    instance_norm_time_masked,
    reflect_pad_time_masked,
)

from test_e2e import TINY, N_MELS


def _ragged_batch(rng, lens, t, c):
    xs = [rng.standard_normal((L, c)).astype(np.float32) for L in lens]
    xb = np.stack([np.pad(x, ((0, t - x.shape[0]), (0, 0))) for x in xs])
    return xs, jnp.asarray(xb), jnp.asarray(np.array(lens, np.int32))


def test_reflect_pad_masked_matches_per_sample():
    rng = np.random.default_rng(0)
    lens = [11, 17, 8]
    xs, xb, ls = _ragged_batch(rng, lens, 17, 3)
    out = np.asarray(reflect_pad_time_masked(xb, ls, 4, 3))
    for i, L in enumerate(lens):
        ref = np.asarray(reflect_pad_time(jnp.asarray(xs[i][None]), 4, 3))[0]
        np.testing.assert_array_equal(out[i, : L + 7], ref)


@pytest.mark.parametrize("k,stride", [(5, 1), (5, 2), (8, 1), (4, 2), (1, 1)])
def test_conv1d_masked_matches_per_sample(k, stride):
    rng = np.random.default_rng(1)
    lens = [19, 32, 25]
    xs, xb, ls = _ragged_batch(rng, lens, 32, 6)
    w = jnp.asarray(rng.standard_normal((k, 6, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(4).astype(np.float32))
    out, out_lens = conv1d_masked(xb, ls, w, b, stride=stride)
    out, out_lens = np.asarray(out), np.asarray(out_lens)
    for i, L in enumerate(lens):
        ref = np.asarray(conv1d(jnp.asarray(xs[i][None]), w, b, stride=stride))[0]
        assert out_lens[i] == ref.shape[0] == -(-L // stride)
        np.testing.assert_allclose(out[i, : ref.shape[0]], ref, atol=2e-6)


def test_instance_norm_masked_matches_per_sample():
    rng = np.random.default_rng(2)
    lens = [10, 23, 16]
    xs, xb, ls = _ragged_batch(rng, lens, 23, 5)
    out = np.asarray(instance_norm_time_masked(xb, ls))
    for i, L in enumerate(lens):
        ref = np.asarray(instance_norm_time(jnp.asarray(xs[i][None])))[0]
        np.testing.assert_allclose(out[i, :L], ref, atol=1e-5)


@pytest.mark.parametrize("kernel", [2, 3])
def test_avg_pool_masked_matches_per_sample(kernel):
    rng = np.random.default_rng(3)
    lens = [9, 16, 13]
    xs, xb, ls = _ragged_batch(rng, lens, 16, 4)
    out, out_lens = avg_pool_time_ceil_masked(xb, ls, kernel)
    out, out_lens = np.asarray(out), np.asarray(out_lens)
    for i, L in enumerate(lens):
        ref = np.asarray(avg_pool_time_ceil(jnp.asarray(xs[i][None]), kernel))[0]
        assert out_lens[i] == ref.shape[0]
        np.testing.assert_allclose(out[i, : ref.shape[0]], ref, atol=2e-6)


def test_ae_inference_masked_matches_per_pair():
    """Mixed-length padded batch through the masked AE == per-pair unmasked
    inference at true lengths (model half of the convert_grid exactness)."""
    cfg = TINY.model
    params = init_ae(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    lens_s, lens_t = [30, 41, 24], [28, 19, 37]
    srcs, src_b, sl = _ragged_batch(rng, lens_s, 42, N_MELS)
    tars, tar_b, tl = _ragged_batch(rng, lens_t, 37, N_MELS)
    dec_b, out_lens = jax.jit(
        lambda p, x, xl, xc, cl: MM.ae_inference_masked(p, cfg, x, xl, xc, cl)
    )(params, src_b, sl, tar_b, tl)
    dec_b, out_lens = np.asarray(dec_b), np.asarray(out_lens)
    up = int(np.prod(cfg.decoder.upsample))
    subp = int(np.prod(cfg.content_encoder.subsample))
    for i in range(3):
        single = np.asarray(
            ae_inference(
                params, cfg, jnp.asarray(srcs[i][None]), jnp.asarray(tars[i][None])
            )
        )[0]
        expect = -(-lens_s[i] // subp) * up
        assert out_lens[i] == single.shape[0] == expect
        np.testing.assert_allclose(
            dec_b[i, : single.shape[0]], single, atol=1e-5
        )


def test_masked_spectral_norm_decoder_matches():
    """sn=True decoder: masked apply threads _sn_params identically."""
    cfg = dataclasses.replace(TINY.model.decoder, sn=True)
    params = M.init_decoder(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(5)
    lens = [12, 9]
    zs, zb, ls = _ragged_batch(rng, lens, 12, cfg.c_in)
    cond = jnp.asarray(rng.standard_normal((2, cfg.c_cond)).astype(np.float32))
    out, out_lens = MM.decoder_apply_masked(params, cfg, zb, cond, ls)
    out, out_lens = np.asarray(out), np.asarray(out_lens)
    up = int(np.prod(cfg.upsample))
    for i, L in enumerate(lens):
        ref = np.asarray(
            M.decoder_apply(params, cfg, jnp.asarray(zs[i][None]), cond[i : i + 1])
        )[0]
        assert out_lens[i] == ref.shape[0] == L * up
        np.testing.assert_allclose(out[i, : ref.shape[0]], ref, atol=1e-5)


def test_griffin_lim_masked_matches_per_sample():
    """Ragged batched GL == per-sample GL on each sample's true frames."""
    from adaptive_voice_conversion_tpu.dsp.vocoder import (
        griffin_lim_jax,
        griffin_lim_jax_masked,
    )

    cfg = SignalConfig(
        sr=8000, n_fft=256, hop_length=64, win_length=192, n_mels=8, n_iter=2
    )
    rng = np.random.default_rng(6)
    # 63/62 sit within the mirror window of the longest sample — they pin
    # the buffer-extension path of stft_jax_masked (a clipped/shifted
    # mirror would silently corrupt only near-longest samples)
    lens = [40, 64, 51, 63, 62]
    f = cfg.n_fft // 2 + 1
    mags = [np.abs(rng.standard_normal((f, L))).astype(np.float32) for L in lens]
    mag_b = jnp.asarray(
        np.stack([np.pad(m, ((0, 0), (0, 64 - m.shape[1]))) for m in mags])
    )
    wav_b = np.asarray(
        griffin_lim_jax_masked(mag_b, jnp.asarray(lens), cfg, n_iter=30)
    )
    for i in range(len(lens)):
        ref = np.asarray(griffin_lim_jax(jnp.asarray(mags[i]), cfg, n_iter=30))
        np.testing.assert_allclose(wav_b[i, : ref.shape[-1]], ref, atol=1e-5)


def test_convert_grid_exact_vs_one_at_a_time(tmp_path):
    """The flagship serving path: batched mixed-length convert_grid equals
    per-pair one-at-a-time conversion (round-3 verdict item 1 'done'
    criterion): converted MELS allclose 1e-5 — the model product,
    ``inference_one_utterance``'s second return — and wavs peak-relative
    (see the conditioning note below)."""
    from adaptive_voice_conversion_tpu.dsp.audio import deemphasis_jax
    from adaptive_voice_conversion_tpu.dsp.vocoder import (
        griffin_lim_jax,
        mel_to_mag_jax,
    )
    from adaptive_voice_conversion_tpu.infer.inferencer import Inferencer

    signal = SignalConfig(
        sr=8000, n_fft=256, hop_length=64, win_length=192, n_mels=N_MELS, n_iter=2
    )
    cfg = dataclasses.replace(TINY, signal=signal)
    params = init_ae(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(7)
    attr = {
        "mean": rng.standard_normal(N_MELS).astype(np.float32),
        "std": (1.0 + rng.random(N_MELS)).astype(np.float32),
    }
    attr_path = str(tmp_path / "attr.pkl")
    with open(attr_path, "wb") as fh:
        pickle.dump(attr, fh)
    inf = Inferencer(cfg, params, attr_path)
    srcs = [rng.standard_normal((L, N_MELS)).astype(np.float32) for L in (40, 29)]
    tgts = [rng.standard_normal((L, N_MELS)).astype(np.float32) for L in (24, 33)]
    n_iter = 30
    wavs, mels = inf.convert_grid(
        srcs, tgts, gl_iters=n_iter, trim=False, return_mels=True
    )
    assert len(wavs) == len(mels) == 4
    for i, s in enumerate(srcs):
        n_samp = signal.hop_length * (s.shape[0] - 1)
        for j, t in enumerate(tgts):
            k = i * len(tgts) + j
            # the exactness gate: converted mel == one-at-a-time mel @1e-5
            dec = inf.denormalize(inf.convert_mel(s, t))
            assert mels[k].shape == dec.shape
            np.testing.assert_allclose(mels[k], dec, atol=1e-5)
            mag = mel_to_mag_jax(jnp.asarray(dec), signal)
            ref = np.asarray(
                deemphasis_jax(
                    griffin_lim_jax(mag, signal, n_iter=n_iter),
                    signal.preemphasis,
                )
            )
            got = wavs[k]
            assert got.shape[0] == n_samp
            # Wav comparison: equality end-to-end is limited by phase-
            # retrieval CONDITIONING, not by masking. On this untrained
            # decoder's inconsistent magnitude Griffin-Lim is chaotic — a
            # measured control shows 2e-7 RELATIVE input noise exploding to
            # |diff| 2.2 of a 29 peak within 8 iterations — while the
            # masked grid stays within ~1e-2 of peak at 30 iterations
            # because it shares the arithmetic except benign matmul
            # reassociation (the masked GL itself is pinned at 1e-5 on
            # fixed input by test_griffin_lim_masked_matches_per_sample).
            peak = float(np.abs(ref[:n_samp]).max())
            np.testing.assert_allclose(
                got, ref[:n_samp], atol=2e-2 * max(peak, 1.0)
            )


def test_griffin_lim_masked_fast_mode_tracks_exact():
    """The ragged FAST mode (fused kernel + masked warm/polish,
    method='pallas') must stay in the exact masked path's spectral-
    convergence neighborhood per sample of a mixed-length batch."""
    from adaptive_voice_conversion_tpu.dsp.stft import stft_np
    from adaptive_voice_conversion_tpu.dsp.vocoder import griffin_lim_jax_masked

    cfg = SignalConfig(
        sr=8000, n_fft=256, hop_length=64, win_length=192, n_mels=8, n_iter=2
    )
    rng = np.random.default_rng(8)
    lens = [40, 64, 51]
    t = np.arange(64 * cfg.hop_length + cfg.n_fft) / cfg.sr
    sig = (0.5 * np.sin(2 * np.pi * 220 * t)
           + 0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    full = np.abs(
        stft_np(sig, cfg.n_fft, cfg.hop_length, cfg.win_length)
    ).astype(np.float32)
    mags = [full[:, :L] * (1 + 0.01 * i) for i, L in enumerate(lens)]
    mag_b = jnp.asarray(
        np.stack([np.pad(m, ((0, 0), (0, 64 - m.shape[1]))) for m in mags])
    )
    n_it = 20
    w_exact = np.asarray(
        griffin_lim_jax_masked(mag_b, jnp.asarray(lens), cfg, n_iter=n_it)
    )
    w_fast = np.asarray(
        griffin_lim_jax_masked(
            mag_b, jnp.asarray(lens), cfg, n_iter=n_it, method="pallas"
        )
    )
    assert np.isfinite(w_fast).all()

    def sc(w, ref):
        est = np.abs(
            stft_np(np.asarray(w), cfg.n_fft, cfg.hop_length, cfg.win_length)
        )
        f = min(est.shape[1], ref.shape[1])
        return float(
            np.linalg.norm(est[:, :f] - ref[:, :f]) / np.linalg.norm(ref[:, :f])
        )

    for i, L in enumerate(lens):
        n = cfg.hop_length * (L - 1)
        s_e = sc(w_exact[i, :n], mags[i])
        s_f = sc(w_fast[i, :n], mags[i])
        assert s_f < s_e + 0.05, (i, s_f, s_e)


def test_convert_grid_uniform_fast_path_is_exact(tmp_path):
    """Uniform-length grids take the specialized unmasked-model + plain-GL
    programs (no masking needed — padding is empty); their mels must still
    equal per-pair single conversion at 1e-5."""
    from adaptive_voice_conversion_tpu.infer.inferencer import Inferencer

    signal = SignalConfig(
        sr=8000, n_fft=256, hop_length=64, win_length=192, n_mels=N_MELS, n_iter=2
    )
    cfg = dataclasses.replace(TINY, signal=signal)
    params = init_ae(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(9)
    attr = {
        "mean": rng.standard_normal(N_MELS).astype(np.float32),
        "std": (1.0 + rng.random(N_MELS)).astype(np.float32),
    }
    attr_path = str(tmp_path / "attr.pkl")
    with open(attr_path, "wb") as fh:
        pickle.dump(attr, fh)
    inf = Inferencer(cfg, params, attr_path)
    # lengths multiples of the downsample product -> uniform branch
    srcs = [rng.standard_normal((40, N_MELS)).astype(np.float32) for _ in range(2)]
    tgts = [rng.standard_normal((24, N_MELS)).astype(np.float32) for _ in range(2)]
    wavs, mels = inf.convert_grid(
        srcs, tgts, gl_iters=8, trim=False, return_mels=True
    )
    assert ("exact", 8, True) in inf._jit_vocode  # uniform branch compiled
    for i, s in enumerate(srcs):
        for j, t in enumerate(tgts):
            dec = inf.denormalize(inf.convert_mel(s, t))
            np.testing.assert_allclose(mels[i * 2 + j], dec, atol=1e-5)


def test_convert_grid_len_bucket_does_not_change_results(tmp_path):
    """Bucketed padded shapes (serving compile-churn control) must not
    change any output — the masked path is exact under any padding."""
    from adaptive_voice_conversion_tpu.infer.inferencer import Inferencer

    signal = SignalConfig(
        sr=8000, n_fft=256, hop_length=64, win_length=192, n_mels=N_MELS, n_iter=2
    )
    cfg = dataclasses.replace(TINY, signal=signal)
    params = init_ae(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(10)
    attr = {
        "mean": rng.standard_normal(N_MELS).astype(np.float32),
        "std": (1.0 + rng.random(N_MELS)).astype(np.float32),
    }
    attr_path = str(tmp_path / "attr.pkl")
    with open(attr_path, "wb") as fh:
        pickle.dump(attr, fh)
    inf = Inferencer(cfg, params, attr_path)
    srcs = [rng.standard_normal((L, N_MELS)).astype(np.float32) for L in (37, 29)]
    tgts = [rng.standard_normal((L, N_MELS)).astype(np.float32) for L in (24, 31)]
    _, mels_a = inf.convert_grid(
        srcs, tgts, gl_iters=4, trim=False, return_mels=True
    )
    _, mels_b = inf.convert_grid(
        srcs, tgts, gl_iters=4, trim=False, return_mels=True, len_bucket=16
    )
    for a, b in zip(mels_a, mels_b):
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, atol=1e-5)


def test_convert_pairs_matches_per_pair_singles(tmp_path):
    """Explicit-pair serving: convert_pairs mels == per-pair single
    conversion at 1e-5 for mixed-length pairs."""
    from adaptive_voice_conversion_tpu.infer.inferencer import Inferencer

    signal = SignalConfig(
        sr=8000, n_fft=256, hop_length=64, win_length=192, n_mels=N_MELS, n_iter=2
    )
    cfg = dataclasses.replace(TINY, signal=signal)
    params = init_ae(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(12)
    attr = {
        "mean": rng.standard_normal(N_MELS).astype(np.float32),
        "std": (1.0 + rng.random(N_MELS)).astype(np.float32),
    }
    attr_path = str(tmp_path / "attr.pkl")
    with open(attr_path, "wb") as fh:
        pickle.dump(attr, fh)
    inf = Inferencer(cfg, params, attr_path)
    pairs = [
        (rng.standard_normal((ls, N_MELS)).astype(np.float32),
         rng.standard_normal((lt, N_MELS)).astype(np.float32))
        for ls, lt in ((40, 24), (29, 33), (35, 19))
    ]
    wavs, mels = inf.convert_pairs(
        pairs, gl_iters=4, trim=False, return_mels=True
    )
    assert len(wavs) == len(mels) == 3
    for k, (s, t) in enumerate(pairs):
        dec = inf.denormalize(inf.convert_mel(s, t))
        assert mels[k].shape == dec.shape
        np.testing.assert_allclose(mels[k], dec, atol=1e-5)
        assert wavs[k].shape[0] == signal.hop_length * (s.shape[0] - 1)


def test_masked_batch_with_ultra_short_sample_does_not_contaminate():
    """A sample shorter than a layer's pad width (no single-sample
    reference behavior — torch reflect pad raises there) must resolve all
    reads inside its own valid region: finite, deterministic, and the
    OTHER samples in the batch stay exactly equal to their solo runs."""
    cfg = TINY.model
    params = init_ae(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(13)
    lens_s, lens_t = [40, 6], [30, 5]  # sample 1 is degenerate-short
    srcs, src_b, sl = _ragged_batch(rng, lens_s, 40, N_MELS)
    tars, tar_b, tl = _ragged_batch(rng, lens_t, 30, N_MELS)
    dec_b, out_lens = MM.ae_inference_masked(
        params, cfg, src_b, sl, tar_b, tl
    )
    dec_b = np.asarray(dec_b)
    assert np.isfinite(dec_b).all()
    # the normal-length pair is untouched by its degenerate neighbor
    single = np.asarray(
        ae_inference(
            params, cfg, jnp.asarray(srcs[0][None]), jnp.asarray(tars[0][None])
        )
    )[0]
    np.testing.assert_allclose(dec_b[0, : single.shape[0]], single, atol=1e-5)
    # determinism of the degenerate sample (folded-reflect is well-defined)
    dec_b2 = np.asarray(
        MM.ae_inference_masked(params, cfg, src_b, sl, tar_b, tl)[0]
    )
    np.testing.assert_array_equal(dec_b[1], dec_b2[1])
