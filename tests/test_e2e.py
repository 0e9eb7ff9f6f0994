"""End-to-end smoke (SURVEY.md §4.5): synthetic dataset -> Solver training ->
loss decrease -> checkpoint -> resume continues deterministically."""

import json
import pickle

import numpy as np
import pytest

from adaptive_voice_conversion_tpu.core.config import (
    AEConfig,
    ContentEncoderConfig,
    DataLoaderConfig,
    DecoderConfig,
    OptimizerConfig,
    SpeakerEncoderConfig,
    TrainConfig,
)
from adaptive_voice_conversion_tpu.train.solver import Solver, SolverArgs

N_MELS = 8

TINY = TrainConfig(
    model=AEConfig(
        speaker_encoder=SpeakerEncoderConfig(
            c_in=N_MELS, c_h=8, c_out=8, kernel_size=5, bank_size=4, bank_scale=1,
            c_bank=4, n_conv_blocks=2, n_dense_blocks=1, subsample=(1, 2),
        ),
        content_encoder=ContentEncoderConfig(
            c_in=N_MELS, c_h=8, c_out=8, kernel_size=5, bank_size=4, bank_scale=1,
            c_bank=4, n_conv_blocks=2, subsample=(1, 2),
        ),
        decoder=DecoderConfig(
            c_in=8, c_cond=8, c_h=8, c_out=N_MELS, kernel_size=5,
            n_conv_blocks=2, upsample=(2, 1),
        ),
    ),
    data_loader=DataLoaderConfig(segment_size=16, batch_size=8),
)


@pytest.fixture
def data_dir(tmp_path):
    rng = np.random.default_rng(0)
    data, index = {}, []
    for i in range(6):
        n = 40 + 10 * i
        data[f"u{i}"] = rng.standard_normal((n, N_MELS)).astype(np.float32)
        for _ in range(30):
            index.append([f"u{i}", int(rng.integers(0, n - 16))])
    with open(tmp_path / "train_128.pkl", "wb") as f:
        pickle.dump(data, f)
    with open(tmp_path / "train_samples_128.json", "w") as f:
        json.dump(index, f)
    return tmp_path


def make_args(tmp_path, **kw):
    return SolverArgs(
        data_dir=str(tmp_path),
        train_set="train_128",
        train_index_file="train_samples_128.json",
        logdir=str(tmp_path / "log"),
        store_model_path=str(tmp_path / "model"),
        summary_steps=5,
        save_steps=1000,
        **kw,
    )


def test_solver_trains_and_loss_decreases(data_dir):
    solver = Solver(TINY, make_args(data_dir))
    import json as _json

    m = solver.train(40, log_every_print=False)
    assert np.isfinite(m["loss"]) and m["loss_rec"] > 0
    # first vs last logged loss
    lines = [
        _json.loads(l)
        for l in open(data_dir / "log" / "metrics.jsonl")
        if "init/ae_train/loss_rec" in l
    ]
    assert lines[-1]["init/ae_train/loss_rec"] < lines[0]["init/ae_train/loss_rec"]
    # config snapshot written (reference solver.py:44-49 behavior)
    assert (data_dir / "model.config.yaml").exists()


@pytest.mark.slow
def test_solver_checkpoint_resume_is_deterministic(data_dir):
    a1 = make_args(data_dir, tag="a")
    s1 = Solver(TINY, a1)
    s1.train(10, log_every_print=False)
    s1.save_model(9)
    s1._mngr.wait()

    # fresh solver resuming from the step-10 checkpoint (before s1 writes more)
    a2 = make_args(data_dir, tag="b", load_model=True)
    a2.load_model_path = a1.store_model_path
    a2.store_model_path = str(data_dir / "model_b")
    s2 = Solver(TINY, a2)
    assert s2.iteration == 10

    m_cont = s1.train(5, log_every_print=False)
    m_res = s2.train(5, log_every_print=False)
    np.testing.assert_allclose(m_res["loss"], m_cont["loss"], rtol=1e-5)


def test_in_training_eval_and_audio(data_dir, tmp_path):
    """In-training eval cadence (round-4 verdict item 5) against
    PIPELINE-PRODUCED eval artifacts: the in_test split pickle + the
    {split}_samples_{seg}.json index written by the actual
    tools.sample_single_segments CLI (the preprocess_vctk.sh:15-19 naming
    the solver's default convention must match), eval series in
    metrics.jsonl, and one converted audio sample per eval."""
    import dataclasses

    from adaptive_voice_conversion_tpu.core.config import SignalConfig
    from adaptive_voice_conversion_tpu.tools import sample_single_segments

    rng = np.random.default_rng(1)
    eval_data = {
        f"e{i}": rng.standard_normal((48 + 8 * i, N_MELS)).astype(np.float32)
        for i in range(3)
    }
    with open(data_dir / "in_test.pkl", "wb") as f:
        pickle.dump(eval_data, f)
    # non-trivial attr stats: the audio sample must denormalize BEFORE
    # vocoding (z-space mels clip to silence in mel_to_mag otherwise)
    attr = {
        "mean": np.full(N_MELS, 0.4, np.float32),
        "std": np.full(N_MELS, 0.2, np.float32),
    }
    with open(data_dir / "attr.pkl", "wb") as f:
        pickle.dump(attr, f)
    # the real pipeline stage-3 tool writes the index (and its name is the
    # solver's default: {eval_set}_samples_{segment_size}.json)
    sample_single_segments.main([
        str(data_dir / "in_test.pkl"),
        str(data_dir / "in_test_samples_16.json"),
        "40", "16",
    ])
    # a signal config consistent with the tiny model so the audio sample's
    # vocode path runs (mel dim must match the decoder output)
    cfg = dataclasses.replace(
        TINY,
        signal=SignalConfig(
            sr=8000, n_fft=256, hop_length=64, win_length=192, n_mels=N_MELS,
            n_iter=2,
        ),
        # eval fires on fused-chunk boundaries (like summaries/ckpts), so
        # align inner_steps with the cadence to get one eval per 5 steps
        inner_steps=5,
        # short anneal so successive evals see DIFFERENT lambda_KL values
        # (pins that in-training eval uses the current step's lambda, not
        # the stale run-start iteration)
        annealing_iters=8,
    )
    args = make_args(data_dir, eval_steps=5, eval_set="in_test")
    args.eval_audio_gl_iters = 2
    solver = Solver(cfg, args)
    solver.train(10, log_every_print=False)

    lines = [json.loads(l) for l in open(data_dir / "log" / "metrics.jsonl")]
    eval_rows = [l for l in lines if any("ae_eval_in_test" in k for k in l)]
    assert len(eval_rows) >= 2, "expected an eval row per eval_steps crossing"
    assert all(
        np.isfinite(v)
        for l in eval_rows for k, v in l.items() if "loss" in k
    )
    # lambda_KL must track the CURRENT step: loss = 10*rec + lam*kl, so the
    # implied lam of the first eval (step 4, lam=5/8) differs from the
    # second (step 9, lam=1.0 — anneal done)
    def implied_lam(row):
        g = lambda suffix: [v for k, v in row.items() if k.endswith(suffix)][0]
        kl = g("loss_kl")
        return (g("loss") - 10.0 * g("loss_rec")) / max(kl, 1e-9)

    lam0, lam1 = implied_lam(eval_rows[0]), implied_lam(eval_rows[1])
    assert lam0 == pytest.approx(5.0 / 8.0, rel=1e-3), lam0
    assert lam1 == pytest.approx(1.0, rel=1e-3), lam1
    audio_rows = [l for l in lines if any("audio_n_samples" in k for k in l)]
    assert audio_rows, "expected an audio_summary emission per eval"
    n = [v for k, v in audio_rows[0].items() if "audio_n_samples" in k][0]
    assert n > 1000  # a real waveform, not an empty stub
    # the wav fallback file (tensorboardX absent or not) or TB event was
    # produced from DENORMALIZED mels — spot-check via the jitted convert:
    # the solver's audio fn must exist and produce finite, non-silent audio
    wav = solver._audio_fns(
        solver.params,
        np.zeros((1, 16, N_MELS), np.float32),
        np.zeros((1, 16, N_MELS), np.float32),
    )
    wav = np.asarray(wav)
    assert np.isfinite(wav).all() and np.abs(wav).max() > 0


def test_solver_zero_iterations(data_dir):
    """train(0) must not crash (reference main.py:31 gates on iters > 0 —
    we handle it gracefully instead)."""
    solver = Solver(TINY, make_args(data_dir))
    m = solver.train(0, log_every_print=False)
    assert isinstance(m, dict)
