"""Inference + preprocessing ETL tests: full synthetic pipeline
wav files -> preprocess stages 0-3 -> training -> one-shot conversion -> wav
(SURVEY.md §4.5), plus unit checks for the converters and the grid path."""

import json
import os
import pickle

import numpy as np
import pytest

from adaptive_voice_conversion_tpu.core.config import SignalConfig, TrainConfig
from adaptive_voice_conversion_tpu.dsp.audio import save_wav
from adaptive_voice_conversion_tpu.infer.inferencer import Inferencer, utt_make_frames
from adaptive_voice_conversion_tpu.tools import (
    make_datasets_vctk,
    preprocess_pipeline,
)

from test_e2e import TINY  # tiny 8-mel config

SR = 24000


def synth_corpus(root, n_speakers=4, utts_per_speaker=3, seconds=1.0):
    """VCTK-like corpus layout: wav48/p<spk>/p<spk>_<utt>.wav + speaker-info."""
    wav_dir = root / "wav48"
    rng = np.random.default_rng(0)
    lines = ["ID  AGE  GENDER  ACCENTS  REGION"]
    for s in range(n_speakers):
        spk = 225 + s
        lines.append(f"{spk}  23  F  English  Somewhere")
        d = wav_dir / f"p{spk}"
        os.makedirs(d, exist_ok=True)
        f0 = 120 + 40 * s
        for u in range(1, utts_per_speaker + 1):
            n = int(seconds * SR)
            t = np.arange(n) / SR
            y = 0.4 * np.sin(2 * np.pi * f0 * t) + 0.1 * np.sin(
                2 * np.pi * 3 * f0 * t
            )
            y *= np.clip(np.sin(np.pi * np.arange(n) / n) * 3, 0, 1)
            y += 0.01 * rng.standard_normal(n)
            save_wav(str(d / f"p{spk}_{u:03d}.wav"), y.astype(np.float32), SR)
    with open(root / "speaker-info.txt", "w") as f:
        f.write("\n".join(lines) + "\n")
    return root


def test_utt_make_frames():
    x = np.arange(20, dtype=np.float32).reshape(5, 4)
    out = utt_make_frames(x, 1)
    assert out.shape == (1, 5, 4)
    np.testing.assert_array_equal(out[0], x)
    out2 = utt_make_frames(x, 2)
    assert out2.shape == (1, 3, 8)  # padded 5 -> 6 time frames


@pytest.mark.slow
def test_full_pipeline_synthetic_vctk(tmp_path):
    corpus = synth_corpus(tmp_path / "corpus")
    data_dir = tmp_path / "feat"
    preprocess_pipeline.main(
        [
            "vctk",
            "--raw_data_dir", str(corpus),
            "--data_dir", str(data_dir),
            "--n_out_speakers", "1",
            "--test_prop", "0.34",
            "--training_samples", "500",
            "--testing_samples", "20",
            "--n_utts_attr", "6",
            "--segment_size", "32",
            "--seed", "0",
        ]
    )
    # stage artifacts exist and have reference formats
    for name in [
        "train.pkl", "in_test.pkl", "out_test.pkl", "attr.pkl",
        "train_32.pkl", "train_samples_32.json", "in_test_samples_32.json",
    ]:
        assert (data_dir / name).exists(), name
    with open(data_dir / "attr.pkl", "rb") as f:
        attr = pickle.load(f)
    assert attr["mean"].shape == (512,)
    with open(data_dir / "train.pkl", "rb") as f:
        train = pickle.load(f)
    mels = list(train.values())
    assert all(m.shape[1] == 512 for m in mels)
    # z-normalized with train stats: overall mean ~ 0
    allm = np.concatenate(mels)
    assert abs(float(allm.mean())) < 0.2
    with open(data_dir / "train_samples_32.json") as f:
        idx = json.load(f)
    assert len(idx) == 500 and all(len(e) == 2 for e in idx)

    # train a few steps on the produced artifacts with the full-size model
    from adaptive_voice_conversion_tpu.core.config import (
        DataLoaderConfig,
    )
    import dataclasses

    from adaptive_voice_conversion_tpu.train.solver import Solver, SolverArgs

    cfg = dataclasses.replace(
        TrainConfig(),
        data_loader=DataLoaderConfig(segment_size=32, frame_size=1, batch_size=8),
    )
    args = SolverArgs(
        data_dir=str(data_dir),
        train_set="train_32",
        train_index_file="train_samples_32.json",
        logdir=str(tmp_path / "log"),
        store_model_path=str(tmp_path / "model"),
        summary_steps=2,
        save_steps=100,
    )
    solver = Solver(cfg, args)
    m = solver.train(4, log_every_print=False)
    assert np.isfinite(m["loss"])
    solver._mngr.wait()

    # one-shot conversion from wav paths through the orbax checkpoint
    inf = Inferencer.from_orbax(
        cfg, str(tmp_path / "model"), str(data_dir / "attr.pkl"),
        use_tpu_vocoder=False,
    )
    src = str(corpus / "wav48" / "p225" / "p225_001.wav")
    tgt = str(corpus / "wav48" / "p228" / "p228_001.wav")
    out = str(tmp_path / "converted.wav")
    # shrink Griffin-Lim for test speed
    inf.config = dataclasses.replace(
        inf.config, signal=dataclasses.replace(cfg.signal, n_iter=4)
    )
    wav = inf.inference_from_path(src, tgt, out)
    assert os.path.exists(out)
    assert np.isfinite(wav).all() and len(wav) > 1000


def test_convert_grid_tiny():
    """Batched cross-conversion grid: n_src x n_tgt wavs out of one padded
    batch (tiny model)."""
    import jax
    import dataclasses

    from adaptive_voice_conversion_tpu.models import init_ae

    cfg = dataclasses.replace(
        TINY,
        signal=SignalConfig(
            sr=8000, n_fft=256, hop_length=64, win_length=192, n_mels=8, n_iter=2
        ),
    )
    params = init_ae(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    attr = {"mean": np.zeros(8, np.float32), "std": np.ones(8, np.float32)}
    import pickle as pkl
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        pkl.dump(attr, f)
        attr_path = f.name
    inf = Inferencer(cfg, params, attr_path, use_tpu_vocoder=False)
    srcs = [rng.standard_normal((40, 8)).astype(np.float32) for _ in range(2)]
    tgts = [rng.standard_normal((t, 8)).astype(np.float32) for t in (24, 36, 18)]
    wavs = inf.convert_grid(srcs, tgts, gl_iters=2)
    assert len(wavs) == 6
    assert all(np.isfinite(w).all() for w in wavs)
    # serving precision knob: on CPU every precision computes true f32, so
    # 'highest' must reproduce the default bit-for-bit (the knob's effect
    # is a TPU quality/throughput tradeoff, measured in SERVING_r05.json);
    # this pins the plumbing — the wrapped programs run and agree
    inf_hi = Inferencer(
        cfg, params, attr_path, use_tpu_vocoder=False, precision="highest"
    )
    wavs_hi = inf_hi.convert_grid(srcs, tgts, gl_iters=2)
    for w, wh in zip(wavs, wavs_hi):
        np.testing.assert_array_equal(w, wh)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="precision"):
        Inferencer(cfg, params, attr_path, precision="f64")


def test_convert_grid_cli(tmp_path):
    """The batch-serving CLI: wav files in -> one grid call -> wavs out."""
    import dataclasses

    import jax

    from adaptive_voice_conversion_tpu.cli import convert_grid as cli_grid
    from adaptive_voice_conversion_tpu.core.config import save_config
    from adaptive_voice_conversion_tpu.models import init_ae
    from adaptive_voice_conversion_tpu.models.torch_export import (
        save_torch_checkpoint,
    )

    sr = 8000
    signal = SignalConfig(
        sr=sr, n_fft=256, hop_length=64, win_length=192, n_mels=8, n_iter=2
    )
    cfg = dataclasses.replace(TINY, signal=signal)
    cfg_path = str(tmp_path / "config.yaml")
    save_config(cfg, cfg_path)
    params = init_ae(jax.random.PRNGKey(0), cfg.model)
    ckpt = str(tmp_path / "model.ckpt")
    save_torch_checkpoint(params, cfg.model, ckpt)
    attr = {"mean": np.zeros(8, np.float32), "std": np.ones(8, np.float32)}
    attr_path = str(tmp_path / "attr.pkl")
    with open(attr_path, "wb") as f:
        pickle.dump(attr, f)

    rng = np.random.default_rng(0)
    paths = {}
    for name, seconds in [("s1", 0.5), ("s2", 0.4), ("t1", 0.45)]:
        n = int(seconds * sr)
        t = np.arange(n) / sr
        y = 0.4 * np.sin(2 * np.pi * (200 + 50 * len(paths)) * t)
        y = (y + 0.01 * rng.standard_normal(n)).astype(np.float32)
        p = str(tmp_path / f"{name}.wav")
        save_wav(p, y, sr)
        paths[name] = p

    out_dir = str(tmp_path / "out")
    cli_grid.main([
        "-a", attr_path, "-c", cfg_path, "-m", ckpt,
        "-s", paths["s1"], paths["s2"], "-t", paths["t1"],
        "-o", out_dir, "--gl_iters", "2",
    ])
    outs = sorted(os.listdir(out_dir))
    assert outs == ["s1__to__t1.wav", "s2__to__t1.wav"], outs
    from scipy.io import wavfile

    for f in outs:
        _, w = wavfile.read(os.path.join(out_dir, f))
        assert np.isfinite(w).all() and len(w) > 500
