"""Shared ETL machinery for the dataset builders.

Reproduces the reference preprocessing semantics (SURVEY.md §2.1 #13-16):
- featurize every wav with the tacotron-style mel chain
- attr.pkl = per-bin mean/std over the first ``n_utts_attr`` TRAIN utterances
- z-normalize EVERY split with the train statistics
- reduce: keep utterances strictly longer than segment_size
- sample: N random (utt_id, t) pairs with t <= len - segment_size - 1

Featurization can run on host CPU (numpy) or batched on TPU
(``use_tpu=True`` pads waves to length buckets and runs the jitted
featurizer — the on-TPU LibriTTS preprocessing config in BASELINE.json).
"""

from __future__ import annotations

import json
import os
import pickle
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.config import SignalConfig
from ..dsp.audio import load_wav, preemphasis, trim_silence
from ..dsp.features import mel_from_wave, mel_from_wave_jax


def featurize_paths(
    paths: Sequence[str],
    cfg: SignalConfig,
    use_tpu: bool = False,
    tpu_batch: int = 16,
    log_every: int = 500,
) -> Dict[str, np.ndarray]:
    """path -> mel (T, n_mels) for every wav, keyed by basename.

    The TPU path runs the XLA-rfft featurizer (dsp.mel_from_wave_jax). A
    fused Pallas STFT-mel kernel was A/B'd against it through rounds 2-5
    and retired as a recorded negative — it plateaued at 0.92x of XLA on
    clean device-resident medians (KERNELS_r05.json, COMPONENTS.md)."""
    out: Dict[str, np.ndarray] = {}
    if not use_tpu:
        for i, path in enumerate(paths):
            if i % log_every == 0 or i == len(paths) - 1:
                print(f"processing {i} files", flush=True)
            y = load_wav(path, cfg.sr)
            y, _ = trim_silence(y, cfg.top_db)
            y = preemphasis(y, cfg.preemphasis)
            mel, _ = mel_from_wave(y, cfg)
            out[os.path.basename(path)] = mel
        return out

    import jax
    import jax.numpy as jnp

    feat = jax.jit(lambda w: mel_from_wave_jax(w, cfg)[0])
    # bucket by padded length to bound recompiles; frame counts are computed
    # per true length and padded frames dropped
    waves: List[Tuple[str, np.ndarray]] = []
    for i, path in enumerate(paths):
        if i % log_every == 0 or i == len(paths) - 1:
            print(f"loading {i} files", flush=True)
        y = load_wav(path, cfg.sr)
        y, _ = trim_silence(y, cfg.top_db)
        waves.append((os.path.basename(path), preemphasis(y, cfg.preemphasis)))
    bucket = cfg.sr  # 1-second buckets
    by_bucket: Dict[int, List[Tuple[str, np.ndarray]]] = {}
    for name, y in waves:
        b = -(-max(len(y), cfg.win_length) // bucket)
        by_bucket.setdefault(b, []).append((name, y))
    for b, items in sorted(by_bucket.items()):
        pad_len = b * bucket
        for s in range(0, len(items), tpu_batch):
            chunk = items[s : s + tpu_batch]
            wav_b = np.zeros((len(chunk), pad_len), np.float32)
            for r, (_, y) in enumerate(chunk):
                wav_b[r, : len(y)] = y
            mels = np.asarray(feat(jnp.asarray(wav_b)))
            for r, (name, y) in enumerate(chunk):
                n_frames = 1 + (len(y) + 2 * (cfg.n_fft // 2) - cfg.n_fft) // cfg.hop_length
                out[name] = mels[r, :n_frames].astype(np.float32)
    return out


def compute_attr(
    data: Dict[str, np.ndarray], order: Sequence[str], n_utts_attr: int
) -> Dict[str, np.ndarray]:
    """Mean/std over the first ``n_utts_attr`` train utterances
    (make_datasets_vctk.py:90-98)."""
    stack = np.concatenate([data[k] for k in list(order)[:n_utts_attr]], axis=0)
    return {"mean": stack.mean(axis=0), "std": stack.std(axis=0)}


def normalize_split(
    data: Dict[str, np.ndarray], attr: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    m, s = attr["mean"], attr["std"]
    return {k: ((v - m) / s).astype(np.float32) for k, v in data.items()}


def reduce_dataset(data: Dict[str, np.ndarray], segment_size: int) -> Dict:
    """Keep utts with length > segment_size (reduce_dataset.py:4-15)."""
    return {k: v for k, v in data.items() if v.shape[0] > segment_size}


def sample_single_segments(
    data: Dict[str, np.ndarray], n_samples: int, segment_size: int, seed=None
) -> List[Tuple[str, int]]:
    """N random (utt_id, t) pairs (sample_single_segments.py:7-33)."""
    rng = random.Random(seed)
    utt_list = sorted(u for u in data if len(data[u]) > segment_size)
    print(f"{len(utt_list)} utterances", flush=True)
    samples = []
    for _ in range(n_samples):
        u = utt_list[rng.randrange(len(utt_list))]
        t = rng.randint(0, len(data[u]) - segment_size)
        samples.append((u, t))
    return samples


def dump_pickle(obj, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def dump_json(obj, path: str) -> None:
    with open(path, "w") as f:
        json.dump(obj, f)
