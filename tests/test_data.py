"""Data layer tests: artifact compatibility, gather correctness, resumable
cursor, multi-host disjointness."""

import json
import pickle

import numpy as np
import pytest

from adaptive_voice_conversion_tpu.data import (
    SegmentDataset,
    batch_iterator,
    make_frames,
)


@pytest.fixture
def artifacts(tmp_path):
    """Reference-format artifacts: pickle dict + JSON index
    (data_utils.py:43-57)."""
    rng = np.random.default_rng(0)
    data = {
        f"utt{i}": rng.standard_normal((40 + 13 * i, 8)).astype(np.float32)
        for i in range(5)
    }
    seg = 16
    index = []
    for u, arr in data.items():
        for _ in range(20):
            index.append([u, int(rng.integers(0, len(arr) - seg))])
    pkl = tmp_path / "train.pkl"
    idx = tmp_path / "train_samples.json"
    with open(pkl, "wb") as f:
        pickle.dump(data, f)
    with open(idx, "w") as f:
        json.dump(index, f)
    return str(pkl), str(idx), data, index, seg


def test_gather_matches_reference_slicing(artifacts):
    pkl, idx, data, index, seg = artifacts
    ds = SegmentDataset(pkl, idx, segment_size=seg)
    assert len(ds) == len(index)
    sel = np.array([0, 7, 99, 42])
    batch = ds.gather(sel)
    for out, pos in zip(batch, sel):
        u, t = index[pos]
        np.testing.assert_array_equal(out, data[u][t : t + seg])


def test_make_frames_matches_reference(artifacts):
    """make_frames with frame_size 2: (B,T,C) -> (B,T/2,2C) — channels-last
    version of CollateFn.make_frames (data_utils.py:14-17)."""
    import torch

    pkl, idx, data, index, seg = artifacts
    ds = SegmentDataset(pkl, idx, segment_size=seg)
    batch = ds.gather(np.arange(4))
    ours = make_frames(batch, 2)
    # torch oracle: view(B, T//f, f*C).transpose(1,2) gives (B, f*C, T//f)
    t = torch.from_numpy(batch)
    theirs = t.view(4, seg // 2, 2 * 8).transpose(1, 2)
    np.testing.assert_array_equal(ours, theirs.transpose(1, 2).numpy())


def test_batch_iterator_deterministic_resume(artifacts):
    pkl, idx, *_ , seg = artifacts
    ds = SegmentDataset(pkl, idx, segment_size=seg)
    it1 = batch_iterator(ds, 8, seed=3, start_step=0)
    first_five = [next(it1) for _ in range(5)]
    it2 = batch_iterator(ds, 8, seed=3, start_step=3)
    resumed = [next(it2) for _ in range(2)]
    np.testing.assert_array_equal(first_five[3], resumed[0])
    np.testing.assert_array_equal(first_five[4], resumed[1])


def test_batch_iterator_epochs_reshuffle(artifacts):
    pkl, idx, *_, seg = artifacts
    ds = SegmentDataset(pkl, idx, segment_size=seg)
    per_epoch = len(ds) // 50
    it = batch_iterator(ds, 50, seed=0)
    e0 = [next(it) for _ in range(per_epoch)]
    e1 = [next(it) for _ in range(per_epoch)]
    assert not all(np.array_equal(a, b) for a, b in zip(e0, e1))


def test_multi_host_slices_are_disjoint_and_cover(artifacts):
    pkl, idx, *_ , seg = artifacts
    ds = SegmentDataset(pkl, idx, segment_size=seg)
    full = next(batch_iterator(ds, 8, seed=1, host_index=0, host_count=1))
    parts = [
        next(batch_iterator(ds, 8, seed=1, host_index=h, host_count=4))
        for h in range(4)
    ]
    np.testing.assert_array_equal(np.concatenate(parts, axis=0), full)


def test_get_utterance_roundtrip(artifacts):
    """Full-utterance retrieval from the packed array matches the pickle."""
    pkl, idx, data, index, seg = artifacts
    ds = SegmentDataset(pkl, idx, segment_size=seg)
    for u, arr in data.items():
        np.testing.assert_array_equal(ds.get_utterance(u), arr)
