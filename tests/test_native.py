"""Native C++ segment-gather tests (ctypes binding; numpy fallback)."""

import numpy as np
import pytest

from adaptive_voice_conversion_tpu.data.native import (
    gather_segments,
    native_available,
)


@pytest.mark.skipif(not native_available(), reason="no toolchain")
def test_native_gather_matches_numpy():
    rng = np.random.default_rng(0)
    packed = rng.standard_normal((5000, 64)).astype(np.float32)
    starts = rng.integers(0, 5000 - 32, 100).astype(np.int64)
    out = gather_segments(packed, starts, 32)
    ref = packed[starts[:, None] + np.arange(32)[None, :]]
    np.testing.assert_array_equal(out, ref)


@pytest.mark.skipif(not native_available(), reason="no toolchain")
def test_native_gather_bf16():
    import ml_dtypes

    rng = np.random.default_rng(0)
    packed = rng.standard_normal((1000, 16)).astype(ml_dtypes.bfloat16)
    starts = np.array([0, 10, 500, 1000 - 8], dtype=np.int64)
    out = gather_segments(packed, starts, 8)
    ref = packed[starts[:, None] + np.arange(8)[None, :]]
    np.testing.assert_array_equal(out.view(np.uint16), ref.view(np.uint16))


def test_dataset_gather_uses_native_or_falls_back(tmp_path):
    import json, pickle

    from adaptive_voice_conversion_tpu.data import SegmentDataset

    rng = np.random.default_rng(0)
    data = {"u0": rng.standard_normal((200, 8)).astype(np.float32)}
    index = [["u0", int(t)] for t in rng.integers(0, 150, 20)]
    with open(tmp_path / "d.pkl", "wb") as f:
        pickle.dump(data, f)
    with open(tmp_path / "i.json", "w") as f:
        json.dump(index, f)
    ds = SegmentDataset(str(tmp_path / "d.pkl"), str(tmp_path / "i.json"), 16)
    out = ds.gather(np.arange(5))
    for k in range(5):
        u, t = index[k]
        np.testing.assert_array_equal(out[k], data[u][t : t + 16])
