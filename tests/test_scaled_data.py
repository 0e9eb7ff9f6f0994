"""Corpus-scale data paths: dataset sharded over the 'data' mesh axis
(aggregate-HBM capacity) and double-buffered chunk streaming for datasets
larger than HBM. Runs on the 8-virtual-device CPU mesh (SURVEY.md §4.4)."""

import dataclasses
import json
import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from adaptive_voice_conversion_tpu.core.mesh import make_mesh
from adaptive_voice_conversion_tpu.data.chunked import ChunkedDeviceStreamer
from adaptive_voice_conversion_tpu.data.dataset import SegmentDataset
from adaptive_voice_conversion_tpu.data.sharded import (
    ShardedDeviceDataset,
    plan_shards,
    sample_segments_sharded,
)
from adaptive_voice_conversion_tpu.models import init_ae
from adaptive_voice_conversion_tpu.train.step import make_device_data_train_step

from test_train import TINY


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8
    return make_mesh(n_data=8)


@pytest.fixture
def dataset(tmp_path):
    """Bigger fixture than test_data's (24 utterances) so 8-way sharding
    leaves no shard empty."""
    rng = np.random.default_rng(7)
    seg = 16
    data, index = {}, []
    for i in range(24):
        n = 40 + 5 * (i % 7)
        data[f"utt{i}"] = rng.standard_normal((n, 8)).astype(np.float32)
        for _ in range(25):
            index.append([f"utt{i}", int(rng.integers(0, n - seg))])
    pkl, idx = tmp_path / "d.pkl", tmp_path / "d.json"
    with open(pkl, "wb") as f:
        pickle.dump(data, f)
    with open(idx, "w") as f:
        json.dump(index, f)
    return SegmentDataset(str(pkl), str(idx), segment_size=seg), data, index, seg


# -- sharded over the data axis ------------------------------------------------


def test_plan_shards_balances_and_counts(dataset):
    ds, data, index, seg = dataset
    plan = plan_shards(ds, 4)
    covered = {int(u) for rows in plan.utt_rows for u in rows}
    assert covered == set(range(len(ds.utt_ids)))
    assert plan.n_starts * 4 + plan.dropped_segments == len(ds)
    assert plan.dropped_segments < len(ds) * 0.25  # balanced partition


def test_sharded_sampling_yields_valid_segments(dataset, mesh8):
    """Every sampled segment must be an exact reference slice data[u][t:t+seg],
    and the output batch must be sharded over 'data'."""
    ds, data, index, seg = dataset
    sd = ShardedDeviceDataset(ds, mesh8, dtype="float32")
    assert sd.packed.shape[0] == 8
    x = sample_segments_sharded(
        sd.packed, sd.starts, seg, 16, jax.random.PRNGKey(0), mesh8
    )
    assert x.shape == (16, seg, ds.n_mels)
    assert x.sharding.spec[0] == "data"
    # every row of x appears verbatim in some utterance
    all_segs = {
        arr[t : t + seg].tobytes() for u, arr in data.items()
        for t in range(arr.shape[0] - seg + 1)
    }
    for row in np.asarray(x, dtype=np.float32):
        assert row.tobytes() in all_segs


def test_sharded_devices_draw_from_disjoint_shards(dataset, mesh8):
    """Device i's samples must come only from shard i's utterances."""
    ds, data, index, seg = dataset
    sd = ShardedDeviceDataset(ds, mesh8, dtype="float32")
    plan = plan_shards(ds, 8)
    packed_host = np.asarray(
        jax.device_get(sd.packed), dtype=np.float32
    )  # (8, R, C)
    x = sample_segments_sharded(
        sd.packed, sd.starts, seg, 32, jax.random.PRNGKey(1), mesh8
    )
    x = np.asarray(x, dtype=np.float32).reshape(8, 4, seg, ds.n_mels)
    for dev in range(8):
        shard_rows = packed_host[dev]
        shard_windows = {
            shard_rows[t : t + seg].tobytes()
            for t in range(shard_rows.shape[0] - seg + 1)
        }
        for b in range(4):
            assert x[dev, b].tobytes() in shard_windows


def test_sharded_multi_step_trains(dataset, mesh8):
    ds, *_ = dataset
    sd = ShardedDeviceDataset(ds, mesh8, dtype="float32")
    cfg = dataclasses.replace(
        TINY, data_loader=DataLoader16(), inner_steps=3
    )
    init_fn, mstep = make_device_data_train_step(
        cfg, mesh8, inner_steps=3, sharded_data=True
    )
    params = init_ae(jax.random.PRNGKey(0), cfg.model)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh8, P())
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(init_fn(params), repl)
    params, opt_state, ms = mstep(
        params, opt_state, sd.packed, sd.starts,
        jax.random.PRNGKey(1), jnp.int32(0),
    )
    ms = np.asarray(ms)
    assert ms.shape == (3, 4) and np.isfinite(ms).all()


def DataLoader16():
    from adaptive_voice_conversion_tpu.core.config import DataLoaderConfig

    return DataLoaderConfig(segment_size=16, batch_size=16)


# -- chunked streaming ----------------------------------------------------------


def test_chunk_views_cover_packed_and_starts_valid(dataset):
    ds, data, index, seg = dataset
    n_mels = ds.n_mels
    chunk_bytes = 40 * n_mels * 4  # ~40 rows per chunk -> several chunks
    st = ChunkedDeviceStreamer(ds, chunk_bytes, batch_size=4, inner_steps=2)
    assert st.n_chunks > 1
    assert st.dropped_segments + st.total_segments == len(ds)
    # every chunk-local start slices a real segment of the packed array
    for c in range(st.n_chunks):
        view = st.chunk_view(c)
        assert view.shape == (st.R, n_mels)
        r0 = c * st.R
        for local in st.starts_padded[c][: int(st.n_starts[c])]:
            got = view[local : local + seg]
            np.testing.assert_array_equal(got, ds.packed[r0 + local : r0 + local + seg])


def test_chunk_schedule_deterministic_and_resumable(dataset):
    ds, *_ = dataset
    st = ChunkedDeviceStreamer(
        ds, 40 * ds.n_mels * 4, batch_size=4, inner_steps=2, seed=3
    )
    full = [(v.chunk_id, v.it0, v.k) for v in st.schedule(0, 60)]
    assert sum(k for _, _, k in full) == 60
    assert full[0][1] == 0
    # resume at step 25 must continue the identical chunk sequence
    tail = [(v.chunk_id, v.it0, v.k) for v in st.schedule(25, 35)]
    # reconstruct per-step chunk assignment and compare
    def per_step(visits, start, n):
        out = {}
        for c, it0, k in visits:
            for i in range(it0, it0 + k):
                out[i] = c
        return [out[i] for i in range(start, start + n)]

    assert per_step(tail, 25, 35) == per_step(full, 25, 35)


def test_chunk_visits_proportional_to_segments(dataset):
    ds, *_ = dataset
    st = ChunkedDeviceStreamer(
        ds, 40 * ds.n_mels * 4, batch_size=2, inner_steps=1, seed=0
    )
    steps = np.zeros(st.n_chunks)
    for v in st.schedule(0, st.epoch_steps):
        steps[v.chunk_id] += v.k
    frac = steps / steps.sum()
    want = st.n_starts / st.n_starts.sum()
    assert np.abs(frac - want).max() < 0.2


@pytest.mark.slow
def test_solver_chunked_trains_and_resumes(tmp_path):
    """End-to-end chunked training + bitwise-deterministic resume."""
    from adaptive_voice_conversion_tpu.train.solver import Solver, SolverArgs
    from test_e2e import TINY as E2E_TINY, N_MELS

    rng = np.random.default_rng(0)
    data, index = {}, []
    for i in range(12):
        n = 60 + 8 * i
        data[f"u{i}"] = rng.standard_normal((n, N_MELS)).astype(np.float32)
        for _ in range(40):
            index.append([f"u{i}", int(rng.integers(0, n - 16))])
    with open(tmp_path / "train_128.pkl", "wb") as f:
        pickle.dump(data, f)
    with open(tmp_path / "train_samples_128.json", "w") as f:
        json.dump(index, f)

    cfg = dataclasses.replace(
        E2E_TINY,
        input_mode="chunked",
        chunk_bytes=200 * N_MELS * 4,
        inner_steps=4,
    )

    def mk_args(**kw):
        from adaptive_voice_conversion_tpu.train.solver import SolverArgs

        return SolverArgs(
            data_dir=str(tmp_path),
            train_set="train_128",
            train_index_file="train_samples_128.json",
            logdir=str(tmp_path / kw.pop("log", "log")),
            store_model_path=str(tmp_path / kw.pop("model", "model")),
            summary_steps=5,
            save_steps=1000,
            **kw,
        )

    s1 = Solver(cfg, mk_args(log="log1", model="m1"))
    assert s1.data_mode == "chunked" and s1.chunked.n_chunks > 1
    m = s1.train(24, log_every_print=False)
    assert np.isfinite(m["loss"])

    # straight 24 == 12 + resume 12 (deterministic cursor)
    s2 = Solver(cfg, mk_args(log="log2", model="m2"))
    s2.train(12, log_every_print=False)
    s3 = Solver(
        cfg, mk_args(log="log3", model="m2", load_model=True)
    )
    s3.train(12, log_every_print=False)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s3.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_choose_repeats_bandwidth_math(dataset):
    """choose_repeats: smallest power-of-two whose required bandwidth
    (corpus_bytes / (r * epoch_steps * t_step)) fits under bw/margin."""
    ds, _, _, seg = dataset
    st = ChunkedDeviceStreamer(ds, 200 * 8 * 4, batch_size=4, inner_steps=2)
    t_step = 1e-3
    need1 = st.required_bandwidth(t_step, 1)
    assert need1 == pytest.approx(
        st.n_chunks * st.chunk_nbytes() / (st.epoch_steps * t_step)
    )
    assert st.required_bandwidth(t_step, 4) == pytest.approx(need1 / 4)
    # ample link -> no coarsening
    assert st.choose_repeats(t_step, bw_bytes_per_s=need1 * 10) == 1
    # link at exactly need1: margin 2 forces repeats=2
    assert st.choose_repeats(t_step, bw_bytes_per_s=need1) == 2
    # starved link caps at max_repeats
    assert st.choose_repeats(t_step, bw_bytes_per_s=need1 / 100) == 16
    # set_repeats feeds the schedule
    st.set_repeats(4)
    assert st.repeats == 4


def test_solver_auto_chunk_repeats_resolves_and_persists(tmp_path):
    """chunk_repeats='auto' resolves to a concrete int before scheduling,
    persists through checkpoints, and resume REPLAYS the stored value
    (the visit plan depends on it) rather than re-measuring."""
    from adaptive_voice_conversion_tpu.train.solver import Solver, SolverArgs
    from test_e2e import TINY as E2E_TINY, N_MELS

    rng = np.random.default_rng(0)
    data, index = {}, []
    for i in range(12):
        n = 60 + 8 * i
        data[f"u{i}"] = rng.standard_normal((n, N_MELS)).astype(np.float32)
        for _ in range(40):
            index.append([f"u{i}", int(rng.integers(0, n - 16))])
    with open(tmp_path / "train_128.pkl", "wb") as f:
        pickle.dump(data, f)
    with open(tmp_path / "train_samples_128.json", "w") as f:
        json.dump(index, f)
    cfg = dataclasses.replace(
        E2E_TINY,
        input_mode="chunked",
        chunk_bytes=200 * N_MELS * 4,
        chunk_repeats="auto",
        inner_steps=4,
    )
    args = SolverArgs(
        data_dir=str(tmp_path),
        train_set="train_128",
        train_index_file="train_samples_128.json",
        logdir=str(tmp_path / "log"),
        store_model_path=str(tmp_path / "model"),
        summary_steps=5,
        save_steps=8,
    )
    s = Solver(cfg, args)
    s.train(8, log_every_print=False)
    r = s._chunk_repeats_resolved
    assert isinstance(r, int) and r >= 1
    assert s.chunked.repeats == r
    # resume restores the resolved value from the checkpoint
    args2 = dataclasses.replace(
        args, load_model=True, logdir=str(tmp_path / "log2"),
        store_model_path=str(tmp_path / "model2"),
        load_model_path=str(tmp_path / "model"),
    )
    s2 = Solver(cfg, args2)
    assert s2._chunk_repeats_resolved == r
    s2.train(4, log_every_print=False)
    assert s2.chunked.repeats == r


def test_solver_auto_picks_chunked_when_over_budget(tmp_path):
    from adaptive_voice_conversion_tpu.train.solver import Solver
    from test_e2e import TINY as E2E_TINY, N_MELS

    rng = np.random.default_rng(1)
    data, index = {}, []
    for i in range(4):
        data[f"u{i}"] = rng.standard_normal((80, N_MELS)).astype(np.float32)
        for _ in range(10):
            index.append([f"u{i}", int(rng.integers(0, 80 - 16))])
    with open(tmp_path / "train_128.pkl", "wb") as f:
        pickle.dump(data, f)
    with open(tmp_path / "train_samples_128.json", "w") as f:
        json.dump(index, f)
    cfg = dataclasses.replace(
        E2E_TINY, input_mode="auto", device_data_budget_bytes=3 * 80 * N_MELS
    )
    from adaptive_voice_conversion_tpu.train.solver import SolverArgs

    args = SolverArgs(
        data_dir=str(tmp_path),
        train_set="train_128",
        train_index_file="train_samples_128.json",
        logdir=str(tmp_path / "log"),
        store_model_path=str(tmp_path / "model"),
    )
    s = Solver(cfg, args)
    assert s.data_mode == "chunked"


@pytest.mark.slow
def test_solver_device_sharded_end_to_end(tmp_path, mesh8):
    """Solver with the dataset sharded over the 8-device data axis."""
    from adaptive_voice_conversion_tpu.train.solver import Solver, SolverArgs
    from test_e2e import TINY as E2E_TINY, N_MELS

    rng = np.random.default_rng(2)
    data, index = {}, []
    for i in range(24):
        n = 60 + 4 * (i % 5)
        data[f"u{i}"] = rng.standard_normal((n, N_MELS)).astype(np.float32)
        for _ in range(20):
            index.append([f"u{i}", int(rng.integers(0, n - 16))])
    with open(tmp_path / "train_128.pkl", "wb") as f:
        pickle.dump(data, f)
    with open(tmp_path / "train_samples_128.json", "w") as f:
        json.dump(index, f)
    cfg = dataclasses.replace(
        E2E_TINY,
        input_mode="device_sharded",
        inner_steps=4,
        data_loader=dataclasses.replace(E2E_TINY.data_loader, batch_size=16),
    )
    args = SolverArgs(
        data_dir=str(tmp_path),
        train_set="train_128",
        train_index_file="train_samples_128.json",
        logdir=str(tmp_path / "log"),
        store_model_path=str(tmp_path / "model"),
        summary_steps=4,
        save_steps=1000,
    )
    s = Solver(cfg, args, mesh=mesh8)
    assert s.data_mode == "device_sharded"
    assert s.device_data.packed.shape[0] == 8
    m = s.train(12, log_every_print=False)
    assert np.isfinite(m["loss"]) and m["loss_rec"] > 0
