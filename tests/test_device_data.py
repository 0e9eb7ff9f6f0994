"""Device-resident data path tests: on-device sampling correctness,
deterministic multi-step training, sharded == unsharded, remainder chunks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from adaptive_voice_conversion_tpu.core.mesh import make_mesh, replicated_sharding
from adaptive_voice_conversion_tpu.data.dataset import SegmentDataset
from adaptive_voice_conversion_tpu.data.device_sampler import (
    DeviceResidentDataset,
    sample_segments,
)
from adaptive_voice_conversion_tpu.models import init_ae
from adaptive_voice_conversion_tpu.train.step import make_device_data_train_step

from test_train import TINY
from test_data import artifacts  # fixture: reference-format artifacts


def test_device_resident_matches_host_gather(artifacts):
    pkl, idx, data, index, seg = artifacts
    ds = SegmentDataset(pkl, idx, segment_size=seg)
    dev = DeviceResidentDataset(ds, dtype="float32")
    key = jax.random.PRNGKey(0)
    x = np.asarray(sample_segments(dev.packed, dev.starts, seg, 4, key))
    # reproduce selection on host
    sel = np.asarray(jax.random.randint(key, (4,), 0, dev.starts.shape[0]))
    expected = ds.gather(sel)
    np.testing.assert_allclose(x, expected, atol=1e-6)


def test_device_resident_bf16_roundtrip(artifacts):
    pkl, idx, *_, seg = artifacts
    ds = SegmentDataset(pkl, idx, segment_size=seg, storage_dtype="bfloat16")
    dev = DeviceResidentDataset(ds, dtype="bfloat16")
    assert dev.packed.dtype == jnp.bfloat16
    # bitcast through uint16 must be value-preserving vs the host bf16 array
    np.testing.assert_array_equal(
        np.asarray(dev.packed).view(np.uint16), ds.packed.view(np.uint16)
    )


def test_multi_step_trains_and_is_deterministic(artifacts):
    pkl, idx, *_, seg = artifacts
    ds = SegmentDataset(pkl, idx, segment_size=seg)
    dev = DeviceResidentDataset(ds, dtype="float32")
    init_fn, mstep = make_device_data_train_step(TINY, inner_steps=5)

    def run():
        params = init_ae(jax.random.PRNGKey(0), TINY.model)
        opt = init_fn(params)
        outs = []
        for chunk in range(3):
            params, opt, ms = mstep(
                params, opt, dev.packed, dev.starts, jax.random.PRNGKey(9),
                jnp.int32(chunk * 5),
            )
            outs.append(np.asarray(ms))
        return np.concatenate(outs)

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()
    # loss decreases over the 15 fused steps
    assert a[-1, 0] < a[0, 0]


@pytest.mark.slow
def test_multi_step_sharded_matches_unsharded(artifacts):
    pkl, idx, *_, seg = artifacts
    ds = SegmentDataset(pkl, idx, segment_size=seg)
    mesh = make_mesh(n_data=8)
    dev1 = DeviceResidentDataset(ds, dtype="float32")
    dev8 = DeviceResidentDataset(ds, mesh=mesh, dtype="float32")

    init1, m1 = make_device_data_train_step(TINY, None, inner_steps=2)
    init8, m8 = make_device_data_train_step(TINY, mesh, inner_steps=2)

    p1 = init_ae(jax.random.PRNGKey(0), TINY.model)
    o1 = init1(p1)
    p8 = jax.device_put(
        init_ae(jax.random.PRNGKey(0), TINY.model), replicated_sharding(mesh)
    )
    o8 = jax.tree.map(lambda l: jax.device_put(l, replicated_sharding(mesh)), init8(p8))

    key = jax.random.PRNGKey(4)
    p1, o1, ms1 = m1(p1, o1, dev1.packed, dev1.starts, key, jnp.int32(0))
    p8, o8, ms8 = m8(p8, o8, dev8.packed, dev8.starts, key, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(ms1), np.asarray(ms8), rtol=2e-5)


@pytest.mark.slow
def test_solver_auto_selects_device_mode(tmp_path, artifacts):
    import dataclasses

    from adaptive_voice_conversion_tpu.train.solver import Solver, SolverArgs

    pkl, idx, *_ , seg = artifacts
    import shutil, os

    shutil.copy(pkl, tmp_path / "train_128.pkl")
    shutil.copy(idx, tmp_path / "train_samples_128.json")
    cfg = dataclasses.replace(
        TINY,
        data_loader=dataclasses.replace(TINY.data_loader, segment_size=seg, batch_size=4),
        inner_steps=3,
    )
    args = SolverArgs(
        data_dir=str(tmp_path), train_set="train_128",
        train_index_file="train_samples_128.json",
        logdir=str(tmp_path / "log"), store_model_path=str(tmp_path / "m"),
        summary_steps=3, save_steps=100,
    )
    s = Solver(cfg, args)
    assert s.device_mode
    m = s.train(7, log_every_print=False)  # 2 full chunks + remainder of 1
    assert np.isfinite(m["loss"])
    assert s.iteration == 7
