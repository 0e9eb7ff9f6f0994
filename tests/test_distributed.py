"""Distributed data-parallel tests on the 8-virtual-device CPU mesh
(SURVEY.md §4.4): sharded step == single-device step, batch actually sharded,
eval step sharding, and mesh utilities."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from adaptive_voice_conversion_tpu.core.mesh import (
    batch_sharding,
    local_batch_size,
    make_mesh,
    put_global_from_full,
    replicated_sharding,
)
from adaptive_voice_conversion_tpu.models import init_ae
from adaptive_voice_conversion_tpu.train import make_eval_step, make_train_step

from test_train import TINY, batch


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh(n_data=8)


def test_mesh_shapes(mesh8):
    assert mesh8.shape["data"] == 8
    assert mesh8.shape["model"] == 1
    assert local_batch_size(128, mesh8) == 128  # single process owns all


@pytest.mark.slow
def test_sharded_step_matches_single_device(mesh8):
    """Gradient reduction over the data axis must reproduce the single-device
    step exactly (psum of per-shard grads == full-batch grads)."""
    params = init_ae(jax.random.PRNGKey(0), TINY.model)
    x = batch(b=8)
    rng = jax.random.PRNGKey(3)
    lam = jnp.float32(0.7)

    init_fn, step1 = make_train_step(TINY, mesh=None)
    p1 = jax.tree.map(jnp.array, params)
    s1 = init_fn(p1)
    p1, s1, m1 = step1(p1, s1, x, rng, lam)

    init_fn8, step8 = make_train_step(TINY, mesh=mesh8)
    p8 = jax.device_put(jax.tree.map(jnp.array, params), replicated_sharding(mesh8))
    s8 = jax.tree.map(
        lambda l: jax.device_put(l, replicated_sharding(mesh8)), init_fn8(params)
    )
    x8 = jax.device_put(x, batch_sharding(mesh8))
    p8, s8, m8 = step8(p8, s8, x8, rng, lam)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m8["grad_norm"]), rtol=1e-5
    )
    l1 = jax.tree_util.tree_leaves(p1)
    l8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_put_global_from_full_places_and_shards(mesh8):
    """put_global_from_full (the multi-controller serving input path):
    single-process it must equal a plain sharded device_put — same values,
    batch axis actually sharded over 'data', non-divisible and int inputs
    included."""
    rng = np.random.default_rng(0)
    for shape, dtype in [((16, 5, 3), np.float32), ((16,), np.int32)]:
        full = (rng.standard_normal(shape) * 10).astype(dtype)
        got = put_global_from_full(full, mesh8, P("data"))
        ref = jax.device_put(full, NamedSharding(mesh8, P("data")))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        assert got.sharding.spec == P("data")
        assert len(got.addressable_shards) == 8
        assert got.addressable_shards[0].data.shape[0] == shape[0] // 8


def test_batch_is_actually_sharded(mesh8):
    x = jax.device_put(batch(b=8), batch_sharding(mesh8))
    # each device holds 1/8 of the batch
    shard_shapes = {s.data.shape for s in x.addressable_shards}
    assert shard_shapes == {(1, 16, 8)}


def test_eval_step_sharded(mesh8):
    params = jax.device_put(
        init_ae(jax.random.PRNGKey(0), TINY.model), replicated_sharding(mesh8)
    )
    ev = make_eval_step(TINY, mesh8)
    x8 = jax.device_put(batch(b=8), batch_sharding(mesh8))
    m = ev(params, x8, jnp.float32(1.0))
    assert np.isfinite(float(m["loss"]))

    ev1 = make_eval_step(TINY, None)
    m1 = ev1(init_ae(jax.random.PRNGKey(0), TINY.model), batch(b=8), jnp.float32(1.0))
    np.testing.assert_allclose(float(m["loss"]), float(m1["loss"]), rtol=1e-5)


def test_mesh_2d_tensor_axis():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


@pytest.mark.slow
def test_tp_step_matches_single_device():
    """dp4 x tp2: channel-sharded params + batch sharding must reproduce the
    single-device training step (grad psum over 'data', channel-contraction
    reductions over 'model' — both inserted by GSPMD)."""
    from adaptive_voice_conversion_tpu.parallel.tp import (
        make_tp_train_step,
        shard_params_tp,
        tp_param_specs,
    )

    mesh = make_mesh(n_data=4, n_model=2)
    params = init_ae(jax.random.PRNGKey(0), TINY.model)
    x = batch(b=8)
    rng = jax.random.PRNGKey(3)
    lam = jnp.float32(0.7)

    init1, step1 = make_train_step(TINY, mesh=None)
    p1 = jax.tree.map(jnp.array, params)
    s1 = init1(p1)
    p1, s1, m1 = step1(p1, s1, x, rng, lam)

    init_tp, step_tp = make_tp_train_step(TINY, mesh)
    ptp = shard_params_tp(jax.tree.map(jnp.array, params), mesh)
    # at least one leaf must actually be channel-sharded over 'model'
    sharded_leaves = [
        l
        for l in jax.tree.leaves(ptp)
        if len({s.data.shape for s in l.addressable_shards}) == 1
        and next(iter({s.data.shape for s in l.addressable_shards})) != l.shape
    ]
    assert sharded_leaves, "tp specs produced a fully replicated tree"
    stp = init_tp(ptp)
    xtp = jax.device_put(x, batch_sharding(mesh))
    ptp, stp, mtp = step_tp(ptp, stp, xtp, rng, lam)

    np.testing.assert_allclose(float(m1["loss"]), float(mtp["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(mtp["grad_norm"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(ptp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-6, rtol=1e-5
        )

    # Megatron pairing: 'first' convs column-parallel, 'second' row-parallel
    specs = tp_param_specs(params, 2)
    flat = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(specs)[0]
    }
    assert flat["['content_encoder']['conv_blocks'][0]['first']['w']"][-1] == "model"
    assert flat["['content_encoder']['conv_blocks'][0]['second']['w']"][-2] == "model"
    assert flat["['content_encoder']['conv_blocks'][0]['second']['b']"] == ()


def test_convert_grid_sharded_over_mesh_matches_single(tmp_path):
    """Distributed serving: the conversion grid sharded over an 8-device
    'data' mesh (params replicated, pair batch sharded, batch padded to
    the mesh multiple) must produce the same mels/wavs as the meshless
    grid."""
    import dataclasses
    import pickle

    from adaptive_voice_conversion_tpu.core.config import SignalConfig
    from adaptive_voice_conversion_tpu.core.mesh import make_mesh
    from adaptive_voice_conversion_tpu.infer.inferencer import Inferencer
    from adaptive_voice_conversion_tpu.models import init_ae

    from test_e2e import TINY, N_MELS

    signal = SignalConfig(
        sr=8000, n_fft=256, hop_length=64, win_length=192, n_mels=N_MELS,
        n_iter=2,
    )
    cfg = dataclasses.replace(TINY, signal=signal)
    params = init_ae(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(11)
    attr = {"mean": np.zeros(N_MELS, np.float32), "std": np.ones(N_MELS, np.float32)}
    attr_path = str(tmp_path / "attr.pkl")
    with open(attr_path, "wb") as f:
        pickle.dump(attr, f)
    srcs = [rng.standard_normal((L, N_MELS)).astype(np.float32) for L in (40, 29, 33)]
    tgts = [rng.standard_normal((L, N_MELS)).astype(np.float32) for L in (24, 31)]
    # 3 x 2 = 6 pairs on an 8-device mesh -> pads 2 rows internally
    mesh = make_mesh(n_data=8, devices=jax.devices()[:8])
    inf_mesh = Inferencer(cfg, params, attr_path, mesh=mesh)
    inf_single = Inferencer(cfg, params, attr_path)
    wavs_m, mels_m = inf_mesh.convert_grid(
        srcs, tgts, gl_iters=4, trim=False, return_mels=True
    )
    wavs_s, mels_s = inf_single.convert_grid(
        srcs, tgts, gl_iters=4, trim=False, return_mels=True
    )
    assert len(wavs_m) == len(wavs_s) == 6
    for a, b in zip(mels_m, mels_s):
        np.testing.assert_allclose(a, b, atol=1e-5)
    for a, b in zip(wavs_m, wavs_s):
        # sharded-vs-single matmul partitioning reorders reductions; the
        # ~1e-5 mel noise is amplified exponentially by the dB->amplitude
        # map and Griffin-Lim's phase iteration (see tests/test_masked.py
        # conditioning note), so the wav check is peak-relative
        peak = max(float(np.abs(b).max()), 1.0)
        np.testing.assert_allclose(a, b, atol=1e-2 * peak)
