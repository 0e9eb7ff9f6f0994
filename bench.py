"""Benchmark: training throughput of the TPU-native AdaIN-VC framework.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "audio-s/s", "vs_baseline": N, ...}

Headline: end-to-end training audio-seconds/s on the flagship config
(batch 128, 128-frame segments = 204.8 audio-s per step; train.sh:1,
config.yaml:38-40) on one chip, using the production input path the Solver
auto-selects: the packed dataset resident in HBM with on-device segment
sampling and ``inner_steps`` iterations fused per XLA call
(train/step.py make_device_data_train_step).

vs_baseline: ratio against the reference implementation's training
throughput on this host's CPU (torch, 2 threads, functionally identical
model/step; measured once on this machine = 30.3 audio-s/s — the reference
publishes no numbers and its GPU path needs CUDA; see BASELINE.md).

Extra fields: host-streamed throughput (the fallback path for datasets
exceeding HBM) and step timings.
"""

import json
import time

import numpy as np

# Reference-equivalent torch-CPU training throughput measured on this host
# (2 vCPUs, torch 2.13 cpu, batch 8 scaled linearly; see BASELINE.md).
TORCH_CPU_BASELINE_AUDIO_S_PER_S = 30.3

WARMUP_CHUNKS = 2
MEASURE_CHUNKS = 50
INNER_STEPS = 10


def main() -> None:
    import dataclasses
    import os
    import pickle
    import tempfile
    import json as _json

    import jax
    import jax.numpy as jnp

    from adaptive_voice_conversion_tpu.core.config import TrainConfig
    from adaptive_voice_conversion_tpu.data.dataset import SegmentDataset
    from adaptive_voice_conversion_tpu.data.device_sampler import (
        DeviceResidentDataset,
    )
    from adaptive_voice_conversion_tpu.data.loader import (
        as_wire_format,
        batch_iterator,
        device_prefetch,
    )
    from adaptive_voice_conversion_tpu.models import init_ae
    from adaptive_voice_conversion_tpu.train import make_train_step
    from adaptive_voice_conversion_tpu.train.step import (
        make_device_data_train_step,
    )

    cfg = dataclasses.replace(
        TrainConfig(),
        compute_dtype="bfloat16",
        data_dtype="bfloat16",
        inner_steps=INNER_STEPS,
    )
    c = cfg.data_loader
    audio_s_per_batch = (
        c.batch_size * c.segment_size * cfg.signal.hop_length / cfg.signal.sr
    )

    # synthetic dataset through the real artifact loading path
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="avc_bench_")
    data = {
        f"u{i}": rng.standard_normal((1000, 512)).astype(np.float32)
        for i in range(40)
    }
    index = [
        [f"u{i % 40}", int(rng.integers(0, 1000 - c.segment_size))]
        for i in range(20000)
    ]
    with open(os.path.join(tmp, "d.pkl"), "wb") as f:
        pickle.dump(data, f)
    with open(os.path.join(tmp, "i.json"), "w") as f:
        _json.dump(index, f)
    ds = SegmentDataset(
        os.path.join(tmp, "d.pkl"),
        os.path.join(tmp, "i.json"),
        c.segment_size,
        storage_dtype=cfg.data_dtype,
    )

    params = init_ae(jax.random.PRNGKey(0), cfg.model)

    # --- production path: device-resident data, scanned multi-step ---
    dev = DeviceResidentDataset(ds, dtype="bfloat16")
    init_fn, multi_step = make_device_data_train_step(
        cfg, inner_steps=INNER_STEPS
    )
    opt_state = init_fn(params)
    key = jax.random.PRNGKey(1)
    for i in range(WARMUP_CHUNKS):
        params, opt_state, ms = multi_step(
            params, opt_state, dev.packed, dev.starts, key,
            jnp.int32(i * INNER_STEPS),
        )
    np.asarray(ms)  # materialize (block_until_ready alone can return early
    # through the axon transfer path; a host fetch cannot)
    t0 = time.time()
    for i in range(MEASURE_CHUNKS):
        params, opt_state, ms = multi_step(
            params, opt_state, dev.packed, dev.starts, key,
            jnp.int32((WARMUP_CHUNKS + i) * INNER_STEPS),
        )
    final_ms = np.asarray(ms)
    device_dt = (time.time() - t0) / (MEASURE_CHUNKS * INNER_STEPS)
    assert np.isfinite(final_ms).all()

    # --- fallback path: host-streamed batches (dataset > HBM budget) ---
    init_fn_h, step = make_train_step(cfg)
    params_h = init_ae(jax.random.PRNGKey(0), cfg.model)
    opt_h = init_fn_h(params_h)
    it = batch_iterator(ds, c.batch_size, frame_size=c.frame_size, seed=0)
    it = device_prefetch(it, lambda x: jax.device_put(as_wire_format(x)))
    lam = jnp.float32(0.5)
    for _ in range(4):
        params_h, opt_h, m = step(params_h, opt_h, next(it), key, lam)
    jax.block_until_ready(m)
    t0 = time.time()
    for _ in range(20):
        params_h, opt_h, m = step(params_h, opt_h, next(it), key, lam)
    jax.block_until_ready(m)
    host_dt = (time.time() - t0) / 20

    value = audio_s_per_batch / device_dt
    out = {
        "metric": "train_audio_s_per_s_per_chip",
        "value": round(value, 1),
        "unit": "audio-s/s",
        "vs_baseline": round(value / TORCH_CPU_BASELINE_AUDIO_S_PER_S, 1),
        "host_stream_audio_s_per_s": round(audio_s_per_batch / host_dt, 1),
        "step_ms_device_resident": round(device_dt * 1000, 2),
        "step_ms_host_stream": round(host_dt * 1000, 2),
        "config": "batch128 seg128 bf16 device-resident K=10",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
