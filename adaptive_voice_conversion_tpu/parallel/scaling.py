"""Data-parallel scaling sweep harness.

Measures training audio-seconds/s at increasing data-parallel widths
(1 chip -> N chips) and reports scaling efficiency vs linear — the
BASELINE.json target is >=90% at v4-32 scale. On a single-chip or CPU
environment the sweep runs over virtual devices
(--xla_force_host_platform_device_count) to validate the sharded program;
wall-clock efficiency numbers are only meaningful on real multi-chip
hardware.

Run:  python -m adaptive_voice_conversion_tpu.parallel.scaling [--sizes 1,2,4,8]
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TrainConfig
from ..core.mesh import make_mesh, replicated_sharding
from ..models.ae import init_ae
from ..train.step import make_device_data_train_step


def scaling_sweep(
    cfg: TrainConfig,
    sizes: Sequence[int],
    n_frames: int = 40_000,
    chunks: int = 5,
    seed: int = 0,
) -> List[dict]:
    """For each mesh size, run the fused multi-step trainer on synthetic
    device-resident data (global batch = cfg.data_loader.batch_size scaled
    by mesh size — weak scaling, constant per-chip work) and report
    audio-s/s + efficiency vs the 1-device run."""
    import dataclasses

    rng = np.random.default_rng(seed)
    n_mels = cfg.model.speaker_encoder.c_in
    packed_host = rng.standard_normal((n_frames, n_mels)).astype(np.float32)
    starts_host = rng.integers(
        0, n_frames - cfg.data_loader.segment_size, size=20_000
    ).astype(np.int32)

    results = []
    base = None
    for n in sizes:
        if n > len(jax.devices()):
            break
        scfg = dataclasses.replace(
            cfg,
            data_loader=dataclasses.replace(
                cfg.data_loader, batch_size=cfg.data_loader.batch_size * n
            ),
        )
        mesh = make_mesh(n_data=n, devices=jax.devices()[:n]) if n > 1 else None
        repl = replicated_sharding(mesh) if mesh else None
        put = (lambda a: jax.device_put(a, repl)) if mesh else jax.device_put
        packed = put(packed_host)
        starts = put(starts_host)
        params = init_ae(jax.random.PRNGKey(seed), scfg.model)
        init_fn, mstep = make_device_data_train_step(
            scfg, mesh, inner_steps=scfg.inner_steps
        )
        opt = init_fn(params)
        if mesh:
            params = jax.device_put(params, repl)
            opt = jax.tree.map(lambda l: jax.device_put(l, repl), opt)
        key = jax.random.PRNGKey(seed + 1)
        # warmup/compile
        params, opt, ms = mstep(params, opt, packed, starts, key, jnp.int32(0))
        np.asarray(ms)
        t0 = time.time()
        for i in range(chunks):
            params, opt, ms = mstep(
                params, opt, packed, starts, key,
                jnp.int32((i + 1) * scfg.inner_steps),
            )
        np.asarray(ms)
        dt = (time.time() - t0) / (chunks * scfg.inner_steps)
        audio_s = (
            scfg.data_loader.batch_size
            * scfg.data_loader.segment_size
            * scfg.signal.hop_length
            / scfg.signal.sr
        )
        thr = audio_s / dt
        if base is None:
            base = thr
        results.append(
            {
                "devices": n,
                "global_batch": scfg.data_loader.batch_size,
                "audio_s_per_s": round(thr, 1),
                "efficiency_vs_linear": round(thr / (base * n), 3),
            }
        )
    return results


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse
    import json

    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="1,2,4,8")
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args(argv)
    import dataclasses

    cfg = TrainConfig()
    if args.bf16:
        cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    sizes = [int(s) for s in args.sizes.split(",")]
    for row in scaling_sweep(cfg, sizes):
        print(json.dumps(row))


if __name__ == "__main__":
    main()
