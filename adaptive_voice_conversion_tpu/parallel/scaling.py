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
        row = {
            "devices": n,
            "global_batch": scfg.data_loader.batch_size,
            "audio_s_per_s": round(thr, 1),
        }
        # On virtual CPU devices the sweep validates that the sharded
        # program compiles+runs at each width; wall-clock there measures
        # host CPU contention, not the framework, so recording an
        # "efficiency" number would invite misreading (round-4 verdict).
        # The real scaling story on hardware is the analytic v4-32 bound
        # in BASELINE.md.
        if jax.default_backend() == "cpu":
            row["validation_only"] = True
        else:
            row["efficiency_vs_linear"] = round(thr / (base * n), 3)
        results.append(row)
    return results


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse
    import json

    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="1,2,4,8")
    p.add_argument("--bf16", action="store_true")
    p.add_argument(
        "--tiny",
        action="store_true",
        help="reduced model/batch: for validating the sharded program on "
        "virtual CPU devices, where full-config XLA-CPU compiles are "
        "minutes each (wall-clock efficiency is only meaningful on real "
        "multi-chip hardware either way)",
    )
    p.add_argument("--out", default=None, help="also write a JSON artifact")
    args = p.parse_args(argv)
    import dataclasses

    cfg = TrainConfig()
    if args.bf16:
        cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    if args.tiny:
        from ..core.config import (
            AEConfig,
            ContentEncoderConfig,
            DataLoaderConfig,
            DecoderConfig,
            SpeakerEncoderConfig,
        )

        cfg = dataclasses.replace(
            cfg,
            model=AEConfig(
                speaker_encoder=SpeakerEncoderConfig(
                    c_in=16, c_h=16, c_out=16, kernel_size=5, bank_size=4,
                    bank_scale=1, c_bank=8, n_conv_blocks=2,
                    n_dense_blocks=1, subsample=(1, 2),
                ),
                content_encoder=ContentEncoderConfig(
                    c_in=16, c_h=16, c_out=16, kernel_size=5, bank_size=4,
                    bank_scale=1, c_bank=8, n_conv_blocks=2, subsample=(1, 2),
                ),
                decoder=DecoderConfig(
                    c_in=16, c_cond=16, c_h=16, c_out=16, kernel_size=5,
                    n_conv_blocks=2, upsample=(2, 1),
                ),
            ),
            data_loader=DataLoaderConfig(segment_size=32, batch_size=16),
            inner_steps=4,
        )
    sizes = [int(s) for s in args.sizes.split(",")]
    rows = scaling_sweep(cfg, sizes)
    for row in rows:
        print(json.dumps(row))
    if args.out:
        artifact = {
            "backend": jax.default_backend(),
            "n_devices": len(jax.devices()),
            "virtual_devices": jax.default_backend() == "cpu",
            "tiny_config": bool(args.tiny),
            "note": (
                "weak-scaling sweep; on virtual CPU devices this validates "
                "the sharded program at each width — efficiency numbers are "
                "only meaningful on real multi-chip hardware"
            ),
            "rows": rows,
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=2)


if __name__ == "__main__":
    main()
