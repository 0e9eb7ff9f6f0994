"""Worker for the 2-process jax.distributed integration test.

Spawned by tests/test_multihost.py with argv:
    process_id num_processes coordinator_port artifacts_dir

Each process owns 2 virtual CPU devices (4 global). The worker initializes
the multi-host runtime through core.mesh.init_multihost, loads its DISJOINT
per-host slice of a shared synthetic dataset via the loader's
host_index/host_count sharding, assembles the global batch with
jax.make_array_from_process_local_data, and runs ONE sharded train step.
It prints machine-readable lines the parent asserts on:

    DEVICES <local> <global> <process_count>
    SLICE <sha1 of the local batch bytes>
    LOSS <loss> <loss_rec> <loss_kl> <grad_norm>
"""

import hashlib
import os
import sys


def main() -> None:
    pid, nproc, port, art = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2 "
        + os.environ.get("XLA_FLAGS", "")
    )

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from adaptive_voice_conversion_tpu.core.mesh import (
        init_multihost,
        local_batch_size,
        make_mesh,
    )

    init_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid
    print(
        f"DEVICES {len(jax.local_devices())} {len(jax.devices())} "
        f"{jax.process_count()}",
        flush=True,
    )

    from adaptive_voice_conversion_tpu.data.dataset import SegmentDataset
    from adaptive_voice_conversion_tpu.data.loader import (
        as_wire_format,
        batch_iterator,
    )
    from adaptive_voice_conversion_tpu.models import init_ae
    from adaptive_voice_conversion_tpu.train import make_train_step
    from test_train import TINY

    mesh = make_mesh(n_data=len(jax.devices()))
    global_batch = 8
    assert local_batch_size(global_batch, mesh) == global_batch // nproc

    ds = SegmentDataset(
        os.path.join(art, "d.pkl"),
        os.path.join(art, "i.json"),
        TINY.data_loader.segment_size,
    )
    local = next(
        batch_iterator(
            ds,
            global_batch,
            seed=1,
            host_index=jax.process_index(),
            host_count=jax.process_count(),
        )
    )
    print(
        "SLICE " + hashlib.sha1(np.ascontiguousarray(local).tobytes()).hexdigest(),
        flush=True,
    )

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    x = jax.make_array_from_process_local_data(
        batch_sh, as_wire_format(local)
    )

    params = jax.jit(
        lambda: init_ae(jax.random.PRNGKey(0), TINY.model), out_shardings=repl
    )()
    init_fn, step = make_train_step(TINY, mesh)
    opt_state = jax.jit(init_fn, out_shardings=repl)(params)
    rng = jax.random.PRNGKey(3)
    params, opt_state, m = step(params, opt_state, x, rng, jnp.float32(0.5))
    vals = [float(m[k]) for k in ("loss", "loss_rec", "loss_kl", "grad_norm")]
    assert all(np.isfinite(v) for v in vals), vals
    print("LOSS " + " ".join(f"{v:.8f}" for v in vals), flush=True)


if __name__ == "__main__":
    main()
