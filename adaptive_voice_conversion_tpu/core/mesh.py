"""Device mesh and sharding utilities.

The reference's entire "distributed backend" is a single `.to('cuda')` call
(reference: utils.py:8-10). Here the equivalent is a `jax.sharding.Mesh`:
the AdaIN-VC model (~15M params) is replicated; the batch axis is sharded
over the ``data`` mesh axis, so gradient reduction is an XLA ``psum``
riding ICI. Multi-host pods add a DCN-crossing outer data axis via
`jax.distributed.initialize`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh.

    ``n_model`` > 1 enables tensor-parallel channel sharding of the conv
    stacks (useful only for much larger variants of the model; the default
    config replicates the model and uses pure DP).
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} does not cover {len(devices)} devices"
        )
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host JAX runtime (one process per host).

    On TPU pods with the standard environment variables set this is a bare
    `jax.distributed.initialize()`; arguments are for manual/CPU setups.
    No-op if already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized (or single-process run) — fine either way
        pass


def put_global(
    local_data: np.ndarray, mesh: Mesh, spec: P = P()
) -> jax.Array:
    """Place host data as a GLOBAL array on a mesh that may span processes.

    Single-process: a plain ``device_put`` to the NamedSharding. Multi-
    process: ``jax.make_array_from_process_local_data`` — each process
    supplies only the block its addressable devices own (for a sharded
    ``spec``) or the full array (replicated ``spec``), and the result is a
    global array usable in multi-controller ``jit``. This is what lets the
    fast device-resident / HBM-sharded data paths run under
    ``jax.distributed`` instead of falling back to per-batch host streaming
    (the reference's only mode — reference: data_utils.py:43-57).
    """
    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local_data, sh)
    return jax.make_array_from_process_local_data(sh, local_data)


def put_global_from_full(
    full: np.ndarray, mesh: Mesh, spec: P = P(DATA_AXIS)
) -> jax.Array:
    """Place an array that EVERY process holds in full onto a (possibly
    multi-process) mesh sharding.

    The serving-side complement of ``put_global``: in multi-controller
    serving each host sees the same request (the same padded pair batch),
    so rather than pre-slicing per-process blocks, each process hands the
    full array and ``make_array_from_process_local_data`` (with
    ``global_shape=full.shape``) takes the slices its addressable devices
    own. Single-process reduces to a plain sharded ``device_put``.
    """
    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(full, sh)
    return jax.make_array_from_process_local_data(
        sh, full, global_shape=full.shape
    )


def replicate_pytree(tree, mesh: Mesh):
    """Replicate a host/device pytree onto every device of a (possibly
    multi-process) mesh. Leaves are routed through host numpy so the call
    is legal in multi-controller mode (uncommitted single-device arrays
    cannot be fed to a jit spanning processes)."""
    return jax.tree.map(
        lambda a: put_global(np.asarray(a), mesh, P()), tree
    )


def shard_rows_for_process(mesh: Mesh, data_axis: str = "data") -> np.ndarray:
    """Indices along the data axis whose devices this process owns.

    With the standard ``make_mesh`` layout (jax.devices() is ordered by
    process) these are contiguous, which is what
    ``make_array_from_process_local_data`` requires of the local block.
    """
    devs = mesh.devices.reshape(mesh.shape[data_axis], -1)
    for row in devs:
        procs = {d.process_index for d in row}
        if len(procs) > 1:
            raise ValueError(
                f"data-axis row {list(row)} spans processes {sorted(procs)}; "
                "per-process row ownership is ill-defined — lay the mesh out "
                "so each data row's devices belong to one process"
            )
    mine = np.array(
        [d[0].process_index == jax.process_index() for d in devs]
    )
    idx = np.flatnonzero(mine)
    if idx.size and not np.array_equal(
        idx, np.arange(idx[0], idx[0] + idx.size)
    ):
        raise ValueError(
            "process-local mesh rows are not contiguous along the data axis; "
            "construct the mesh from jax.devices() order (core.mesh.make_mesh)"
        )
    return idx


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    """Per-host share of the global batch for the host data loader."""
    n_data = mesh.shape[DATA_AXIS]
    if global_batch_size % n_data != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by data axis {n_data}"
        )
    per_device = global_batch_size // n_data
    local_devices = len(
        [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
    )
    return per_device * max(local_devices, 1)
