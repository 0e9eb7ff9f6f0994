"""Dataset sharded over the 'data' mesh axis: each device holds a disjoint
utterance shard in its own HBM and samples its batch share locally.

This lifts the device-resident capacity ceiling from one chip's HBM to the
whole mesh's aggregate HBM (the reference holds the entire pickle in every
DataLoader worker's RAM — data_utils.py:45-46 — and has no notion of device
residency at all). Uniform-over-segments sampling is preserved: shards are
balanced to equal segment counts (greedy LPT over per-utterance counts,
then truncated to the global minimum — the dropped remainder is reported,
never silent) and every device draws an equal batch share uniformly from
its local starts, so every surviving segment has identical probability.

Layout: stacked host arrays ``packed (n_shards, R, n_mels)`` and shard-local
``starts (n_shards, S)`` placed with ``NamedSharding(mesh, P('data'))`` —
XLA keeps exactly one (R, n_mels) shard per device, no replication.
Sampling happens inside the jitted train step via ``shard_map``
(train/step.py make_device_data_train_step(sharded_data=True)).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .dataset import SegmentDataset


@dataclass
class ShardPlan:
    """Host-side partition of a SegmentDataset into n_shards balanced shards."""

    utt_rows: List[np.ndarray]  # per shard: (row0, row1) ranges, concatenated
    n_rows: int  # common padded row count R
    n_starts: int  # common truncated start count S
    dropped_segments: int


def plan_shards(dataset: SegmentDataset, n_shards: int) -> ShardPlan:
    """Greedy LPT partition of utterances, balancing segment counts."""
    offsets = dataset._offsets
    n_utt = len(dataset.utt_ids)
    # per-utterance segment counts from the index
    utt_of_start = np.searchsorted(offsets, dataset.starts, side="right") - 1
    seg_counts = np.bincount(utt_of_start, minlength=n_utt)

    order = np.argsort(seg_counts)[::-1]  # largest first
    shard_load = np.zeros(n_shards, dtype=np.int64)
    shard_rows = np.zeros(n_shards, dtype=np.int64)
    assign = np.empty(n_utt, dtype=np.int64)
    lengths = np.diff(offsets)
    for u in order:
        s = int(np.argmin(shard_load))
        assign[u] = s
        shard_load[s] += seg_counts[u]
        shard_rows[s] += lengths[u]

    n_starts = int(shard_load.min())
    if n_starts == 0:
        raise ValueError(
            f"cannot shard {n_utt} utterances / {len(dataset.starts)} segments "
            f"over {n_shards} devices: a shard would be empty — use the "
            "replicated device path (input_mode='device') for tiny datasets"
        )
    dropped = int(shard_load.sum() - n_starts * n_shards)
    utt_rows = [np.flatnonzero(assign == s) for s in range(n_shards)]
    return ShardPlan(
        utt_rows=utt_rows,
        n_rows=int(shard_rows.max()),
        n_starts=n_starts,
        dropped_segments=dropped,
    )


class ShardedDeviceDataset:
    """Packed mel dataset living sharded across the mesh's 'data' axis."""

    def __init__(
        self,
        dataset: SegmentDataset,
        mesh: Mesh,
        dtype: str = "bfloat16",
        data_axis: str = "data",
    ):
        n_shards = int(mesh.shape[data_axis])
        plan = plan_shards(dataset, n_shards)
        offsets = dataset._offsets
        n_mels = dataset.n_mels

        if dtype == "bfloat16":
            import ml_dtypes

            host_dtype = ml_dtypes.bfloat16
        else:
            host_dtype = np.dtype("float32")

        # Multi-process: materialize ONLY the shard rows whose devices this
        # process owns — the plan is a pure function of the dataset, so every
        # process computes the same global plan but builds its local block
        # and assembles the global array via core.mesh.put_global. Aggregate
        # host RAM across the pod therefore bounds the corpus, not one host
        # (the reference unpickles the whole dataset in every worker —
        # reference: data_utils.py:45-46).
        from ..core.mesh import put_global, shard_rows_for_process

        local_rows = (
            shard_rows_for_process(mesh, data_axis)
            if jax.process_count() > 1
            else np.arange(n_shards)
        )
        packed = np.zeros(
            (len(local_rows), plan.n_rows, n_mels), dtype=host_dtype
        )
        starts = np.zeros((len(local_rows), plan.n_starts), dtype=np.int32)
        utt_of_start = (
            np.searchsorted(offsets, dataset.starts, side="right") - 1
        )
        for i, s in enumerate(local_rows):
            utts = plan.utt_rows[s]
            row = 0
            local_base = {}
            for u in utts:
                r0, r1 = int(offsets[u]), int(offsets[u + 1])
                packed[i, row : row + (r1 - r0)] = dataset.packed[r0:r1]
                local_base[u] = row - r0  # global row -> local row shift
                row += r1 - r0
            mask = np.isin(utt_of_start, utts)
            gstarts = dataset.starts[mask]
            shift = np.array(
                [local_base[u] for u in utt_of_start[mask]], dtype=np.int64
            )
            local = (gstarts + shift)[: plan.n_starts]
            starts[i] = local.astype(np.int32)

        shard = NamedSharding(mesh, P(data_axis))
        if dtype == "bfloat16":
            raw = put_global(packed.view(np.uint16), mesh, P(data_axis))
            self.packed = jax.jit(
                lambda a: jax.lax.bitcast_convert_type(a, jnp.bfloat16),
                out_shardings=shard,
            )(raw)
        else:
            self.packed = put_global(packed, mesh, P(data_axis))
        self.starts = put_global(starts, mesh, P(data_axis))
        self.segment_size = dataset.segment_size
        self.n_mels = n_mels
        self.n_shards = n_shards
        self.dropped_segments = plan.dropped_segments
        self.data_axis = data_axis

    @property
    def nbytes(self) -> int:
        return int(self.packed.size) * self.packed.dtype.itemsize


def sample_segments_sharded(
    packed: jnp.ndarray,
    starts: jnp.ndarray,
    segment_size: int,
    batch_size: int,
    key: jax.Array,
    mesh: Mesh,
    data_axis: str = "data",
) -> jnp.ndarray:
    """Per-device local uniform segment sampling; jit-traceable.

    packed: (n_shards, R, n_mels) sharded P(data); starts: (n_shards, S)
    sharded P(data). Returns (batch_size, seg, n_mels) sharded P(data) on
    the batch axis — exactly the layout the DP train step consumes, with no
    cross-device communication at all.
    """
    n_dev = int(mesh.shape[data_axis])
    if batch_size % n_dev:
        raise ValueError(f"batch_size {batch_size} not divisible by {n_dev}")
    b_local = batch_size // n_dev

    def local(packed_l, starts_l, key):
        i = jax.lax.axis_index(data_axis)
        k = jax.random.fold_in(key, i)
        sel = jax.random.randint(k, (b_local,), 0, starts_l.shape[1])
        s = starts_l[0, sel]
        idx = s[:, None] + jnp.arange(segment_size)[None, :]
        return packed_l[0][idx]

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(data_axis), P(data_axis), P()),
        out_specs=P(data_axis),
        check_vma=False,
    )(packed, starts, key)
