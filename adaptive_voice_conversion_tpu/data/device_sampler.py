"""Device-resident dataset: segment sampling on the TPU itself.

The reference streams every batch from host DataLoader workers
(data_utils.py:24-28). On TPU the roundtrip per step costs far more than the
step itself (measured ~97ms host-streamed vs ~6ms compute on the bench
host), so when the packed mel array fits in HBM we ship it ONCE and sample
segment batches on-device inside the jitted multi-step program
(train/step.py make_device_data_train_step): per-step host traffic is zero.

Sampling semantics match the reference index pipeline: a uniform draw over
the precomputed (utt, t) index entries == uniform over device-resident
segment start offsets.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .dataset import SegmentDataset


class DeviceResidentDataset:
    def __init__(
        self,
        dataset: SegmentDataset,
        mesh: Optional[Mesh] = None,
        dtype: str = "bfloat16",
    ):
        packed = dataset.packed
        if dtype == "bfloat16" and packed.dtype != np.dtype("float32"):
            wire = packed.view(np.uint16)
        elif dtype == "bfloat16":
            import ml_dtypes

            wire = packed.astype(ml_dtypes.bfloat16).view(np.uint16)
        else:
            wire = np.ascontiguousarray(packed, dtype=np.float32)

        if mesh is not None:
            from ..core.mesh import put_global

            put = lambda a: put_global(a, mesh, P())
        else:
            put = jax.device_put
        raw = put(wire)
        if dtype == "bfloat16":
            if mesh is not None:
                repl = NamedSharding(mesh, P())
                self.packed = jax.jit(
                    lambda a: jax.lax.bitcast_convert_type(a, jnp.bfloat16),
                    out_shardings=repl,
                )(raw)
            else:
                self.packed = jax.lax.bitcast_convert_type(raw, jnp.bfloat16)
        else:
            self.packed = raw
        self.starts = put(dataset.starts.astype(np.int32))
        self.segment_size = dataset.segment_size
        self.n_mels = dataset.n_mels

    @property
    def nbytes(self) -> int:
        return int(self.packed.size) * self.packed.dtype.itemsize


def sample_segments(
    packed: jnp.ndarray,
    starts: jnp.ndarray,
    segment_size: int,
    batch_size: int,
    key: jax.Array,
    n_valid=None,
) -> jnp.ndarray:
    """Uniform segment batch (B, seg, n_mels) — callable inside jit.

    ``n_valid`` (traced int32 scalar) bounds the draw to the first n_valid
    entries of a padded ``starts`` array, letting one compiled program serve
    HBM chunks with differing segment counts (data/chunked.py)."""
    hi = starts.shape[0] if n_valid is None else n_valid
    sel = jax.random.randint(key, (batch_size,), 0, hi)
    s = starts[sel]
    idx = s[:, None] + jnp.arange(segment_size)[None, :]
    return packed[idx]
