from .dataset import SegmentDataset, make_frames
from .loader import batch_iterator, device_prefetch

__all__ = ["SegmentDataset", "make_frames", "batch_iterator", "device_prefetch"]
