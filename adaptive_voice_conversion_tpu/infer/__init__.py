from .inferencer import Inferencer, utt_make_frames

__all__ = ["Inferencer", "utt_make_frames"]
