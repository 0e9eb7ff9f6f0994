"""ctypes binding for the native segment gather (native/segment_gather.cpp).

Builds the shared library on first use if a toolchain is available; falls
back silently to the numpy gather otherwise — the native path is a host-CPU
optimization, never a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsegment_gather.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            src = os.path.join(_NATIVE_DIR, "segment_gather.cpp")
            if not os.path.exists(src):
                return None
            try:
                subprocess.run(
                    ["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.gather_segments.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_char_p,
                ctypes.c_int,
            ]
            lib.gather_segments.restype = None
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def gather_segments(
    packed: np.ndarray, starts: np.ndarray, seg_rows: int, n_threads: int = 2
) -> Optional[np.ndarray]:
    """Gather [starts[i] : starts[i]+seg_rows] row blocks via memcpy.

    Returns None if the native library is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    if not packed.flags["C_CONTIGUOUS"]:
        return None
    n = len(starts)
    row_bytes = packed.strides[0]
    out = np.empty((n, seg_rows, packed.shape[1]), dtype=packed.dtype)
    s = np.ascontiguousarray(starts, dtype=np.int64)
    lib.gather_segments(
        packed.ctypes.data_as(ctypes.c_char_p),
        row_bytes,
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        seg_rows,
        out.ctypes.data_as(ctypes.c_char_p),
        n_threads,
    )
    return out
