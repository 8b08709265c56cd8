"""ctypes bindings for the native C++ frame-loading pipeline.

``native/libframeloader.so`` does threaded JPEG decode + PIL-compatible
triangle-filter resize + center crop + [-1, 1] normalization off the GIL —
the host-side hot path feeding the TPU (replaces the reference's torch
DataLoader workers).  Auto-built on first use if the toolchain is present;
falls back to the PIL path in ``transforms.py`` otherwise.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libframeloader.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False
# first use happens from the loader's worker thread pool: without a lock
# two threads could race into `make` concurrently (corrupt .so) or dlopen
# a half-written binary
_load_lock = threading.Lock()


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _load_lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.decode_frames.restype = ctypes.c_int
            lib.decode_frames.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            _lib = lib
        except OSError:
            return None
        return _lib


def native_available() -> bool:
    return _load() is not None


def decode_frames(paths: Sequence[str], resolution: int,
                  n_threads: int = 8) -> Optional[np.ndarray]:
    """Decode JPEG frames -> (n, res, res, 3) float32 in [-1, 1].

    Returns None if the native library is unavailable or any frame failed
    (caller falls back to PIL).
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, resolution, resolution, 3), dtype=np.float32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    ok = lib.decode_frames(
        arr, n, resolution, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    if ok != n:
        return None
    return out
