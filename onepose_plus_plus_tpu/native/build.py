"""Build + load the native track builder (ctypes, no pybind11 needed)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "libtrack_builder.so")
_cached = None
_build_attempted = False


def build_native(force: bool = False) -> bool:
    """Compile the shared library with make/g++. Returns success."""
    if os.path.exists(_LIB) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"], check=True, capture_output=True
        )
        return os.path.exists(_LIB)
    except Exception:
        return False


def load_track_builder() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native library; None when unavailable."""
    global _cached, _build_attempted
    if _cached is not None:
        return _cached
    if not os.path.exists(_LIB):
        if _build_attempted:
            return None
        _build_attempted = True
        if not build_native():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.build_tracks_uf.restype = ctypes.c_int64
    lib.build_tracks_uf.argtypes = [
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
    ]
    _cached = lib
    return lib
