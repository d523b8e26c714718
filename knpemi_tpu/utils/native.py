"""ctypes bindings for the native host toolkit (native/host_toolkit.cpp).

Host-side graph kernels that are Python-loop-bound at scale (the MG
aggregation sweep is O(n) python-interpreted otherwise).  Every entry
point has a pure-Python fallback, so the compiled library is an
optimization, not a requirement.  Build with ``make -C native`` (the
build is attempted automatically on first use).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> Path:
    return Path(__file__).resolve().parents[2] / "native"


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _native_dir() / "libknpemi_host.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_native_dir())],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.vanek_aggregate.restype = ctypes.c_int64
        lib.vanek_aggregate.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def vanek_aggregate(indptr: np.ndarray, indices: np.ndarray, n: int):
    """Native Vanek aggregation; returns (agg, n_agg) or None if the
    library is unavailable."""
    lib = load()
    if lib is None:
        return None
    agg = np.empty(n, dtype=np.int64)
    nc = lib.vanek_aggregate(
        n,
        np.ascontiguousarray(indptr, dtype=np.int64),
        np.ascontiguousarray(indices, dtype=np.int32),
        agg,
    )
    return agg, int(nc)
