"""Native (C++) runtime helpers, loaded via ctypes.

Built lazily with g++ on first use; all callers fall back to the pure-Python
implementation when no toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libgraphcsv.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    src = os.path.join(_DIR, "graph_csv.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Return the loaded native library, building it if necessary.
    Returns None when unavailable (callers must fall back)."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH)
                < os.path.getmtime(os.path.join(_DIR, "graph_csv.cpp"))):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.parse_graph_csv.restype = ctypes.c_int64
            lib.parse_graph_csv.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                ctypes.c_int64,
            ]
            lib.count_graph_csv_rows.restype = ctypes.c_int64
            lib.count_graph_csv_rows.argtypes = [ctypes.c_char_p]
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def parse_graph_csv_native(path: str):
    """Parse a vessel-graph CSV with the C++ parser.
    Returns None if the native library is unavailable or parsing failed."""
    lib = get_lib()
    if lib is None:
        return None
    cap = lib.count_graph_csv_rows(path.encode())
    if cap < 0:
        return None
    cap = max(int(cap), 1)
    out = np.empty((cap, 7), np.float64)
    n = lib.parse_graph_csv(path.encode(), out.reshape(-1), cap)
    if n < 0:
        return None
    vals = out[:n]
    return {"node1": vals[:, 0:3].copy(), "node2": vals[:, 3:6].copy(),
            "radius": vals[:, 6].copy()}
