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


# ---------------------------------------------------------------------------
# Native PNG loader (libpng + std::thread pool)
# ---------------------------------------------------------------------------

_PNG_LIB_PATH = os.path.join(_DIR, "libpngloader.so")
_png_lib = None
_png_failed = False


def _build_png() -> bool:
    src = os.path.join(_DIR, "png_loader.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _PNG_LIB_PATH, src,
             "-lpng", "-lz"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_png_lib():
    global _png_lib, _png_failed
    if _png_lib is not None or _png_failed:
        return _png_lib
    with _lock:
        if _png_lib is not None or _png_failed:
            return _png_lib
        src = os.path.join(_DIR, "png_loader.cpp")
        if not os.path.exists(_PNG_LIB_PATH) or (
                os.path.getmtime(_PNG_LIB_PATH) < os.path.getmtime(src)):
            if not _build_png():
                _png_failed = True
                return None
        try:
            lib = ctypes.CDLL(_PNG_LIB_PATH)
            i64 = ctypes.c_int64
            p64 = ctypes.POINTER(i64)
            lib.png_probe.restype = ctypes.c_int
            lib.png_probe.argtypes = [ctypes.c_char_p, p64, p64, p64]
            lib.png_read.restype = ctypes.c_int
            lib.png_read.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
                i64, i64, i64]
            lib.png_read_batch.restype = i64
            lib.png_read_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), i64,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                p64, p64, p64, i64]
            _png_lib = lib
        except Exception:
            _png_failed = True
    return _png_lib


def read_png_native(path: str):
    """Decode one PNG to a numpy array ([H,W] gray or [H,W,3] RGB, uint8).
    Returns None if the native loader is unavailable or decoding failed."""
    lib = get_png_lib()
    if lib is None:
        return None
    w = ctypes.c_int64()
    h = ctypes.c_int64()
    c = ctypes.c_int64()
    if lib.png_probe(path.encode(), ctypes.byref(w), ctypes.byref(h),
                     ctypes.byref(c)) != 0:
        return None
    out = np.empty((h.value, w.value, c.value), np.uint8)
    if lib.png_read(path.encode(), out.reshape(-1), w.value, h.value,
                    c.value) != 0:
        return None
    return out[..., 0] if c.value == 1 else out


def read_png_batch_native(paths: list[str], threads: int | None = None):
    """Decode a batch of PNGs on a C++ thread pool. Returns a list of numpy
    arrays (None entries for failures), or None if natively unavailable."""
    lib = get_png_lib()
    if lib is None or not paths:
        return None
    n = len(paths)
    dims = []
    bufs = []
    for p in paths:
        w = ctypes.c_int64()
        h = ctypes.c_int64()
        c = ctypes.c_int64()
        if lib.png_probe(p.encode(), ctypes.byref(w), ctypes.byref(h),
                         ctypes.byref(c)) != 0:
            return None
        dims.append((w.value, h.value, c.value))
        bufs.append(np.empty((h.value, w.value, c.value), np.uint8))
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_outs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for b in bufs])
    ws = (ctypes.c_int64 * n)(*[d[0] for d in dims])
    hs = (ctypes.c_int64 * n)(*[d[1] for d in dims])
    cs = (ctypes.c_int64 * n)(*[d[2] for d in dims])
    nthreads = threads or min(n, os.cpu_count() or 4)
    ok = lib.png_read_batch(c_paths, n, c_outs, ws, hs, cs, nthreads)
    if ok != n:
        return None
    return [b[..., 0] if b.shape[-1] == 1 else b for b in bufs]


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
