"""Build + load the native C++ runtime components (ctypes, no pybind11).

Usage:
    python -m sparsematrixvectormultiplication_tpu.native.build   # force build
    from ..native.build import load_fast_mmio                     # lazy load

The library is compiled on first use into this directory; all consumers
degrade gracefully to the pure-numpy paths when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fast_mmio.cpp")
_LIB = os.path.join(_DIR, "libfastmmio.so")

_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> str | None:
    """Compile the shared library; returns its path or None on failure."""
    if not force and os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return _LIB
    except Exception as e:  # toolchain missing / compile error -> numpy fallback
        sys.stderr.write(f"fast_mmio native build failed ({e}); using numpy parser\n")
        return None


def load_fast_mmio():
    """Return the ctypes-wrapped parser entry point, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            fn = lib.fast_mmio_parse_body
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
            ]
            _lib = fn
        except OSError as e:
            sys.stderr.write(f"fast_mmio load failed ({e}); using numpy parser\n")
            _lib = None
        return _lib


def parse_body_native(body: bytes, nnz: int, per_line: int, num_threads: int = 0,
                      offset: int = 0):
    """Parse a coordinate body natively; returns (row, col, val) 1-based
    int32/float64 arrays, or None if the native path is unavailable/fails.

    ``offset`` lets the caller pass the whole file buffer without slicing
    (zero-copy: body[offset:] is parsed)."""
    import numpy as np

    fn = load_fast_mmio()
    if fn is None:
        return None
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 16)
    rows = np.empty(nnz, dtype=np.int32)
    cols = np.empty(nnz, dtype=np.int32)
    vals = np.empty(nnz, dtype=np.float64)
    base = ctypes.cast(ctypes.c_char_p(body), ctypes.c_void_p).value
    got = fn(
        base + offset, len(body) - offset, nnz, per_line, num_threads,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if got != nnz:
        return None
    return rows, cols, vals


if __name__ == "__main__":
    out = build(force=True)
    print(f"built: {out}" if out else "build FAILED")
