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
_CSR_SRC = os.path.join(_DIR, "fast_csr.cpp")
_CSR_LIB = os.path.join(_DIR, "libfastcsr.so")

_lock = threading.Lock()
_lib = None
_tried = False
_csr_lib = None
_csr_tried = False


def _compile(src: str, lib: str, what: str, force: bool = False) -> str | None:
    """Compile one shared library; returns its path or None on failure."""
    if not force and os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", src, "-o", lib,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return lib
    except Exception as e:  # toolchain missing / compile error -> numpy fallback
        sys.stderr.write(f"{what} native build failed ({e}); using numpy path\n")
        return None


def build(force: bool = False) -> str | None:
    return _compile(_SRC, _LIB, "fast_mmio", force)


def build_csr(force: bool = False) -> str | None:
    return _compile(_CSR_SRC, _CSR_LIB, "fast_csr", force)


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


def load_fast_csr():
    """Return the ctypes-wrapped COO→CSR converter, or None."""
    global _csr_lib, _csr_tried
    with _lock:
        if _csr_lib is not None or _csr_tried:
            return _csr_lib
        _csr_tried = True
        path = build_csr()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            fn = lib.fast_coo_to_csr
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
            ]
            _csr_lib = fn
        except OSError as e:
            sys.stderr.write(f"fast_csr load failed ({e}); using numpy path\n")
            _csr_lib = None
        return _csr_lib


def coo_to_csr_native(row, col, val, nrows: int, num_threads: int = 0):
    """Native COO→CSR (≙ reference convert_in_csr, src/csr_matrix.c:63-126,
    counting sort + per-row column sort). Returns (row_ptr, col_idx, values)
    or None when the native path is unavailable or dtypes don't match."""
    import numpy as np

    fn = load_fast_csr()
    if fn is None:
        return None
    row = np.ascontiguousarray(row, dtype=np.int32)
    col = np.ascontiguousarray(col, dtype=np.int32)
    val = np.ascontiguousarray(val, dtype=np.float64)
    nnz = int(row.size)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 16)
    row_ptr = np.empty(nrows + 1, dtype=np.int64)
    col_out = np.empty(nnz, dtype=np.int32)
    val_out = np.empty(nnz, dtype=np.float64)
    rc = fn(
        row.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        col.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        val.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nnz, int(nrows), num_threads,
        row_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        col_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        val_out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        return None
    return row_ptr, col_out, val_out


_ROUTE_SRC = os.path.join(_DIR, "fast_route.cpp")
_ROUTE_LIB = os.path.join(_DIR, "libfastroute.so")
_route_lib = None
_route_tried = False


def build_route(force: bool = False) -> str | None:
    return _compile(_ROUTE_SRC, _ROUTE_LIB, "fast_route", force)


def load_fast_route():
    """Return the ctypes-wrapped PR router (fast_route.cpp), or None."""
    global _route_lib, _route_tried
    with _lock:
        if _route_lib is not None or _route_tried:
            return _route_lib
        _route_tried = True
        path = build_route()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            fn = lib.pr_route
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            _route_lib = fn
        except OSError as e:
            sys.stderr.write(f"fast_route load failed ({e}); using numpy path\n")
            _route_lib = None
        return _route_lib


def run_fast_route(fn, src_row, dst_row, dst_lane, n_rows: int):
    """Native PR routing (formats/pr.py). Mirrors
    formats/pr_route.py:route_elements — returns (src_lane, packed_masks,
    final_lane); raises on router failure (callers fall back to numpy)."""
    import numpy as np

    n = int(src_row.size)
    i32 = lambda a: np.ascontiguousarray(a, dtype=np.int32)
    sr, dr, dl = i32(src_row), i32(dst_row), i32(dst_lane)
    src_lane = np.empty(n, dtype=np.int32)
    packed = np.empty((n_rows, 128), dtype=np.int32)
    final_lane = np.empty((n_rows, 128), dtype=np.int32)
    ptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = fn(n, int(n_rows), ptr(sr), ptr(dr), ptr(dl),
            ptr(src_lane), ptr(packed), ptr(final_lane))
    if rc != 0:
        raise RuntimeError(f"pr_route failed with code {rc}")
    return src_lane, packed, final_lane


_BSR_SRC = os.path.join(_DIR, "fast_bsr.cpp")
_BSR_LIB = os.path.join(_DIR, "libfastbsr.so")
_bsr_lib = None
_bsr_tried = False


def build_bsr(force: bool = False) -> str | None:
    return _compile(_BSR_SRC, _BSR_LIB, "fast_bsr", force)


def load_fast_bsr():
    """Return (count_fn, fill_fn) from fast_bsr.cpp, or None."""
    global _bsr_lib, _bsr_tried
    with _lock:
        if _bsr_lib is not None or _bsr_tried:
            return _bsr_lib
        _bsr_tried = True
        path = build_bsr()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            cnt = lib.fast_bsr_count
            cnt.restype = ctypes.c_int64
            cnt.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
            ]
            fil = lib.fast_bsr_fill
            fil.restype = ctypes.c_int64
            fil.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ]
            _bsr_lib = (cnt, fil)
        except OSError as e:
            sys.stderr.write(f"fast_bsr load failed ({e}); using numpy path\n")
            _bsr_lib = None
        return _bsr_lib


def csr_to_bsr_native(row_ptr, col_idx, values, nrows: int, n_bc: int,
                      value_dtype, max_bytes: int, num_threads: int = 0):
    """Native CSR→BSR(128x128) blocking. Returns (blocks, bcols, kb,
    n_real_blocks) or None when the native path is unavailable; raises
    ValueError on a blown byte budget (same contract as the numpy path)."""
    import numpy as np

    fns = load_fast_bsr()
    if fns is None:
        return None
    cnt, fil = fns
    row_ptr = np.ascontiguousarray(row_ptr, dtype=np.int64)
    col_idx = np.ascontiguousarray(col_idx, dtype=np.int32)
    values = np.ascontiguousarray(values, dtype=np.float64)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 16)
    # each thread carries a 4*n_bc-byte stamp array: cap total at 256 MiB
    num_threads = min(num_threads,
                      max(1, (256 << 20) // (4 * max(n_bc, 1))))
    n_br = -(-nrows // 128)
    counts = np.zeros(n_br, dtype=np.int64)
    p64 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    p32 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    kb = cnt(p64(row_ptr), p32(col_idx), nrows, n_bc, num_threads,
             p64(counts))
    if kb < 0:
        return None
    n_real = int(counts.sum())
    use_f64 = np.dtype(value_dtype) == np.float64
    itemsize = np.dtype(value_dtype).itemsize
    stored = n_br * kb * 128 * 128 * itemsize
    if stored > max_bytes:
        nnz = int(col_idx.size)
        raise ValueError(
            f"BSR expansion is {stored / 2**20:.0f} MiB "
            f"({n_real} blocks, kb={kb}, fill "
            f"{nnz / max(n_real * 128 * 128, 1):.4f}) > "
            f"{max_bytes / 2**20:.0f} MiB budget — this matrix is too "
            "scattered for the dense-block MXU path; use the SELL/SG "
            "SpMV layouts instead")
    if not use_f64 and np.dtype(value_dtype) != np.float32:
        return None  # native fills f32/f64 only; numpy handles the rest
    blocks = np.zeros((n_br * kb, 128, 128), dtype=value_dtype)
    bcols = np.zeros(n_br * kb, dtype=np.int32)
    rc = fil(p64(row_ptr), p32(col_idx),
             values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
             nrows, n_bc, kb, num_threads, int(use_f64),
             blocks.ctypes.data_as(ctypes.c_void_p), p32(bcols))
    if rc != 0:
        return None
    return blocks, bcols, int(kb), n_real


if __name__ == "__main__":
    out = build(force=True)
    out_csr = build_csr(force=True)
    out_route = build_route(force=True)
    out_bsr = build_bsr(force=True)
    print(f"built: {out}" if out else "fast_mmio build FAILED")
    print(f"built: {out_csr}" if out_csr else "fast_csr build FAILED")
    print(f"built: {out_route}" if out_route else "fast_route build FAILED")
    print(f"built: {out_bsr}" if out_bsr else "fast_bsr build FAILED")
