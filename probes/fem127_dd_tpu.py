"""Minimal fem3d_large dd measurement (fallback for FEM127PK).

Generates the 127M-nnz Cube_Coup_dt0-analogue, converts with the default
ladder (oversize bins split by ops/pallas_sell._split_oversize_host_bins),
uploads ONLY the dd planes (packed wl if SPMV_WL_PACK=1), validates
against the fp64 oracle, slope-times. Prints one summary line.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("SPMV_WL_PACK", "1")
os.environ.setdefault("SPMV_MAX_UPLOAD_MB", "3300")

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
    from sparsematrixvectormultiplication_tpu.formats.sell import SellMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import fem_3d
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import device_put_x
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell_dd import (
        device_put_sell_dd, sell_spmv_pallas_dd)
    from sparsematrixvectormultiplication_tpu.utils.timing import (
        time_device_fn_slope)
    from sparsematrixvectormultiplication_tpu.utils.validation import (
        difference_metrics)

    t0 = time.time()
    _ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
    print(f"warm-up {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    coo = fem_3d(82, 82, 82, dof=3, seed=12)
    csr = CSRMatrix.from_coo(coo)
    print(f"gen {time.time()-t0:.0f}s nnz={csr.nnz}", flush=True)

    t0 = time.time()
    sell = SellMatrix.from_csr(csr)
    print(f"convert {time.time()-t0:.0f}s pad={sell.padding_ratio:.2f} "
          f"bins={len(sell.bins)}", flush=True)

    x = np.ones(csr.ncols)
    xh = np.asarray(x, np.float32)
    xl = np.asarray(x - xh.astype(np.float64), np.float32)
    t0 = time.time()
    dd = device_put_sell_dd(sell)
    xh_d = device_put_x(xh, csr.ncols, jnp.float32)
    xl_d = device_put_x(xl, csr.ncols, jnp.float32)
    print(f"upload {time.time()-t0:.0f}s "
          f"(packed={[b.ja_packed for b in dd.bins]})", flush=True)

    t0 = time.time()
    yh, yl = sell_spmv_pallas_dd(dd, xh_d, xl_d)
    y64 = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    print(f"first run {time.time()-t0:.0f}s", flush=True)
    dm = difference_metrics(csr.spmv(x), y64[: csr.nrows], 1e-5, 1e-4)
    print(f"sig_diffs={dm.significant_diffs} max_rel={dm.max_rel_err:.2e}",
          flush=True)

    def fn(d, a, b):
        h, l = sell_spmv_pallas_dd(d, a, b)
        return h + l

    sec, _ = time_device_fn_slope(fn, dd, xh_d, xl_d, reps=64, rounds=2)
    gf = 2 * csr.nnz / sec / 1e9
    print(f"FEM127 DD: {sec*1e3:.3f} ms = {gf:.2f} GFLOPS "
          f"(ref Cube_Coup_dt0 fp64 47.09 -> {gf/47.09:.2f}x) "
          f"sig_diffs={dm.significant_diffs}", flush=True)


if __name__ == "__main__":
    main()
