"""2-minute PR compile/run smoke on the real TPU (small matrices).

Run FIRST after a TPU recovery: surfaces Mosaic compile problems with the
PR kernel (pltpu.roll on big arrays, VMEM residency) before hours of sweep
time are spent. Writes one status line per case.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import numpy as np  # noqa: E402

from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix  # noqa: E402
from sparsematrixvectormultiplication_tpu.formats.pr import pr_from_csr  # noqa: E402
from sparsematrixvectormultiplication_tpu.models import synthetic as syn  # noqa: E402
from sparsematrixvectormultiplication_tpu.ops.pallas_pr import (  # noqa: E402
    device_put_pr,
    pr_spmv_pallas,
)
from sparsematrixvectormultiplication_tpu.ops.pallas_pr_dd import (  # noqa: E402
    device_put_pr_dd,
    pr_spmv_pallas_dd,
)
from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (  # noqa: E402
    device_put_x,
)
from sparsematrixvectormultiplication_tpu.utils.timing import (  # noqa: E402
    time_device_fn_slope,
)


def main() -> None:
    import jax
    # tunnel warm-up (first transfer of a process can stall minutes)
    _ = np.asarray(jax.device_put(np.ones(1024, np.float32)) + 1)
    print("warm", flush=True)

    # small powerlaw: exercises near+far tiles, several bins, real Beneš
    coo = syn.power_law(60_000, 3, seed=6)
    csr = CSRMatrix.from_coo(coo)
    pr = pr_from_csr(csr)
    print(f"converted n_rows={getattr(pr, 'n_rows', '?')} "
          f"pad={pr.padding_ratio:.2f}", flush=True)
    x = np.random.default_rng(0).standard_normal(csr.ncols)
    y_ref = csr.spmv(x)

    try:
        dpr = device_put_pr(pr)
        xd = device_put_x(x, csr.ncols)
        t0 = time.perf_counter()
        y = np.asarray(pr_spmv_pallas(dpr, xd), np.float64)
        print(f"f32 compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        rel = np.max(np.abs(pr.unpermute(y) - y_ref)
                     / np.maximum(1, np.abs(y_ref)))
        sec, _ = time_device_fn_slope(pr_spmv_pallas, dpr, xd, reps=16, rounds=2)
        print(f"PR-F32 OK max_rel={rel:.2e} {sec*1e3:.3f} ms "
              f"= {2*csr.nnz/sec/1e9:.2f} GF", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"PR-F32 FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)

    try:
        dprd = device_put_pr_dd(pr)
        xh = np.asarray(x, np.float32)
        xl = np.asarray(x - xh.astype(np.float64), np.float32)
        xh_d, xl_d = device_put_x(xh, csr.ncols), device_put_x(xl, csr.ncols)
        t0 = time.perf_counter()
        yh, yl = pr_spmv_pallas_dd(dprd, xh_d, xl_d)
        print(f"dd compile+run {time.perf_counter()-t0:.1f}s", flush=True)
        y64 = pr.unpermute(np.asarray(yh, np.float64) + np.asarray(yl, np.float64))
        rel = np.max(np.abs(y64 - y_ref) / np.maximum(1, np.abs(y_ref)))
        fn = lambda d, a, b: pr_spmv_pallas_dd(d, a, b)[0]
        sec, _ = time_device_fn_slope(fn, dprd, xh_d, xl_d, reps=16, rounds=2)
        print(f"PR-DD OK max_rel={rel:.2e} {sec*1e3:.3f} ms "
              f"= {2*csr.nnz/sec/1e9:.2f} GF", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"PR-DD FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)


if __name__ == "__main__":
    main()
