"""fem3d_large (127M nnz) measurement with ONE JIT PER BIN.

Workaround for the 127M multi-kernel-program compile 500 (see
fem127_diag_tpu.py): each bin's pallas_call compiles as its own program;
outputs are summed host-side (bins partition groups, so the sum is exact
assembly); stage time = sum of per-bin slope times + one composite-add
estimate. Runs f32 then dd (packed wl if SPMV_WL_PACK=1, default on).

Output: one line per bin + FEM127 PERBIN summary lines.
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
    from sparsematrixvectormultiplication_tpu.formats.sell import (
        LANES, SUBLANES, SellMatrix)
    from sparsematrixvectormultiplication_tpu.models.synthetic import fem_3d
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        _bin_call, device_put_sell, device_put_x)
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell_dd import (
        _bin_call_dd, device_put_sell_dd)
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
    print(f"convert {time.time()-t0:.0f}s pad={sell.padding_ratio:.2f}",
          flush=True)
    x = np.ones(csr.ncols)
    y_ref = csr.spmv(x)

    # ---- dd ----
    t0 = time.time()
    dd = device_put_sell_dd(sell)
    xh = np.asarray(x, np.float32)
    xl = np.asarray(x - xh.astype(np.float64), np.float32)
    xh_d = device_put_x(xh, csr.ncols, jnp.float32)
    xl_d = device_put_x(xl, csr.ncols, jnp.float32)
    print(f"dd upload {time.time()-t0:.0f}s", flush=True)
    ygd = dd.y_groups or dd.num_groups

    @jax.jit
    def one_bin_dd(b, a1, a2):
        z = jnp.zeros((ygd * SUBLANES, LANES), jnp.float32)
        yh, yl = _bin_call_dd(b, a1, a2, z, z, ygd, False)
        return yh, yl

    total = 0.0
    acc_h = np.zeros((ygd * SUBLANES, LANES), np.float64)
    acc_l = np.zeros_like(acc_h)
    ok = True
    for i, b in enumerate(dd.bins):
        try:
            yh_i, yl_i = one_bin_dd(b, xh_d, xl_d)
            acc_h += np.asarray(yh_i, np.float64)
            acc_l += np.asarray(yl_i, np.float64)
        except Exception as e:  # noqa: BLE001
            print(f"  dd bin{i} ({b.layout} K={b.k} ng={b.n_groups}) "
                  f"FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
            ok = False
            continue
        sec, _ = time_device_fn_slope(
            lambda b_, a, c: one_bin_dd(b_, a, c)[0], b, xh_d, xl_d,
            reps=64, rounds=2)
        total += sec
        print(f"  dd bin{i} {b.layout} K={b.k} ng={b.n_groups}: "
              f"{sec*1e3:.3f} ms", flush=True)
    if ok:
        y64 = (acc_h + acc_l).reshape(-1)[: csr.nrows]
        dm = difference_metrics(y_ref, y64, 1e-5, 1e-4)
        gf = 2 * csr.nnz / total / 1e9
        print(f"FEM127 PERBIN dd: {total*1e3:.3f} ms = {gf:.2f} GFLOPS "
              f"(ref 47.09 fp64 -> {gf/47.09:.2f}x) "
              f"sig_diffs={dm.significant_diffs}", flush=True)


    # ---- f32 ----
    t0 = time.time()
    d = device_put_sell(sell, dtype=jnp.float32)
    xd = device_put_x(np.asarray(x, np.float32), csr.ncols, jnp.float32)
    print(f"f32 upload {time.time()-t0:.0f}s bins={len(d.bins)}", flush=True)
    yg = d.y_groups or d.num_groups

    @jax.jit
    def one_bin(b, xx):
        y0 = jnp.zeros((yg * SUBLANES, LANES), jnp.float32)
        return _bin_call(b, xx, y0, yg, False)

    total = 0.0
    y_acc = np.zeros((yg * SUBLANES, LANES), np.float64)
    ok = True
    for i, b in enumerate(d.bins):
        try:
            y_i = np.asarray(one_bin(b, xd), np.float64)
        except Exception as e:  # noqa: BLE001
            print(f"  f32 bin{i} ({b.layout} K={b.k} ng={b.n_groups}) "
                  f"FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
            ok = False
            continue
        y_acc += y_i
        sec, _ = time_device_fn_slope(one_bin, b, xd, reps=64, rounds=2)
        total += sec
        print(f"  f32 bin{i} {b.layout} K={b.k} ng={b.n_groups}: "
              f"{sec*1e3:.3f} ms", flush=True)
    if ok:
        dm = difference_metrics(y_ref, y_acc.reshape(-1)[: csr.nrows],
                                1e-5, 1e-4)
        gf = 2 * csr.nnz / total / 1e9
        print(f"FEM127 PERBIN f32: {total*1e3:.3f} ms = {gf:.2f} GFLOPS "
              f"(ref 47.09 fp64 -> {gf/47.09:.2f}x) "
              f"sig_diffs={dm.significant_diffs}", flush=True)
    del d, xd
    import gc
    gc.collect()

if __name__ == "__main__":
    main()
