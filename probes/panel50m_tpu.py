#!/usr/bin/env python
"""VERDICT #2 done-criterion: a >=50M-column matrix runs VALIDATED through
pallas_sell and pallas_sell_dd on the real TPU via column panels.

Matrix: 2M rows x 56M cols random band (8/row), ~16M nnz. The f32 x-table
limit is ~24.5M columns (96 MiB VMEM budget) -> 3 panels; dd (two half
tables) -> 5 panels."""
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from sparsematrixvectormultiplication_tpu.formats.coo import COOMatrix
    from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
    from sparsematrixvectormultiplication_tpu.formats.sell import PanelSellMatrix
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        device_put_panel_sell,
        max_x_table_cols,
        sell_spmv_pallas,
    )
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell_dd import (
        device_put_panel_sell_dd,
        sell_spmv_pallas_dd,
    )
    from sparsematrixvectormultiplication_tpu.utils.timing import (
        time_device_fn_batched,
    )
    from sparsematrixvectormultiplication_tpu.utils.validation import (
        difference_metrics,
    )

    t0 = time.time()
    float(np.asarray(jnp.sum(jax.device_put(np.ones(1024, np.float32)))))
    log(f"warm-up {time.time()-t0:.0f}s")

    M, N, PER_ROW = 2_000_000, 56_000_000, 8
    rng = np.random.default_rng(0)
    t0 = time.time()
    row = np.repeat(np.arange(M, dtype=np.int64), PER_ROW)
    centers = (np.arange(M, dtype=np.int64) * (N // M))[:, None]
    col = centers + rng.integers(-4000, 4000, size=(M, PER_ROW))
    col = np.clip(col, 0, N - 1).reshape(-1)
    val = rng.standard_normal(col.size)
    key = row * np.int64(N) + col
    _, idx = np.unique(key, return_index=True)
    coo = COOMatrix(M, N, row[idx].astype(np.int64), col[idx], val[idx])
    csr = CSRMatrix.from_coo(coo)
    log(f"gen+csr {time.time()-t0:.0f}s nnz={coo.nnz} ncols={N}")

    limit_f32 = max_x_table_cols(jnp.float32)
    limit_dd = limit_f32 // 2
    x = rng.standard_normal(N)
    y_ref = csr.spmv(x)

    # f32 through panels
    t0 = time.time()
    psell = PanelSellMatrix.from_csr(csr, max_panel_cols=limit_dd)
    log(f"panel convert {time.time()-t0:.0f}s panels={len(psell.panels)} "
        f"pad={psell.padding_ratio:.2f}")
    dps = device_put_panel_sell(psell, dtype=jnp.float32)
    xd = jnp.asarray(x, jnp.float32)
    y = np.asarray(sell_spmv_pallas(dps, xd), np.float64)
    dm = difference_metrics(y_ref, y, 1e-5, 1e-4)
    sec, _ = time_device_fn_batched(
        lambda d, xx: sell_spmv_pallas(d, xx), dps, xd, reps=32, rounds=2)
    print(json.dumps({
        "variant": "panel_f32_56Mcols", "ncols": N, "nnz": coo.nnz,
        "panels": len(psell.panels), "ms": round(sec * 1e3, 3),
        "gflops": round(2 * coo.nnz / sec / 1e9, 2),
        "sig_diffs": dm.significant_diffs, "max_rel": dm.max_rel_err,
    }), flush=True)

    # dd through panels
    dpd = device_put_panel_sell_dd(psell)
    xh = np.asarray(x, np.float32)
    xl = np.asarray(x - xh.astype(np.float64), np.float32)
    xh_d, xl_d = jnp.asarray(xh), jnp.asarray(xl)
    yh, yl = sell_spmv_pallas_dd(dpd, xh_d, xl_d)
    y64 = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    dm2 = difference_metrics(y_ref, y64, 1e-5, 1e-4)

    def dd_fn(d, a, b):
        yh, yl = sell_spmv_pallas_dd(d, a, b)
        return yh + yl

    sec2, _ = time_device_fn_batched(dd_fn, dpd, xh_d, xl_d, reps=32, rounds=2)
    print(json.dumps({
        "variant": "panel_dd_56Mcols", "ms": round(sec2 * 1e3, 3),
        "gflops": round(2 * coo.nnz / sec2 / 1e9, 2),
        "sig_diffs": dm2.significant_diffs, "max_rel": dm2.max_rel_err,
    }), flush=True)


if __name__ == "__main__":
    main()
