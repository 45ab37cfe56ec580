#!/usr/bin/env python
"""A/B: summed (overlappable) vs chained (aliased) bin assembly, plus the
re-tuned merge policy, on the bench.py matrix. One warm-up, both variants."""
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
    from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
    from sparsematrixvectormultiplication_tpu.formats.sell import SellMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import banded
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        device_put_sell,
        sell_spmv_pallas,
    )
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell_dd import (
        device_put_sell_dd,
        sell_spmv_pallas_dd,
    )
    from sparsematrixvectormultiplication_tpu.utils.timing import (
        time_device_fn_batched,
    )

    t0 = time.time()
    float(np.asarray(jnp.sum(jax.device_put(np.ones(1024, np.float32)))))
    log(f"warm-up {time.time()-t0:.0f}s")

    t0 = time.time()
    coo = banded(250_000, 60, 2500, seed=1)
    csr = CSRMatrix.from_coo(coo)
    sell = SellMatrix.from_csr(csr)
    log(f"matrix {time.time()-t0:.0f}s bins="
        f"{[(b.layout, b.k, b.n_groups, b.span) for b in sell.bins]}")
    nnz = coo.nnz
    x = np.random.default_rng(0).standard_normal(coo.ncols)
    y_ref = csr.spmv(x)

    dsell = device_put_sell(sell, dtype=jnp.float32)
    xd = jnp.asarray(x, jnp.float32)

    for assembly in ("sum", "chain"):
        fn = lambda d, xx, _a=assembly: sell_spmv_pallas(d, xx, assembly=_a)
        y = np.asarray(fn(dsell, xd), np.float64)
        rel = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)
        sec, _ = time_device_fn_batched(fn, dsell, xd, reps=256, rounds=2)
        print(json.dumps({
            "variant": f"f32_{assembly}", "ms": round(sec * 1e3, 4),
            "gflops": round(2 * nnz / sec / 1e9, 2),
            "max_rel": float(rel.max()),
        }), flush=True)

    # dd with the new merge policy (chained assembly, unchanged path)
    dd = device_put_sell_dd(sell)
    xh = np.asarray(x, np.float32)
    xl = np.asarray(x - xh.astype(np.float64), np.float32)
    xh_d, xl_d = jnp.asarray(xh), jnp.asarray(xl)

    def dd_fn(d, a, b):
        yh, yl = sell_spmv_pallas_dd(d, a, b)
        return yh + yl

    yh, yl = sell_spmv_pallas_dd(dd, xh_d, xl_d)
    y64 = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    rel = np.abs(y64 - y_ref) / np.maximum(np.abs(y_ref), 1e-30)
    sec, _ = time_device_fn_batched(dd_fn, dd, xh_d, xl_d, reps=256, rounds=2)
    print(json.dumps({
        "variant": "dd_chain", "ms": round(sec * 1e3, 4),
        "gflops": round(2 * nnz / sec / 1e9, 2),
        "max_rel": float(rel.max()),
    }), flush=True)


if __name__ == "__main__":
    main()
