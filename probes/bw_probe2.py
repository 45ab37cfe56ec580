#!/usr/bin/env python
"""Round-2 probe: streaming asymptotes + the REAL flagship kernel's
dispatch-overhead curve.

bw_scale.py showed: tunnel RTT ~30ms, single Pallas dispatch ~470ms, and
chained per-rep time falling with reps (fixed overhead / reps). This probe
measures the asymptotic (high-reps) throughput of:
  * XLA reduce and Pallas grid reads (block-size sweep) at 2.15GB
  * the kernelsim miniature (decode + slab passes) at reps=32
  * the actual production kernel (sell_spmv_pallas) on the bench.py matrix
    at reps {8, 32, 128} -> extrapolates true kernel time vs overhead
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, "/root/repo")
from probes.bw_probe import pallas_kernelsim, pallas_manual_dma, pallas_read  # noqa: E402
from sparsematrixvectormultiplication_tpu.utils.timing import (  # noqa: E402
    force_readback,
    time_device_fn_batched,
)

LANES = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def put(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def main():
    t0 = time.time()
    float(np.asarray(jnp.sum(jax.device_put(np.ones(1024, np.float32)))))
    log(f"warm-up {time.time()-t0:.0f}s")

    seed = jax.jit(lambda: jnp.zeros((8, LANES), jnp.float32))()
    seedv = jax.jit(lambda: jnp.zeros((LANES,), jnp.float32))()

    NR = 1 << 22  # 2.15GB
    gb = NR * LANES * 4 / 1e9
    buf = jax.jit(lambda: jnp.ones((NR, LANES), jnp.float32))()

    def xla_sum(b, s):
        return jnp.sum((b + s[0]) * 1.0000001, axis=0)

    s, _ = time_device_fn_batched(xla_sum, buf, seedv, reps=64, rounds=2)
    put("xla_sum_2.15GB_r64", ms_per_call=round(s * 1e3, 3), GBps=round(gb / s, 1))

    for bk in (8192, 32768, 131072):
        try:
            fn = pallas_read(NR, bk)
            s, _ = time_device_fn_batched(fn, buf, seed, reps=32, rounds=2)
            put(f"pallas_read_bk{bk}_2.15GB_r32", ms_per_call=round(s * 1e3, 3),
                GBps=round(gb / s, 1))
        except Exception as e:  # noqa: BLE001
            put(f"pallas_read_bk{bk}", error=f"{type(e).__name__}: {str(e)[:150]}")

    try:
        fn = pallas_manual_dma(NR, 16384, 2)
        s, _ = time_device_fn_batched(fn, buf, seed, reps=32, rounds=2)
        put("pallas_manualdma_ch16384_r32", ms_per_call=round(s * 1e3, 3),
            GBps=round(gb / s, 1))
    except Exception as e:  # noqa: BLE001
        put("pallas_manualdma", error=f"{type(e).__name__}: {str(e)[:150]}")
    del buf

    # --- kernelsim (fixed) ---
    NG, K, XR = 240, 64, 2048
    nch = K // 8
    qb = jax.jit(lambda: jnp.zeros((NG, 8 * nch), jnp.int32))()
    x = jax.jit(lambda: jnp.ones((XR, LANES), jnp.float32))()
    asb = jax.jit(lambda: jnp.ones((NG * K * 8, LANES), jnp.float32))()
    jab = jax.jit(lambda: jnp.zeros((NG * K * 8, LANES), jnp.int32))()
    japk = jax.jit(lambda: jnp.zeros((NG * K * 8 // 2, LANES), jnp.int32))()
    gb_full = (asb.size * 4 + jab.size * 4) / 1e9
    gb_pack = (asb.size * 4 + japk.size * 4) / 1e9
    nnz = NG * K * 1024
    for name, kwargs, jbuf, g in [
        ("kernelsim_span4", dict(span=4), jab, gb_full),
        ("kernelsim_span4_packed16", dict(span=4, packed=True), japk, gb_pack),
        ("kernelsim_nocompute", dict(span=4, compute=False), jab, gb_full),
        ("kernelsim_span8", dict(span=8), jab, gb_full),
    ]:
        try:
            fn, _ = pallas_kernelsim(NG, K, XR, g_per=8, **kwargs)
            s, _ = time_device_fn_batched(fn, qb, x, jbuf, asb, seed, reps=32, rounds=2)
            put(f"{name}_r32", ms_per_call=round(s * 1e3, 3), GBps=round(g / s, 1),
                gflops=round(2 * nnz / s / 1e9, 2))
        except Exception as e:  # noqa: BLE001
            put(name, error=f"{type(e).__name__}: {str(e)[:200]}")
    del qb, x, asb, jab, japk

    # --- the real flagship kernel on the bench.py matrix ---
    from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
    from sparsematrixvectormultiplication_tpu.formats.sell import SellMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import banded
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        device_put_sell,
        sell_spmv_pallas,
    )

    t = time.time()
    coo = banded(250_000, 60, 2500, seed=1)
    csr = CSRMatrix.from_coo(coo)
    sell = SellMatrix.from_csr(csr)
    log(f"matrix {time.time()-t:.0f}s nnz={coo.nnz} "
        f"layouts={[(b.layout, b.k, b.n_groups, b.span) for b in sell.bins]}")
    t = time.time()
    dsell = device_put_sell(sell, dtype=jnp.float32)
    xd = jnp.asarray(np.ones(coo.ncols), jnp.float32)
    # force upload completion
    force_readback(dsell.bins[0].as_)
    log(f"upload {time.time()-t:.0f}s")

    fn = lambda d, xx: sell_spmv_pallas(d, xx)  # noqa: E731
    y = np.asarray(fn(dsell, xd))
    y_ref = csr.spmv(np.ones(coo.ncols))
    err = float(np.max(np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1)))
    log(f"validated max_rel={err:.2e}")

    nnz = coo.nnz
    streamed = sum(int(b.ja.nbytes + b.as_.nbytes) for b in sell.bins) / 1e9
    results = {}
    for reps in (8, 32, 128):
        s, _ = time_device_fn_batched(fn, dsell, xd, reps=reps, rounds=2)
        results[reps] = s
        put(f"flagship_bench_r{reps}", ms_per_call=round(s * 1e3, 3),
            gflops=round(2 * nnz / s / 1e9, 2), GBps=round(streamed / s, 1),
            max_rel=err)
    # overhead model: t(reps) = kernel + fixed/reps
    if results.get(8) and results.get(128):
        kern = (128 * results[128] - 8 * results[8]) / (128 - 8)
        fixed = (results[8] - kern) * 8
        put("flagship_overhead_fit", kernel_ms=round(kern * 1e3, 3),
            fixed_ms=round(fixed * 1e3, 1),
            asymptote_gflops=round(2 * nnz / kern / 1e9, 2),
            asymptote_GBps=round(streamed / kern, 1))

    log(f"total {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
