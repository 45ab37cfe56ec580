"""TPU probe: SG kernel vs current auto on the scattered-regime suite.

Measures forced-sg and auto SELL conversions on the four r2-failing
matrices at full suite size. VERDICT r2 targets: powerlaw >= 3 GF,
road >= 8 GF, random_uniform / dense_rows_mix >= 2 GF.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

print("device:", jax.devices()[0], flush=True)
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)  # tunnel warm-up
print("warm", flush=True)

from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
from sparsematrixvectormultiplication_tpu.formats.sell import SellMatrix
from sparsematrixvectormultiplication_tpu.ops.pallas_sell import device_put_sell, sell_spmv_pallas
from sparsematrixvectormultiplication_tpu.models import synthetic as syn
from sparsematrixvectormultiplication_tpu.utils.timing import time_device_fn_batched

CASES = {
    "powerlaw_web": lambda: syn.power_law(1_000_000, 3, seed=6),
    "road_like": lambda: syn.road_network(1_000_000, seed=5),
    "dense_rows_mix": lambda: syn.dense_rows_mix(500_000, seed=7),
    "random_uniform": lambda: syn.random_general(200_000, 200_000, 2.5e-4, seed=8),
}

which = sys.argv[1:] or list(CASES)
for name in which:
    coo = CASES[name]()
    csr = CSRMatrix.from_coo(coo)
    M, nnz = csr.nrows, csr.nnz
    csrk, seg = csr.split_heavy_rows(256)
    x = np.random.default_rng(1).standard_normal(coo.ncols)
    y_ref = csr.spmv(x)
    for lay, sig in (("sg", False), ("sg", True), ("auto", True)):
        tag = f"{name}/{lay}{'+sig' if sig else ''}"
        try:
            t0 = time.time()
            sell = SellMatrix.from_csr(csrk, layout=lay, sigma_sort=sig)
            conv_s = time.time() - t0
            st = sell.memory_stats()
            lays = {}
            for b in st["bins"]:
                lays[b["layout"]] = lays.get(b["layout"], 0) + 1
            d = device_put_sell(sell, dtype=jnp.float32)
            xd = jnp.asarray(x, jnp.float32)
            ids = None
            perm = getattr(sell, "row_perm", None)
            idsarr = seg if seg is not None else (np.arange(csrk.nrows) if perm is not None else None)
            if idsarr is not None:
                if perm is not None:
                    idsarr = np.asarray(idsarr)[perm]
                ids = jnp.asarray(idsarr, jnp.int32)

            def fn(d, xx, _ids=ids):
                y = sell_spmv_pallas(d, xx)
                if _ids is not None:
                    y = jax.ops.segment_sum(y, _ids, num_segments=M)
                return y

            t0 = time.time()
            y = np.asarray(fn(d, xd), np.float64)[:M]
            compile_s = time.time() - t0
            rel = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-4)
            sig_diffs = int((rel > 1e-4).sum())
            sec, _ = time_device_fn_batched(fn, d, xd, reps=64, rounds=2)
            gf = 2 * nnz / sec / 1e9
            print(f"[{tag}] {gf:.2f} GF  {sec*1e3:.3f} ms  sig_diffs={sig_diffs} "
                  f"max_rel={rel.max():.1e} pad={st['padding_ratio']:.2f} "
                  f"bins={st['num_bins']} {lays} conv={conv_s:.1f}s compile={compile_s:.1f}s",
                  flush=True)
            del d
            import gc; gc.collect()
        except Exception as e:
            print(f"[{tag}] FAILED {type(e).__name__}: {str(e)[:400]}", flush=True)
