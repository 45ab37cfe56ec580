"""Round-3 TPU measurement: SG shared-window kernel on the scattered suite.

Measures the four scattered regimes (VERDICT r2 'do this' #1) end-to-end:
harness-consistent heavy split (strided, cap 16 when median row nnz <= 24),
layout auto vs forced sg, f32, 64-rep chained timing, validated against the
host fp64 oracle with the harness's length-aware tolerance.
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("device:", jax.devices()[0], flush=True)
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
print("warm", flush=True)

from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
from sparsematrixvectormultiplication_tpu.formats.sell import SellMatrix
from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
    device_put_sell, device_put_x, sell_spmv_pallas)
from sparsematrixvectormultiplication_tpu.models import synthetic as syn
from sparsematrixvectormultiplication_tpu.utils.timing import (
    time_device_fn_slope)
from sparsematrixvectormultiplication_tpu.utils.validation import (
    difference_metrics)

rng = np.random.default_rng(1)
cases = ["road_full", "uni_full", "dmix_full", "plaw_full", "webbase_full"]
which = sys.argv[1:] or cases
for name in cases:
    if name not in which:
        continue
    try:
        z = np.load(f"/root/repo/probes/cache/{name}.npz")
        csr = CSRMatrix(int(z["nrows"]), int(z["ncols"]), z["row_ptr"],
                        z["col_idx"], z["values"])
        med = float(np.median(csr.row_nnz()))
        cap = 16 if med <= 24 else 256
        csrk, seg = csr.split_heavy_rows(cap, strided=cap < 256)
        x = z["x"]
        y_ref = z["y_ref"]

        for lab, kw in [("sg", dict(layout="sg")),
                        ("auto", dict(layout="auto"))]:
            try:
                sell = SellMatrix.from_csr(csrk, **kw)
                lay = {}
                for b in sell.bins:
                    key = f"{b.layout}{'+' if b.add_into else ''}"
                    lay[key] = lay.get(key, 0) + 1
                d = device_put_sell(sell, dtype=jnp.float32)
                xd = device_put_x(x, csr.ncols, jnp.float32)
                y = np.asarray(sell_spmv_pallas(d, xd), np.float64)
                y = sell.unpermute(y)
                if seg is not None:
                    y = np.bincount(seg, weights=y,
                                    minlength=csr.nrows)[: csr.nrows]
                y = y[: csr.nrows]
                dm = difference_metrics(y_ref, y)
                sec, _ = time_device_fn_slope(
                    lambda dd, xx: sell_spmv_pallas(dd, xx), d, xd,
                    reps=64, rounds=3)
                gf = 2 * csr.nnz / sec / 1e9
                print(f"[{name}/{lab}] {gf:7.2f} GF  {sec*1e3:8.3f} ms  "
                      f"nnz={csr.nnz} sig_diffs={dm.significant_diffs} "
                      f"max_rel={dm.max_rel_err:.2e} bins={lay}", flush=True)
                del d
            except Exception as e:
                print(f"[{name}/{lab}] FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
    except Exception as e:
        print(f"[{name}] FAILED {type(e).__name__}: {e}", flush=True)
print("done", flush=True)
