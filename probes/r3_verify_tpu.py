"""Round-3 verify drive + SG scattered-regime TPU measurement.

1. verify-skill end-to-end drive (reference general_matrix.mtx vs scipy)
2. road_full / uni_full / dmix_full / plaw_full through the SG layout with
   the fixed far-density test + resident-y mode, timed vs oracle.
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import scipy.io as sio
import jax
import jax.numpy as jnp

print("device:", jax.devices()[0], flush=True)
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
print("warm", flush=True)

import sparsematrixvectormultiplication_tpu as spmv
from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
from sparsematrixvectormultiplication_tpu.formats.sell import SellMatrix
from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
    device_put_sell, sell_spmv_pallas)
from sparsematrixvectormultiplication_tpu.models import synthetic as syn
from sparsematrixvectormultiplication_tpu.utils.timing import time_device_fn_batched

# ---- 1. verify drive ----
coo = spmv.COOMatrix.from_mtx(
    "/root/reference/matrix_generated/general_matrix.mtx")
sell = SellMatrix.from_coo(coo)
x = np.ones(coo.ncols)
y_tpu = np.asarray(sell_spmv_pallas(device_put_sell(sell, dtype=jnp.float32),
                                    jnp.asarray(x, jnp.float32)))
y_ref = sio.mmread(
    "/root/reference/matrix_generated/general_matrix.mtx").tocsr() @ x
assert np.allclose(y_tpu[: coo.nrows], y_ref, atol=1e-5), "MISMATCH"
print("VERIFY OK", y_tpu[:4], flush=True)

# ---- 2. scattered-regime SG measurement ----
rng = np.random.default_rng(1)
cases = [
    ("road_full", lambda: syn.road_network(1_000_000, seed=5)),
    ("uni_full", lambda: syn.random_general(200_000, 200_000, 2.5e-4, seed=8)),
    ("dmix_full", lambda: syn.dense_rows_mix(200_000, seed=7)),
    ("plaw_full", lambda: syn.power_law(1_000_000, 3, seed=6)),
]
for name, build in cases:
    try:
        coo = build()
        csr = CSRMatrix.from_coo(coo)
        csrk, seg = csr.split_heavy_rows(256)
        x = rng.standard_normal(coo.ncols)
        y_ref = csr.spmv(x)
        for lab, kw in [("sg", dict(layout="sg")),
                        ("auto", dict(layout="auto"))]:
            sell = SellMatrix.from_csr(csrk, **kw)
            lay = {}
            for b in sell.bins:
                key = f"{b.layout}{'+' if b.add_into else ''}"
                lay[key] = lay.get(key, 0) + 1
            d = device_put_sell(sell, dtype=jnp.float32)
            xd = jnp.asarray(x, jnp.float32)
            y = np.asarray(sell_spmv_pallas(d, xd), np.float64)
            sec, _ = time_device_fn_batched(
                lambda dd, xx: sell_spmv_pallas(dd, xx), d, xd,
                reps=64, rounds=3)
            y = sell.unpermute(y)
            if seg is not None:
                y = np.bincount(seg, weights=y, minlength=csr.nrows)[
                    : csr.nrows]
            y = y[: csr.nrows]
            rel = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-6)
            sig = int((rel > 1e-4).sum())
            gf = 2 * csr.nnz / sec / 1e9
            print(f"[{name}/{lab}] {gf:7.2f} GF  {sec*1e3:8.3f} ms  "
                  f"nnz={csr.nnz} sig_diffs={sig} max_rel={rel.max():.2e} "
                  f"bins={lay}", flush=True)
    except Exception as e:  # keep later cases alive
        print(f"[{name}] FAILED {type(e).__name__}: {e}", flush=True)
print("done", flush=True)
