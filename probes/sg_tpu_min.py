"""Minimal TPU bisect for the sg kernel: one case per process invocation.

Usage: python probes/sg_tpu_min.py <case>
cases: road_small, road_static, road_dyn, uni_small, plaw_small
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

case = sys.argv[1]
print("device:", jax.devices()[0], flush=True)
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
print("warm", flush=True)

from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
from sparsematrixvectormultiplication_tpu.formats.sell import SellMatrix
from sparsematrixvectormultiplication_tpu.ops.pallas_sell import device_put_sell, sell_spmv_pallas
from sparsematrixvectormultiplication_tpu.models import synthetic as syn

sigma = len(sys.argv) < 3 or sys.argv[2] != "nosig"
if case == "road_small":
    coo = syn.road_network(50_000, seed=5)
elif case == "uni_small":
    coo = syn.random_general(20_000, 20_000, 2.5e-4, seed=8)
elif case == "plaw_small":
    coo = syn.power_law(50_000, 3, seed=6)
elif case == "road_full":
    coo = syn.road_network(1_000_000, seed=5)
elif case == "uni_full":
    coo = syn.random_general(200_000, 200_000, 2.5e-4, seed=8)
elif case == "plaw_full":
    coo = syn.power_law(1_000_000, 3, seed=6)
elif case == "dmix_full":
    coo = syn.dense_rows_mix(500_000, seed=7)
else:
    raise SystemExit(f"unknown case {case}")

csr = CSRMatrix.from_coo(coo)
csrk, seg = csr.split_heavy_rows(256)
x = np.random.default_rng(1).standard_normal(coo.ncols)
y_ref = csr.spmv(x)
import time
t0 = time.time()
sell = SellMatrix.from_csr(csrk, layout="sg", sigma_sort=sigma)
print(f"convert {time.time()-t0:.1f}s", flush=True)
st = sell.memory_stats()
print("bins:", [(b["layout"], b["k"], b["span"], b["n_groups"]) for b in st["bins"]],
      "pad %.2f" % st["padding_ratio"], flush=True)
d = device_put_sell(sell, dtype=jnp.float32)
xd = jnp.asarray(x, jnp.float32)
print("uploaded", flush=True)
y = np.asarray(sell_spmv_pallas(d, xd), np.float64)
print("ran", flush=True)
y = sell.unpermute(y)
if seg is not None:
    y = np.bincount(seg, weights=y, minlength=coo.nrows)[:coo.nrows]
y = y[:coo.nrows]
rel = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-4)
print(f"max_rel={rel.max():.2e} sig_diffs={(rel > 1e-4).sum()}", flush=True)

from sparsematrixvectormultiplication_tpu.utils.timing import time_device_fn_batched

def fn(d, xx):
    return sell_spmv_pallas(d, xx)

sec, _ = time_device_fn_batched(fn, d, xd, reps=64, rounds=2)
print(f"GF={2*csr.nnz/sec/1e9:.2f} sec={sec*1e3:.3f}ms", flush=True)
