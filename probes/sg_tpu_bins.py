"""Per-bin TPU timing: where do road_full's 16 ms live?

Times each DeviceSell bin as its own jitted spmv (single pallas_call),
reporting ms, GF-equivalent, per-group cost, and bin geometry.
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import functools

print("device:", jax.devices()[0], flush=True)
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
print("warm", flush=True)

from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
from sparsematrixvectormultiplication_tpu.formats.sell import SellMatrix
from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
    DeviceSell, device_put_sell, sell_spmv_pallas, pack_x_table, _bin_call)
from sparsematrixvectormultiplication_tpu.models import synthetic as syn
from sparsematrixvectormultiplication_tpu.utils.timing import time_device_fn_batched

case = sys.argv[1] if len(sys.argv) > 1 else "road_full"
sigma = "nosig" not in sys.argv
if case == "road_full":
    coo = syn.road_network(1_000_000, seed=5)
elif case == "uni_full":
    coo = syn.random_general(200_000, 200_000, 2.5e-4, seed=8)
elif case == "plaw_full":
    coo = syn.power_law(1_000_000, 3, seed=6)
else:
    raise SystemExit(case)

csr = CSRMatrix.from_coo(coo)
csrk, seg = csr.split_heavy_rows(256)
x = np.random.default_rng(1).standard_normal(coo.ncols)
sell = SellMatrix.from_csr(csrk, layout="sg", sigma_sort=sigma)
d = device_put_sell(sell, dtype=jnp.float32)
xd = jnp.asarray(x, jnp.float32)
print(f"nnz={csr.nnz} bins={len(d.bins)}", flush=True)


@functools.partial(jax.jit, static_argnames=("i",))
def one_bin(dsell, xx, i):
    x_tab = pack_x_table(xx, dsell.ncols)
    y = jnp.zeros((dsell.num_groups * 8, 128), dtype=x_tab.dtype)
    return _bin_call(dsell.bins[i], x_tab, y, dsell.num_groups, False)

tot = 0.0
for i, b in enumerate(d.bins):
    sec, _ = time_device_fn_batched(functools.partial(one_bin, i=i), d, xd,
                                    reps=32, rounds=2)
    tot += sec
    hb = sell.bins[i]
    print(f"bin{i:2d} {b.layout:8s} k={b.k:4d} span={b.span:3d} ng={b.n_groups:4d} "
          f"res={b.resident_g_per:2d} real={hb.real_nnz:8d} add={int(b.add_into)} "
          f"{sec*1e6:8.1f} us  ({sec/max(b.n_groups,1)*1e6:6.2f} us/grp)", flush=True)
print(f"sum of bins: {tot*1e3:.3f} ms -> {2*csr.nnz/tot/1e9:.2f} GF-equiv", flush=True)
