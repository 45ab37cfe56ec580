"""In-jit per-bin marginal costs via prefix timing: time spmv over bins[:k]
for k = 0..n; differences = true in-jit marginal cost of each bin."""
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
    DeviceSell, device_put_sell, device_put_x, sell_spmv_pallas)
from sparsematrixvectormultiplication_tpu.utils.timing import (
    time_device_fn_batched)

name = sys.argv[1] if len(sys.argv) > 1 else "road_full"
layout = sys.argv[2] if len(sys.argv) > 2 else "sg"
z = np.load(f"/root/repo/probes/cache/{name}.npz")
csr = CSRMatrix(int(z["nrows"]), int(z["ncols"]), z["row_ptr"],
                z["col_idx"], z["values"])
med = float(np.median(csr.row_nnz()))
cap = 16 if med <= 24 else 256
csrk, seg = csr.split_heavy_rows(cap, strided=cap < 256)
sell = SellMatrix.from_csr(csrk, layout=layout)
d = device_put_sell(sell, dtype=jnp.float32)
xd = device_put_x(z["x"], csr.ncols, jnp.float32)

prev = 0.0
for k in range(len(d.bins) + 1):
    dk = DeviceSell(d.nrows, d.ncols, d.nnz, d.num_groups, d.bins[:k])
    sec, _ = time_device_fn_batched(
        lambda dd, xx: sell_spmv_pallas(dd, xx), dk, xd, reps=64, rounds=2)
    if k == 0:
        print(f"baseline {sec*1e6:9.1f} us", flush=True)
    else:
        b = d.bins[k - 1]
        hb = sell.bins[k - 1]
        print(f"bin{k-1:2d} {b.layout:9s}{'+' if b.add_into else ' '} "
              f"Tq={b.k:4d} Vq={b.span:3d} ng={b.n_groups:4d} "
              f"res={b.resident_g_per} nnz={hb.real_nnz:8d} "
              f"marg={(sec-prev)*1e6:9.1f} us", flush=True)
    prev = sec
print("done", flush=True)
