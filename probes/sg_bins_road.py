"""Per-bin TPU timing of the forced-sg road structure (launch/DMA/compute
attribution for the 24-call fragmentation seen in sg_tpu_r3_a.out)."""
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
    DeviceSell, device_put_sell, sell_spmv_pallas)
from sparsematrixvectormultiplication_tpu.utils.timing import (
    time_device_fn_batched)

z = np.load("/root/repo/probes/cache/road_full.npz")
csr = CSRMatrix(int(z["nrows"]), int(z["ncols"]), z["row_ptr"],
                z["col_idx"], z["values"])
csrk, seg = csr.split_heavy_rows(16, strided=True)
x = z["x"]

for lab, kw in [("sg", dict(layout="sg")),
                ("auto", dict(layout="auto"))]:
    sell = SellMatrix.from_csr(csrk, **kw)
    d = device_put_sell(sell, dtype=jnp.float32)
    xd = jnp.asarray(x, jnp.float32)
    sec, _ = time_device_fn_batched(
        lambda dd, xx: sell_spmv_pallas(dd, xx), d, xd, reps=64, rounds=3)
    print(f"[{lab}] total {2*csr.nnz/sec/1e9:7.2f} GF {sec*1e3:8.3f} ms "
          f"{len(d.bins)} bins", flush=True)
    sec_sum, _ = time_device_fn_batched(
        lambda dd, xx: sell_spmv_pallas(dd, xx, assembly="sum"), d, xd,
        reps=64, rounds=3)
    print(f"[{lab}] sum-assembly {2*csr.nnz/sec_sum/1e9:7.2f} GF "
          f"{sec_sum*1e3:8.3f} ms", flush=True)
    for i, b in enumerate(d.bins):
        d1 = DeviceSell(d.nrows, d.ncols, d.nnz, d.num_groups, [b])
        s1, _ = time_device_fn_batched(
            lambda dd, xx: sell_spmv_pallas(dd, xx), d1, xd,
            reps=64, rounds=2)
        hb = sell.bins[i]
        print(f"  bin{i:2d} {b.layout:9s} k={b.k:4d} span={b.span:3d} "
              f"ng={b.n_groups:4d} res={b.resident_g_per} add={int(b.add_into)} "
              f"nnz={hb.real_nnz:8d} {s1*1e3:7.3f} ms", flush=True)
print("done", flush=True)
