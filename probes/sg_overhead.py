"""Decompose the ~0.4 ms fixed cost of one sell_spmv_pallas call at road
size (N=1M, 977 groups): x-pack, y-init, output slice, dispatch."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("device:", jax.devices()[0], flush=True)
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)

from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
from sparsematrixvectormultiplication_tpu.formats.sell import SellMatrix
from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
    DeviceSell, device_put_sell, pack_x_table, sell_spmv_pallas)
from sparsematrixvectormultiplication_tpu.utils.timing import (
    time_device_fn_batched)

N = 1_000_000
ngroups = 977
x = np.random.default_rng(0).standard_normal(N)
xd = jnp.asarray(x, jnp.float32)

# tiny 1-group contiguous sell structure
from sparsematrixvectormultiplication_tpu.models.synthetic import banded
coo = banded(1024, 5, 30, seed=0)
csr1 = CSRMatrix.from_coo(coo)
csr1 = CSRMatrix(1024, N, csr1.row_ptr, csr1.col_idx, csr1.values)
sell1 = SellMatrix.from_csr(csr1)
d1 = device_put_sell(sell1, dtype=jnp.float32)
d1 = DeviceSell(ngroups * 8192, N, d1.nnz, ngroups, d1.bins)

d0 = DeviceSell(ngroups * 8192, N, 0, ngroups, [])

import functools

@functools.partial(jax.jit)
def pack_only(xx):
    return pack_x_table(xx, N)[0, 0]

@functools.partial(jax.jit)
def zeros_only(xx):
    t = pack_x_table(xx, N)
    y = jnp.zeros((ngroups * 8, 128), dtype=t.dtype)
    return y.reshape(-1)[:N] + t[0, 0]

for name, fn, args in [
    ("pack_only", pack_only, (xd,)),
    ("pack+zeros+slice", zeros_only, (xd,)),
    ("empty_spmv", lambda d, xx: sell_spmv_pallas(d, xx), (d0, xd)),
    ("one_bin_spmv", lambda d, xx: sell_spmv_pallas(d, xx), (d1, xd)),
]:
    sec, _ = time_device_fn_batched(fn, *args, reps=64, rounds=3)
    print(f"{name:20s} {sec*1e6:9.1f} us", flush=True)
print("done", flush=True)
