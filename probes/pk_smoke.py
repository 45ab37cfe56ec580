"""Packed-wl TPU lowering smoke (run FIRST before any packed measurement).

Small FEM matrix, forced wl, SPMV_WL_PACK=1: compile + run f32 and dd on
the real chip, compare against the unpacked run in the same process.
Exits non-zero on any mismatch so a chain can gate packed stages on it.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
    from sparsematrixvectormultiplication_tpu.formats.sell import SellMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import fem_3d
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        device_put_sell, device_put_x, sell_spmv_pallas)
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell_dd import (
        device_put_sell_dd, sell_spmv_pallas_dd)

    t0 = time.time()
    _ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
    print(f"warm-up {time.time()-t0:.0f}s", flush=True)

    coo = fem_3d(16, 16, 16, dof=3, seed=7)
    csr = CSRMatrix.from_coo(coo)
    x = np.random.default_rng(0).standard_normal(csr.ncols)
    sell = SellMatrix.from_csr(csr, layout="wl")
    assert any(b.layout == "wl" for b in sell.bins), "no wl bin built"
    xd = device_put_x(x, csr.ncols, jnp.float32)
    xh = np.asarray(x, np.float32)
    xl = np.asarray(x - xh.astype(np.float64), np.float32)
    xh_d = device_put_x(xh, csr.ncols, jnp.float32)
    xl_d = device_put_x(xl, csr.ncols, jnp.float32)

    outs = {}
    for flag in ("0", "1"):
        os.environ["SPMV_WL_PACK"] = flag
        d = device_put_sell(sell, dtype=jnp.float32)
        t0 = time.time()
        y = np.asarray(sell_spmv_pallas(d, xd))
        print(f"pack={flag} f32 compile+run {time.time()-t0:.0f}s", flush=True)
        ddm = device_put_sell_dd(sell)
        t0 = time.time()
        yh, yl = sell_spmv_pallas_dd(ddm, xh_d, xl_d)
        print(f"pack={flag} dd compile+run {time.time()-t0:.0f}s", flush=True)
        outs[flag] = (y, np.asarray(yh), np.asarray(yl))

    ok = True
    for i, tag in enumerate(("f32", "dd-hi", "dd-lo")):
        same = np.array_equal(outs["0"][i], outs["1"][i])
        print(f"{tag}: packed {'==' if same else '!='} unpacked", flush=True)
        ok &= same
    if not ok:
        sys.exit(1)
    print("PK SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
