"""TPU A/B: multi-RHS SELL SpMM vs R separate SpMV sweeps.

sell_spmm_pallas (ops/pallas_sell_spmm.py) streams the JA/AS entry tiles
ONCE and runs the gather/FMA pipeline R times against R VMEM-resident
x-tables. On the HBM-bound fem3d class (f32 SpMV ~88 GF ~ 642 GB/s,
RESULTS.md) per-RHS GFLOPS should rise toward the VPU ceiling as R grows.
Measures R in {1, 8, 16} plus the R x SpMV baseline.

Run AFTER the main sweep (one TPU process at a time).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

REHEARSE = os.environ.get("SPMM_PROBE_INTERPRET", "") == "1"


def main():
    import jax

    if REHEARSE:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from sparsematrixvectormultiplication_tpu import CSRMatrix, SellMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import fem_3d
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        device_put_sell,
        device_put_x,
        sell_spmv_pallas,
    )
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell_spmm import (
        device_put_x_multi,
        sell_spmm_pallas,
    )
    from sparsematrixvectormultiplication_tpu.utils.timing import (
        time_device_fn_slope,
    )

    _ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
    print("warm-up done", flush=True)

    dims = (12, 12, 12) if REHEARSE else (60, 60, 60)
    coo = fem_3d(*dims, dof=3, seed=1)
    csr = CSRMatrix.from_coo(coo)
    nnz = csr.nnz
    sell = SellMatrix.from_csr(csr, layout="k-major")
    print(f"fem3d nnz={nnz} pad {sell.padding_ratio:.2f}", flush=True)
    rng = np.random.default_rng(0)
    d = device_put_sell(sell, dtype=jnp.float32, resident=False)
    perm = getattr(sell, "row_perm", None)

    # forced-wl conversion for the wl SpMM kernel A/B (fill guard may
    # reject; the k-major rows above stand alone)
    d_wl = None
    try:
        sell_wl = SellMatrix.from_csr(csr, layout="wl")
        if all(b.layout == "wl" for b in sell_wl.bins) and \
                getattr(sell_wl, "row_perm", None) is None:
            d_wl = device_put_sell(sell_wl, dtype=jnp.float32,
                                   resident=False)
            print(f"wl convert ok pad {sell_wl.padding_ratio:.2f}",
                  flush=True)
        else:
            print(f"wl convert produced non-wl bins "
                  f"{[b.layout for b in sell_wl.bins]} — skipping wl A/B",
                  flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"wl convert skipped: {str(e)[:120]}", flush=True)

    # baseline: single SpMV
    x0 = rng.standard_normal(csr.ncols)
    xt0 = device_put_x(np.asarray(x0, np.float32), csr.ncols, jnp.float32)
    sec, _ = time_device_fn_slope(
        lambda dd, xx: sell_spmv_pallas(dd, xx, interpret=REHEARSE),
        d, xt0, reps=4 if REHEARSE else 128, rounds=2)
    print(f"spmv x1: {sec*1e3:.3f} ms = {2*nnz/sec/1e9:.2f} GF "
          f"(per-RHS baseline)", flush=True)

    for R in (8, 16):
        X = rng.standard_normal((csr.ncols, R))
        Yref = np.column_stack([csr.spmv(X[:, j]) for j in range(R)])
        try:
            xt = device_put_x_multi(X, csr.ncols, jnp.float32)
        except Exception as e:  # noqa: BLE001
            print(f"spmm R={R}: pack FAILED {str(e)[:200]}", flush=True)
            continue
        for tag, dd in (("k-major", d), ("wl", d_wl)):
            if dd is None:
                continue
            try:
                Y = np.asarray(
                    sell_spmm_pallas(dd, xt, interpret=REHEARSE), np.float64)
                ref = Yref if (tag == "wl" or perm is None) else Yref[perm]
                rel = np.abs(Y - ref) / np.maximum(1.0, np.abs(ref))
                sig = int((rel > 1e-4).sum())
                sec, _ = time_device_fn_slope(
                    lambda a, b: sell_spmm_pallas(a, b, interpret=REHEARSE),
                    dd, xt, reps=4 if REHEARSE else 64, rounds=2)
                print(f"spmm[{tag}] R={R}: {sec*1e3:.3f} ms = "
                      f"{2*nnz*R/sec/1e9:.2f} GF total, "
                      f"{2*nnz/sec/1e9:.2f} GF/RHS-sweep-equiv x{R} "
                      f"sig_diffs={sig} max_rel={rel.max():.1e}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"spmm[{tag}] R={R}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
        del xt


if __name__ == "__main__":
    main()
