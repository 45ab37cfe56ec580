"""TPU A/B: wl-shed vs auto (sb-major) vs forced wl on the bench.py
secondary matrix (random-in-band 14.8M nnz — the 33.9 GF vs ~72 GF
roofline gap, VERDICT r2 weak #3).

wl-shed (formats/sell.py _from_csr_wl_shed) cut conversion padding
4.4x -> 2.0x; this measures whether the wl stream-rate class (~430 GB/s
vs sb-major's ~290) converts that into wall-clock. Run AFTER the main
sweep (one TPU process at a time)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from sparsematrixvectormultiplication_tpu import CSRMatrix, SellMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import banded
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        device_put_sell,
        device_put_x,
        sell_spmv_pallas,
    )
    from sparsematrixvectormultiplication_tpu.utils.timing import (
        time_device_fn_slope,
    )

    # tunnel warm-up (first transfer stalls minutes)
    _ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
    print("warm-up done", flush=True)

    coo = banded(250_000, 60, 2500, seed=1)
    csr = CSRMatrix.from_coo(coo)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(csr.ncols)
    ref = csr.spmv(x)
    nnz = csr.nnz
    print(f"nnz={nnz}", flush=True)

    for layout in ("auto", "wl-shed", "wl"):
        t0 = time.time()
        try:
            s = SellMatrix.from_csr(csr, layout=layout)
        except Exception as e:  # noqa: BLE001
            print(f"{layout}: conversion FAILED {e}", flush=True)
            continue
        ms = s.memory_stats()
        print(f"{layout}: convert {time.time()-t0:.0f}s pad "
              f"{s.padding_ratio:.2f} layouts {sorted(set(ms['bin_layouts']))} "
              f"bins {len(s.bins)}", flush=True)
        try:
            d = device_put_sell(s, dtype=jnp.float32)
            xt = device_put_x(np.asarray(x, np.float32), csr.ncols, jnp.float32)
            y = np.asarray(sell_spmv_pallas(d, xt), np.float64)[:csr.nrows]
            rel = np.abs(y - ref) / np.maximum(1.0, np.abs(ref))
            sig = int((rel > 1e-4).sum())
            sec, _ = time_device_fn_slope(
                lambda dd, xx: sell_spmv_pallas(dd, xx), d, xt,
                reps=128, rounds=2)
            print(f"{layout}: {sec*1e3:.3f} ms = {2*nnz/sec/1e9:.2f} GFLOPS "
                  f"sig_diffs={sig} max_rel={rel.max():.1e}", flush=True)
            del d
        except Exception as e:  # noqa: BLE001
            print(f"{layout}: device FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
