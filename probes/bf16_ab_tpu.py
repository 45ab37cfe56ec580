"""TPU A/B: f32 vs bf16 VALUE planes on the headline matrices.

bf16 mode (ops/pallas_sell.py): value planes stored bfloat16 (halving the
dominant HBM value stream, 4 -> 2 B/nnz); the x-table and all accumulation
stay f32 — kernels widen values at load. On the bandwidth-bound fem3d
class (f32 measured ~88 GF ~ 642 GB/s, RESULTS.md) the byte cut predicts
~1.2-1.3x. Validated against the fp64 SpMV of the bf16-QUANTIZED matrix
(kernel correctness isolated from storage quantization).

Run AFTER the main sweep (one TPU process at a time).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

# BF16_PROBE_INTERPRET=1: CPU dress-rehearsal of this exact file (tiny
# shapes, interpret-mode kernels) — run before queuing on the TPU chain.
REHEARSE = os.environ.get("BF16_PROBE_INTERPRET", "") == "1"


def main():
    import jax

    if REHEARSE:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import ml_dtypes

    from sparsematrixvectormultiplication_tpu import CSRMatrix, SellMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import (
        banded,
        fem_3d,
    )
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

    cases = [
        ("fem3d_cube", lambda: fem_3d(60, 60, 60, dof=3, seed=1)),
        ("rand_in_band", lambda: banded(250_000, 60, 2500, seed=1)),
    ]
    if REHEARSE:
        cases = [("fem3d_tiny", lambda: fem_3d(8, 8, 8, dof=3, seed=1)),
                 ("band_tiny", lambda: banded(3_000, 16, 40, seed=1))]
    rng = np.random.default_rng(0)
    for name, gen in cases:
        t0 = time.time()
        coo = gen()
        csr = CSRMatrix.from_coo(coo)
        nnz = csr.nnz
        x = rng.standard_normal(csr.ncols)
        s = SellMatrix.from_csr(csr)  # same auto config for both dtypes
        print(f"{name}: gen+convert {time.time()-t0:.0f}s nnz={nnz} "
              f"pad {s.padding_ratio:.2f}", flush=True)
        xt = device_put_x(np.asarray(x, np.float32), csr.ncols, jnp.float32)
        for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            # oracle at the stage's own storage precision
            vals = (csr.values.astype(ml_dtypes.bfloat16).astype(np.float64)
                    if tag == "bf16" else csr.values)
            ref = CSRMatrix(csr.nrows, csr.ncols, csr.row_ptr, csr.col_idx,
                            vals).spmv(x)
            if getattr(s, "row_perm", None) is not None:
                ref = ref[s.row_perm]
            try:
                d = device_put_sell(s, dtype=dt)
                y = np.asarray(
                    sell_spmv_pallas(d, xt, interpret=REHEARSE),
                    np.float64)[:csr.nrows]
                rel = np.abs(y - ref) / np.maximum(1.0, np.abs(ref))
                sig = int((rel > 1e-4).sum())
                sec, _ = time_device_fn_slope(
                    lambda dd, xx: sell_spmv_pallas(dd, xx,
                                                    interpret=REHEARSE),
                    d, xt, reps=4 if REHEARSE else 128, rounds=2)
                print(f"{name} {tag}: {sec*1e3:.3f} ms = "
                      f"{2*nnz/sec/1e9:.2f} GFLOPS sig_diffs={sig} "
                      f"max_rel={rel.max():.1e}", flush=True)
                del d
            except Exception as e:  # noqa: BLE001
                print(f"{name} {tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
