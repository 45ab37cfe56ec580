"""Diagnose the 2^15-row PR panel Mosaic compile failure (VERDICT r3 item 9).

Round-3 observation: pr_from_csr(target_rows=2^15) panels on powerlaw_web /
webbase_like die in the tunneled worker's compile helper with HTTP 500,
while 2^14-row panels compile and run. This probe isolates the trigger:

  1. builds the SAME 2^15-row panel set host-side,
  2. reports the static shapes / VMEM footprint of the largest panel,
  3. attempts ONE compile (jax.jit(...).lower().compile()) and captures the
     full exception text,
  4. then attempts the 2^14 equivalent as the control.

One compile attempt each, bounded; output goes to probes/pr15_diag_r4.out.
"""
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from sparsematrixvectormultiplication_tpu.formats.coo import COOMatrix
    from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
    from sparsematrixvectormultiplication_tpu.formats.pr import (
        PANEL_TARGET_ROWS, pr_from_csr)
    from sparsematrixvectormultiplication_tpu.ops.pallas_pr import (
        device_put_pr, pr_spmv_pallas)
    from sparsematrixvectormultiplication_tpu.ops.pallas_pr_dd import (
        DD_PANEL_TARGET_ROWS)

    path = os.path.join(REPO, "suite_mtx", "powerlaw_web.mtx")
    coo = COOMatrix.from_mtx(path)
    csr = CSRMatrix.from_coo(coo)
    print(f"powerlaw_web: {csr.nnz} nnz", flush=True)
    x = np.ones(csr.ncols)

    for cap in (PANEL_TARGET_ROWS, DD_PANEL_TARGET_ROWS):
        t0 = time.perf_counter()
        pr = pr_from_csr(csr, target_rows=cap)
        print(f"\n=== cap {cap}: convert {time.perf_counter()-t0:.1f}s",
              flush=True)
        stats = pr.memory_stats() if hasattr(pr, "memory_stats") else {}
        print(f"  stats: {stats}", flush=True)
        probs = getattr(pr, "panels", None) or [pr]
        for i, p in enumerate(probs):
            print(f"  panel {i}: n_rows={getattr(p, 'n_rows', '?')} "
                  f"stages={getattr(p, 'n_stages', '?')}", flush=True)
        try:
            dpr = device_put_pr(pr, dtype=jnp.float32)
            xd = jnp.asarray(x, jnp.float32)
            t0 = time.perf_counter()
            y = np.asarray(pr_spmv_pallas(dpr, xd))
            print(f"  COMPILE+RUN OK in {time.perf_counter()-t0:.1f}s "
                  f"(y[0]={y[0]:.3f})", flush=True)
        except Exception:
            print("  FAILED:", flush=True)
            traceback.print_exc()
            sys.stdout.flush()
        finally:
            try:
                del dpr
            except NameError:
                pass
            import gc
            gc.collect()


if __name__ == "__main__":
    main()
