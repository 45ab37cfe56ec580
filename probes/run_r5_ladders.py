"""Round-5 ladder sweep completion (VERDICT r4 item 4).

Covers the suite matrices the r3/r4 ladder passes never reached — the r4
pass died at powerlaw_web because the sweep fed unsplit power-law heads to
conversion (K>=1024 bins fault the TPU worker); bench/scale.py now applies
the harness's heavy-row split first, so the scattered matrices are safe.

Resume-aware across r3/r4/r5 CSVs; cheap-first; giants last.
"""
from __future__ import annotations

import csv
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_CSV = os.path.join(REPO, "result_tpu_r5", "spmv_scale_ladders.csv")
SUITE_DIR = os.path.join(REPO, "suite_mtx")

ORDER = [
    "powerlaw_web",
    "webbase_like",
    "dense_rows_mix",
    "thermal_like",
    "banded_fem_medium",
    "ml_laplace_like",
    "fem3d_cube",
    "banded_fem_large",
]


def done_matrices(path: str) -> set:
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        rows = list(csv.reader(f))
    return {r[0] for r in rows[1:] if r}


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sparsematrixvectormultiplication_tpu.bench.scale import run_ladder_sweep
    from sparsematrixvectormultiplication_tpu.formats.coo import COOMatrix
    from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix

    os.makedirs(os.path.dirname(OUT_CSV), exist_ok=True)
    skip = (done_matrices(OUT_CSV)
            | done_matrices(os.path.join(REPO, "result_tpu_r3",
                                         "spmv_scale_ladders.csv"))
            | done_matrices(os.path.join(REPO, "result_tpu_r4",
                                         "spmv_scale_ladders.csv")))
    for name in ORDER:
        if name in skip:
            print(f"[{name}] already covered, skipping", flush=True)
            continue
        path = os.path.join(SUITE_DIR, f"{name}.mtx")
        if not os.path.exists(path):
            print(f"[{name}] no .mtx at {path}, skipping", flush=True)
            continue
        t0 = time.perf_counter()
        coo = COOMatrix.from_mtx(path)
        csr = CSRMatrix.from_coo(coo)
        print(f"[{name}] loaded {csr.nnz} nnz in {time.perf_counter()-t0:.1f}s",
              flush=True)
        try:
            run_ladder_sweep(name, csr, OUT_CSV,
                             log=lambda m: print(m, flush=True))
        except Exception as e:  # noqa: BLE001 — keep sweeping on failure
            print(f"[{name}] ladder sweep FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
