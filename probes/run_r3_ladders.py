"""Follow-on ladder sweep for round 3 (VERDICT r2 item 5).

Runs the K-bin ladder axis (bench/scale.py run_ladder_sweep — the
single-chip restoration of the reference's per-matrix multi-point curves,
main.c:18 / src/utility.c:114-120) for EVERY suite matrix, file-driven
from suite_mtx/*.mtx, appending to result_tpu_r3/spmv_scale_ladders.csv.

Resume-aware: matrices already present in the CSV are skipped, so the
script can be re-run after a TPU outage. Ordered cheap-first so a short
recovery window still yields the most matrices.
"""
from __future__ import annotations

import csv
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_CSV = os.path.join(REPO, "result_tpu_r3", "spmv_scale_ladders.csv")
SUITE_DIR = os.path.join(REPO, "suite_mtx")

# cheap-first priority order (nnz ascending, giants last)
ORDER = [
    "random_uniform",
    "dense_rows_mix",
    "powerlaw_web",
    "road_like",
    "webbase_like",
    "thermal_like",
    "banded_fem_medium",
    "ml_laplace_like",
    "fem3d_cube",
    "banded_fem_large",
]


def done_matrices(path: str) -> set[str]:
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        rows = list(csv.reader(f))
    return {r[0] for r in rows[1:] if r}


def main() -> None:
    from sparsematrixvectormultiplication_tpu.bench.scale import run_ladder_sweep
    from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
    from sparsematrixvectormultiplication_tpu.formats.coo import COOMatrix

    os.makedirs(os.path.dirname(OUT_CSV), exist_ok=True)
    skip = done_matrices(OUT_CSV)
    for name in ORDER:
        if name in skip:
            print(f"[{name}] already in CSV, skipping", flush=True)
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
