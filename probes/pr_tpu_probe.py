"""TPU probe for the PR (permutation-routed) kernel on the scattered suite.

Runs the pallas_pr stage (plus the serial oracle) on the zero-locality
matrices where broadcast kernels hit the diffuse floor, appending rows to
result_tpu_r3/ CSVs via the standard harness. Resume-aware by matrix.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_DIR = os.path.join(REPO, "result_tpu_r3_pr")
SUITE_DIR = os.path.join(REPO, "suite_mtx")
MATRICES = ["powerlaw_web", "webbase_like", "road_like", "dense_rows_mix",
            "random_uniform"]


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    from sparsematrixvectormultiplication_tpu.bench.csv_report import (
        NATIVE_HEADER,
        write_native_row,
    )
    from sparsematrixvectormultiplication_tpu.bench.harness import (
        BenchConfig,
        run_matrix,
    )
    from sparsematrixvectormultiplication_tpu.formats.coo import COOMatrix

    csv_path = os.path.join(OUT_DIR, "spmv_results.csv")
    done = set()
    if os.path.exists(csv_path):
        import csv as _csv
        with open(csv_path) as f:
            done = {r[0] for r in list(_csv.reader(f))[1:] if r}

    cfg = BenchConfig(iterations=32, rounds=2,
                      kernels=("serial_csr", "pallas_pr", "pallas_pr_dd"))
    for name in MATRICES:
        if name in done:
            print(f"[{name}] already done, skipping", flush=True)
            continue
        path = os.path.join(SUITE_DIR, f"{name}.mtx")
        if not os.path.exists(path):
            print(f"[{name}] missing {path}", flush=True)
            continue
        t0 = time.perf_counter()
        coo = COOMatrix.from_mtx(path)
        print(f"[{name}] loaded in {time.perf_counter()-t0:.1f}s", flush=True)
        try:
            res = run_matrix(name, coo, cfg,
                             log=lambda m: print(m, flush=True))
            write_native_row(csv_path, res)
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
