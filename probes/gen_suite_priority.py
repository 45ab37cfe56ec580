"""Regenerate suite_mtx/*.mtx in measurement-priority order (VM #4 recovery).

Writes each matrix as soon as it is built so downstream chain stages can
start the moment their input file exists. Giants (fem3d_cube,
banded_fem_large) are last / skippable via GEN_SKIP_GIANTS=1 — their sweep
rows are already committed in result_tpu_r3.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sparsematrixvectormultiplication_tpu.models.synthetic import BENCH_SUITE
from sparsematrixvectormultiplication_tpu.io.mmio import write_matrix_market

ORDER = [
    "road_like",
    "ml_laplace_like",
    "powerlaw_web",
    "webbase_like",
    "dense_rows_mix",
    "random_uniform",
    "thermal_like",
    "banded_fem_medium",
    "fem3d_cube",
    "banded_fem_large",
]
GIANTS = {"fem3d_cube", "banded_fem_large"}


def main() -> None:
    d = os.path.join(REPO, "suite_mtx")
    os.makedirs(d, exist_ok=True)
    entries = {e.name: e for e in BENCH_SUITE}
    skip_giants = os.environ.get("GEN_SKIP_GIANTS", "0") == "1"
    for name in ORDER:
        if skip_giants and name in GIANTS:
            print(f"[gen] skip giant {name}", flush=True)
            continue
        p = os.path.join(d, f"{name}.mtx")
        if os.path.exists(p):
            print(f"[gen] exists {name}", flush=True)
            continue
        e = entries[name]
        t0 = time.perf_counter()
        coo = e.builder()
        tmp = p + ".tmp"
        write_matrix_market(tmp, coo.nrows, coo.ncols, coo.row, coo.col, coo.val)
        os.replace(tmp, p)
        print(
            f"[gen] {name}: {coo.nnz} nnz in {time.perf_counter()-t0:.1f}s",
            flush=True,
        )
    print("[gen] ALL DONE", flush=True)


if __name__ == "__main__":
    main()
