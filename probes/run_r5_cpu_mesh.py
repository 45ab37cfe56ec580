"""Round-5 CPU-mesh sweep: the column-sharded psum path (VERDICT r4 item 8).

Adds `sell_cols` (column-sharded SELL Pallas + psum epilogue,
parallel/spmd_colsell.py) rows at 1/2/4/8 virtual devices for three regime
matrices, next to a `sell` (row-sharded) control on the same matrices so
the two layouts' curves are directly comparable. CPU-mesh timings are
correctness/telemetry rows (interpret-mode serialization makes the
absolute numbers noise — documented since r3); the byte model lives in
docs/DESIGN.md "Column vs row sharding".

CPU-only — safe to run while a TPU chain is measuring.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_CSV = os.path.join(REPO, "result_cpu_mesh_r5", "spmv_scale_devices.csv")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sparsematrixvectormultiplication_tpu.bench.scale import (
        run_path_scale_sweep)
    from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import (
        banded, diagonal_dominant, econ_sectors)

    cases = [
        ("banded_small", lambda: banded(120_000, 8, 300, seed=1)),
        ("thermal_small", lambda: diagonal_dominant(100_000, 7, seed=2)),
        ("econ_small", lambda: econ_sectors(100_000, seed=3)),
    ]

    os.makedirs(os.path.dirname(OUT_CSV), exist_ok=True)
    done = set()
    if os.path.exists(OUT_CSV):
        import csv as _csv
        with open(OUT_CSV) as f:
            done = {r[0] for r in _csv.reader(f)}

    for name, build in cases:
        for path in ("sell_cols", "sell"):
            label = f"{name}[{path}]"
            if label in done:
                print(f"{label} already covered", flush=True)
                continue
            t0 = time.perf_counter()
            csr = CSRMatrix.from_coo(build())
            print(f"[{name}] built in {time.perf_counter()-t0:.1f}s "
                  f"({csr.nnz} nnz)", flush=True)
            try:
                run_path_scale_sweep(name, csr, OUT_CSV, path,
                                     log=lambda m: print(m, flush=True))
            except Exception as e:  # noqa: BLE001
                print(f"{label} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
