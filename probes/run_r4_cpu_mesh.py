"""Round-4 CPU-mesh device-scale sweep, multi-path (VERDICT r3 item 7).

The r3 curves covered 3 small matrices on the SELL path only (every HLL
column zero). This sweep runs SELL + HLL on six regime matrices and PR /
split on the scattered ones, 1..8 virtual CPU devices, writing
openmp-schema rows (num_threads = device count) into
result_cpu_mesh_r4/spmv_scale_devices.csv.

Matrices are sized ~0.5-1M nnz: interpret-mode Pallas costs ~1 us/nnz, so
these sizes keep the whole multi-path sweep under an hour while still an
order of magnitude above the per-call fixed overhead at 8 shards.

CPU-only (forces the cpu platform before jax init) — safe to run while a
TPU chain is measuring (the one-TPU-process rule is about TPU processes).
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_CSV = os.path.join(REPO, "result_cpu_mesh_r4", "spmv_scale_devices.csv")


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
        banded, copurchase_graph, diagonal_dominant, kkt_saddle, power_law,
        road_network)

    # (name, builder, paths): PR/split only where the regime is scattered
    # enough for those kernels to be the production choice.
    cases = [
        ("banded_small", lambda: banded(120_000, 8, 300, seed=1),
         ["sell", "hll"]),
        ("thermal_small", lambda: diagonal_dominant(100_000, 7, seed=2),
         ["sell", "hll"]),
        ("kkt_small", lambda: kkt_saddle(32, seed=3),
         ["sell", "hll"]),
        ("amazon_small", lambda: copurchase_graph(100_000, seed=4),
         ["sell", "hll", "pr", "split"]),
        ("road_small", lambda: road_network(200_000, seed=5),
         ["sell", "hll", "pr", "split"]),
        ("powerlaw_small", lambda: power_law(150_000, 3, seed=6),
         ["sell", "hll", "pr"]),
    ]

    os.makedirs(os.path.dirname(OUT_CSV), exist_ok=True)
    done = set()
    if os.path.exists(OUT_CSV):
        import csv as _csv
        with open(OUT_CSV) as f:
            done = {r[0] for r in _csv.reader(f)}

    for name, build, paths in cases:
        t0 = time.perf_counter()
        coo = build()
        csr = CSRMatrix.from_coo(coo)
        # PR conversion requires heavy rows pre-split (formats/pr.py)
        csr_k, seg_map = csr.split_heavy_rows(1024)
        print(f"[{name}] {csr.nnz} nnz built in "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        for path in paths:
            label = f"{name}[{path}]"
            if label in done:
                print(f"[{name}] {path}: already in CSV, skipping",
                      flush=True)
                continue
            use = csr_k if path in ("pr", "split") else csr
            try:
                run_path_scale_sweep(name, use, OUT_CSV, path,
                                     iterations=4, rounds=2,
                                     log=lambda m: print(m, flush=True))
            except Exception as e:  # noqa: BLE001 — keep sweeping
                print(f"[{name}] {path} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
