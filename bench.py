#!/usr/bin/env python
"""Driver benchmark: flagship Pallas SELL SpMV on a Cube_Coup_dt0-class
banded FEM matrix, validated against the fp64 host oracle.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the reference's best CUDA result on its largest
FEM-class matrix (warp-per-row CSR on Cube_Coup_dt0: 47.09 fp64 GFLOPS,
reference result/result_cuda.csv row 3 / BASELINE.md) — the headline number
of the reference project.

Environment notes (see .claude/skills/verify/SKILL.md): this runtime's first
host->device transfer stalls for minutes regardless of size, so a tiny
warm-up transfer runs first; compiles are cached persistently.
"""

import json
import sys
import time

BASELINE_GFLOPS = 47.09  # reference CUDA warp-CSR, Cube_Coup_dt0 (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from sparsematrixvectormultiplication_tpu.bench.harness import BenchConfig, run_matrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import banded

    t_all = time.time()
    # absorb the one-time transfer warm-up stall before timing anything
    t0 = time.time()
    float(np.asarray(jnp.sum(jax.device_put(np.ones(1024, np.float32)))))
    log(f"transfer warm-up: {time.time()-t0:.0f}s")

    # Cube_Coup_dt0-class banded FEM, ~57 nnz/row, uniform rows -> one SELL
    # bin -> one kernel compile. ~14M nnz, ~155 MB streamed per SpMV.
    t0 = time.time()
    coo = banded(250_000, 60, 2500, seed=1)
    log(f"matrix gen: {time.time()-t0:.0f}s nnz={coo.nnz}")

    # reps=256: the tunnel's fixed dispatch+readback cost is ~27 ms per
    # chained call (measured, probes/bw_probe2.py) — at the reference-style
    # 20 reps that overhead dominated the ~0.8 ms kernel and understated
    # throughput ~2.5x. 256 chained, serialized (data-dependent) reps
    # amortize it below 2%.
    cfg = BenchConfig(
        iterations=256,
        rounds=2,
        dtype="float32",
        kernels=("serial_csr", "pallas_sell", "pallas_sell_dd"),
        flush_between_stages=False,
    )
    res = run_matrix("banded_fem_250k", coo, cfg, log=log)

    s = res.stage("pallas_sell")
    assert s is not None, "pallas_sell stage missing"
    dd = res.stage("pallas_sell_dd")
    ok = s.diff.significant_diffs == 0 or s.diff.mean_rel_err < 1e-4
    log(f"total bench time: {time.time()-t_all:.0f}s")
    print(
        json.dumps(
            {
                "metric": "pallas_sell_f32_gflops_banded_fem_14Mnnz",
                "value": round(s.gflops, 3),
                "unit": "GFLOPS",
                "vs_baseline": round(s.gflops / BASELINE_GFLOPS, 4),
                "valid": bool(ok),
                "mean_rel_err": s.diff.mean_rel_err,
                "nnz": res.nnz,
                "time_ms": round(s.seconds * 1e3, 3),
                "fp64_dd_gflops": round(dd.gflops, 3) if dd else None,
                "fp64_dd_vs_baseline": round(dd.gflops / BASELINE_GFLOPS, 4) if dd else None,
                "fp64_dd_max_rel_err": dd.diff.max_rel_err if dd else None,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
