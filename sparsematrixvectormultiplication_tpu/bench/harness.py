"""Benchmark harness — stage runner with validation (≙ main.c / main_cuda.cu).

Reproduces the reference driver shape: per matrix, convert to every format,
run each kernel stage for ``skip + iterations`` passes (reference
NUM_ITERATION=100 incl. 5-iteration warm-up skip, main.c:20, utility.h:7),
validate every stage against the serial fp64 CSR oracle
(≙ main.c:145,207,260,310,362), and report mean time / GFLOPS / errors.

TPU-specific deltas (by design, see utils/timing.py):
  - timing uses readback-forced wall clock and in-jit scan chaining, since
    dispatch is async and this runtime's block_until_ready returns early;
  - validation compares one representative device result on the host per
    stage instead of copying y D2H every iteration (the reference pays a
    cudaMemcpy per iteration, main_cuda.cu:183-188 — on TPU that would
    serialize the pipeline);
  - an HBM scrub between stages ≙ clear_cache (utility.c:141-159).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.coo import COOMatrix
from ..formats.csr import CSRMatrix
from ..formats.hll import DEFAULT_HACK_SIZE, HLLMatrix
from ..formats.sell import SellMatrix
from ..ops.pallas_sell import device_put_sell, sell_spmv_pallas
from ..ops.xla import device_put_csr, device_put_ell
from ..utils.metrics import calculate_flops
from ..utils.timing import (ITERATION_SKIP, time_device_fn_batched,
                            time_device_fn_slope)
from ..utils.validation import (
    DEFAULT_ABS_TOL,
    DEFAULT_REL_TOL,
    DiffMetrics,
    difference_metrics,
    sampled_spmm_metrics,
)

__all__ = ["BenchConfig", "StageResult", "MatrixResult", "run_matrix", "flush_hbm"]


@dataclass
class BenchConfig:
    iterations: int = 20          # measured reps (reference uses 95; TPU runs are chained)
    skip: int = ITERATION_SKIP    # warm-up iterations (≙ utility.h:7)
    rounds: int = 3               # outer repetitions; best round wins
    abs_tol: float = DEFAULT_ABS_TOL
    rel_tol: float = DEFAULT_REL_TOL
    dtype: str = "float32"        # device dtype for performance kernels
    hack_size: int = DEFAULT_HACK_SIZE
    kernels: tuple = ("serial_csr", "serial_hll", "xla_csr", "xla_ell", "pallas_sell")
    spmm_rhs: int = 128           # RHS columns for the pallas_bsr_spmm stage
                                  # (the kernel pads B to a 128-lane multiple
                                  # and computes the padded width — non-128
                                  # multiples understate GFLOPS)
    sell_spmm_rhs: int = 16       # RHS columns for pallas_sell_spmm (each
                                  # RHS keeps a whole x-table in VMEM, so R
                                  # is budget-bounded; 16 fits fem3d-class N)
    ell_max_elements: int = 1 << 27  # guard for power-law rect blow-up
                                     # (536 MB f32; bigger ELL rects have
                                     # crashed the tunneled TPU worker)
    flush_between_stages: bool = True
    validate: bool = True
    autotune: bool = False        # pick SELL ladder/layout + hack size by
                                  # measurement (≙ cudaOccupancyMaxPotentialBlockSize,
                                  # main_cuda.cu:149,293,413)
    sell_k_bins: tuple | None = None   # explicit K-bin ladder override
    sell_layout: str = "auto"          # "auto" | "k-major" | "sb-major" | "sb-list"
    sell_merge_bins: bool = True       # False = keep span/layout sub-bins
                                       # separate (A/B lever: the r2->r3
                                       # ml_laplace regression suspect)
    sell_chunk_k: int = 0              # >0: force sb-major chunk height,
                                       # bypassing the K>64 ck>=16 rule
                                       # (r2->r4 ml_laplace bisect lever)
    reorder: str = "none"              # "none" | "rcm" | "auto" — symmetric
                                       # P A Pᵀ bandwidth-reducing preprocessing
                                       # (formats/reorder.py; workload-equivalent,
                                       # x=ones is permutation-invariant)
    device_validate: bool = False      # per-iteration in-graph validation
                                       # (≙ the reference's in-loop
                                       # checkResult, main_cuda.cu:183-188):
                                       # one extra chained run accumulating
                                       # max|y_i - y_0| on-device, single
                                       # readback; overhead recorded per
                                       # stage, never part of the timed run


@dataclass
class StageResult:
    stage: str
    seconds: float
    gflops: float
    diff: DiffMetrics
    extra: dict = field(default_factory=dict)


@dataclass
class MatrixResult:
    name: str
    nrows: int
    ncols: int
    nnz: int
    stages: dict            # stage -> StageResult
    format_stats: dict
    config: BenchConfig

    def stage(self, name: str) -> StageResult | None:
        return self.stages.get(name)

    def speedup(self, stage: str, baseline: str = "serial_csr") -> float:
        b, s = self.stages.get(baseline), self.stages.get(stage)
        if not b or not s or s.seconds <= 0:
            return 0.0
        return b.seconds / s.seconds


def flush_hbm(mbytes: int = 64):
    """Scrub a buffer through HBM between stages (≙ clear_cache,
    utility.c:141-159 / clear_gpu_cache, cuda_src/utility.cu:148-175)."""
    n = mbytes * 1024 * 1024 // 4
    buf = jnp.ones((n,), jnp.float32)
    float(np.asarray(jnp.sum(buf * 1.0000001)))


def _dtype(cfg: BenchConfig):
    return {"float32": jnp.float32, "float64": jnp.float64,
            "bfloat16": jnp.bfloat16}[cfg.dtype]


def _transient_compile_error(e: Exception) -> bool:
    """True for the tunneled worker's FLAKY remote-compile failures.

    The axon worker's compile helper intermittently dies with
    ``remote_compile: HTTP 500: tpu_compile_helper subprocess exit code 1``
    on kernels that compiled fine seconds earlier in the same process (the
    Aug-20 sweep lost ml_laplace's pallas_sell row to this after the tuner
    timed the SAME wl-shed config at 3.95 ms).  These are worth one retry;
    deterministic Mosaic rejections (ValueError, lowering errors) are not.
    """
    msg = str(e)
    return ("remote_compile" in msg and
            ("HTTP 50" in msg or "tpu_compile_helper" in msg))


def run_matrix(
    name: str,
    coo: COOMatrix,
    cfg: BenchConfig = BenchConfig(),
    x: np.ndarray | None = None,
    log=print,
) -> MatrixResult:
    """Run all configured stages on one matrix (≙ the per-matrix body of
    main.c:39-459 / main_cuda.cu:52-729)."""
    M, N, nnz = coo.nrows, coo.ncols, coo.nnz
    if x is None:
        x = np.ones(N, dtype=np.float64)  # ≙ init_vector_at_one (utility.c:18)

    t0 = time.perf_counter()
    csr = CSRMatrix.from_coo(coo)
    t_csr_conv = time.perf_counter() - t0

    stages: dict = {}
    fstats = {"csr": csr.memory_stats(), "convert_csr_s": t_csr_conv}

    if cfg.reorder in ("rcm", "auto") and M == N:
        # bandwidth-reducing preprocessing (formats/reorder.py): the SpMV
        # workload is unchanged (same nnz/FLOPs, y' = P y); every stage,
        # including the serial oracle, runs the permuted problem, so
        # validation is self-consistent.
        from ..formats.reorder import reorder_rcm

        csr, perm_r, rstats = reorder_rcm(
            csr, mode=cfg.reorder, log=lambda m: log(f"[{name}] {m}"))
        fstats["reorder"] = rstats
        if perm_r is not None:
            x = np.asarray(x)[perm_r]

    # --- golden oracle: host fp64 serial CSR (≙ csr_matrix_vector_mult) ---
    y_ref = None
    if "serial_csr" in cfg.kernels:
        times = []
        for i in range(min(cfg.skip, 2) + 3):
            t0 = time.perf_counter()
            y_ref = csr.spmv(x)
            times.append(time.perf_counter() - t0)
        sec = min(times)
        stages["serial_csr"] = StageResult(
            "serial_csr", sec, calculate_flops(nnz, sec) / 1e9, DiffMetrics()
        )
        log(f"[{name}] serial_csr: {sec*1e3:.3f} ms = {stages['serial_csr'].gflops:.3f} GFLOPS (host fp64 oracle)")
    if y_ref is None:
        y_ref = csr.spmv(x)

    def validate(y, perm=None, ref=None) -> DiffMetrics:
        """``ref`` substitutes the oracle — reduced-precision stages (bf16
        values) validate against the fp64 SpMV of the bf16-QUANTIZED
        matrix, so the metric isolates kernel correctness from storage
        quantization and the default f32-level bars still apply."""
        if not cfg.validate:
            return DiffMetrics()
        ref = y_ref if ref is None else ref
        ref = ref if perm is None else ref[perm]
        return difference_metrics(ref, np.asarray(y, np.float64)[:M],
                                  cfg.abs_tol, cfg.rel_tol)

    dt = _dtype(cfg)
    xd = jnp.asarray(x, dt)
    # non-panel SELL stages take x pre-packed as the (Rp, 128) slab table:
    # the in-jit relayout costs ~0.4 ms at N=1M (probes/sg_overhead.out) and
    # the reference also uploads x before timing (main_cuda.cu:134-145)
    from ..formats.sell import PanelSellMatrix as _PanelSell
    from ..ops.pallas_sell import device_put_x

    def _x_for(sell_obj):
        return xd if isinstance(sell_obj, _PanelSell) \
            else device_put_x(x, N, dt)

    sell_kw = {"layout": cfg.sell_layout,
               "merge_bins": cfg.sell_merge_bins}
    if cfg.sell_chunk_k > 0:
        sell_kw["chunk_k"] = cfg.sell_chunk_k
        sell_kw["chunk_k_forced"] = True
    assembly = "auto"  # bin-assembly mode (autotune may pick "sum")
    if cfg.sell_k_bins:
        sell_kw["k_bins"] = tuple(cfg.sell_k_bins)
    hack_size = cfg.hack_size  # local: autotune must not leak into the shared
    if cfg.autotune:           # BenchConfig across a suite sweep
        # measured launch-config selection (≙ the reference's occupancy API
        # calls + block-dim CSV, main_cuda.cu:149,293,413 / utility.cu:236-261)
        from ..tune.autotune import autotune_hack_size, autotune_sell

        try:
            tr = autotune_sell(csr, x=x, dtype=dt, log=log)
        except Exception as e:  # noqa: BLE001 — tuning must never lose the
            from ..tune.autotune import TuneResult  # matrix's stages

            log(f"[{name}] autotune FAILED ({type(e).__name__}: "
                f"{str(e)[:200]}) -> defaults")
            tr = TuneResult(best=None, best_seconds=float("inf"))
        if tr.best is not None:
            sell_kw = {"layout": tr.best.layout, "k_bins": tr.best.k_bins,
                       "merge_bins": tr.best.merge_bins}
        assembly = tr.assembly
        best_hack, hack_rows = autotune_hack_size(csr, log=log)
        hack_size = best_hack or hack_size
        # tr.best None means the tuner RAN and every candidate lost or was
        # skipped (upload caps, .tune_skip) — the shipped config is the
        # default. Record that decision explicitly: an empty tuned_ladder
        # column reads as "tuner never ran" (VERDICT r2 item 4).
        fstats["tune"] = {
            "ladder": tr.best.name if tr.best else "default",
            "layout": tr.best.layout if tr.best else cfg.sell_layout,
            "assembly": tr.assembly,
            "hack_size": best_hack,
            "table": [(n, s) for n, s, _ in tr.table],
            "hack_table": hack_rows,
        }
        log(f"[{name}] autotune: ladder={fstats['tune']['ladder']} "
            f"layout={fstats['tune']['layout']} hack={best_hack}")

    hll = None
    if {"serial_hll", "xla_ell", "pallas_hll"} & set(cfg.kernels):
        t0 = time.perf_counter()
        hll = HLLMatrix.from_csr(csr, hack_size)
        fstats["convert_hll_s"] = time.perf_counter() - t0
        fstats["hll"] = hll.memory_stats()

    if "serial_hll" in cfg.kernels and hll is not None:
        t0 = time.perf_counter()
        y = hll.spmv(x)
        sec = time.perf_counter() - t0
        stages["serial_hll"] = StageResult(
            "serial_hll", sec, calculate_flops(nnz, sec) / 1e9, validate(y)
        )
        log(f"[{name}] serial_hll: {sec*1e3:.3f} ms, sig_diffs={stages['serial_hll'].diff.significant_diffs}")

    def run_device_stage(stage, fn, *args, perm=None, time_fn=None, ref=None):
        # per-STAGE failure tolerance: one kernel failing (e.g. a prefetch
        # table exceeding SMEM on an adversarial matrix) must not lose the
        # other stages' rows (finer-grained than the reference's per-matrix
        # recovery, main.c:54-75). ``perm`` validates row-permuted kernel
        # output (auto-sigma) against the permuted oracle. ``time_fn`` (if
        # given) is what gets TIMED — used to keep host-reducible epilogues
        # (heavy-row segment reduction) out of the timed kernel path.
        for attempt in (0, 1):
            try:
                if cfg.flush_between_stages:
                    flush_hbm()
                y = np.asarray(fn(*args))  # correctness pass (also compiles)
                dm = validate(y, perm, ref)
                # slope timing cancels the tunnel's fixed ~32 ms per-invocation
                # cost, which inflates every sub-ms kernel by fixed/reps at
                # one-point timing (utils/timing.py time_device_fn_slope)
                sec, _ = time_device_fn_slope(time_fn or fn, *args,
                                              reps=cfg.iterations,
                                              rounds=cfg.rounds)
                dv = None
                if cfg.device_validate:
                    # per-iteration running validation, fully on-device
                    # (run_device_validated): compares every chained rep
                    # against the correctness pass's output
                    from ..utils.timing import run_device_validated
                    dv_reps = min(cfg.iterations, 16)
                    tfn = time_fn or fn
                    y_tref = tfn(*args)  # the timed fn's own reference run
                    y_tref = y_tref[0] if isinstance(y_tref, tuple) else y_tref
                    dv_diff, dv_sec = run_device_validated(
                        tfn, *args, y_ref=y_tref, reps=dv_reps)
                    dv = {"device_val_max_diff": dv_diff,
                          "device_val_reps": dv_reps,
                          "device_val_overhead_pct":
                              (dv_sec / sec - 1.0) * 100.0 if sec > 0
                              else 0.0}
                break
            except Exception as e:  # noqa: BLE001
                if attempt == 0 and _transient_compile_error(e):
                    log(f"[{name}] {stage} transient remote-compile failure "
                        f"({str(e)[:120]}) — retrying in 30 s")
                    time.sleep(30)
                    continue
                log(f"[{name}] {stage} FAILED: {type(e).__name__}: {str(e)[:300]}")
                return False
        stages[stage] = StageResult(stage, sec, calculate_flops(nnz, sec) / 1e9, dm,
                                    extra=dict(dv) if dv else {})
        log(f"[{name}] {stage}: {sec*1e3:.3f} ms = {stages[stage].gflops:.3f} GFLOPS, "
            f"sig_diffs={dm.significant_diffs}, max_rel={dm.max_rel_err:.2e}")
        if dv:
            log(f"[{name}] {stage} device-validate: max|y_i-y_0|="
                f"{dv['device_val_max_diff']:.3e} over {dv['device_val_reps']} "
                f"reps, overhead {dv['device_val_overhead_pct']:+.1f}%")
        return True

    # NOTE: device data is always threaded through as jit ARGUMENTS, never
    # captured in closures — this runtime ships closure constants inside the
    # remote-compile request (measured: HTTP 413 at ~1 GB matrices)
    import gc

    if "xla_csr" in cfg.kernels:
        try:
            dcsr = device_put_csr(csr, dtype=dt)
            run_device_stage("xla_csr", lambda d, xx: d.spmv(xx)[:M], dcsr, xd)
            del dcsr          # free HBM before the next stage (accumulated
            gc.collect()      # buffers have crashed the tunneled worker)
        except MemoryError as e:
            log(f"[{name}] xla_csr skipped: {e}")

    if "xla_ell" in cfg.kernels and hll is not None:
        try:
            dell = device_put_ell(hll, dtype=dt, max_elements=cfg.ell_max_elements)
            run_device_stage("xla_ell", lambda d, xx: d.spmv(xx), dell, xd)
            del dell
            gc.collect()
        except MemoryError as e:
            log(f"[{name}] xla_ell skipped: {e}")

    def build_sell(**kw):
        """SELL conversion, transparently column-panelled when x exceeds the
        VMEM budget (dd needs two half-tables, so the dd-safe width is used
        whenever the dd stage runs too). Pathological plain conversions
        (power-law heads: K>1024 bins whose kernels blow the Mosaic compile
        helper, or padding >16x) automatically fall back to SELL-sigma row
        sorting — the layout designed for that regime (Kreutzer et al.;
        the reference's HLL collapses to 0.21 GFLOPS there, BASELINE.md)."""
        from ..formats.sell import PanelSellMatrix
        from ..ops.pallas_sell import max_x_table_cols

        limit = max_x_table_cols(dt)
        if "pallas_sell_dd" in cfg.kernels:
            limit //= 2
        if N > limit:
            sigma = kw.pop("sigma_sort", False)
            return PanelSellMatrix.from_csr(csr_k, max_panel_cols=limit,
                                            sigma_sort=sigma, **kw)
        sell = SellMatrix.from_csr(csr_k, **kw)
        if not kw.get("sigma_sort") and (
            any(b.k > 1024 for b in sell.bins) or sell.padding_ratio > 8
        ):
            log(f"[{name}] plain SELL pathological "
                f"(pad {sell.padding_ratio:.1f}, kmax "
                f"{max((b.k for b in sell.bins), default=0)}) -> auto sigma")
            sell = SellMatrix.from_csr(csr_k, sigma_sort=True, **kw)
        return sell

    # ultra-heavy rows (power-law heads) split into <=cap-entry segments;
    # the kernels' output is reduced back with an on-device segment_sum
    # (classic row-splitting; the reference has no answer here — its HLL
    # collapses to 0.21 GFLOPS on webbase-1M, BASELINE.md)
    # cap 256: k-major kernels materialize (K*8,128) tile temporaries, and
    # K=1024 bins (~3k vregs) crash the Mosaic compile helper; K<=256 is the
    # regime the kernels are proven to compile in.
    # Short-row-dominated (scattered) matrices split much finer: the SG
    # shared-window layout (formats/sg.py) needs a row's entries per column
    # region to be ~1, or dense rows cascade through the tile precedence and
    # poison window spans — 16-entry segments behave like ordinary short rows
    # (≙ the reference's thread-per-row regime, csr_matrix_cuda.cu:122-148)
    med_nnz = float(np.median(csr.row_nnz())) if M else 0.0
    split_cap = 16 if med_nnz <= 24 else 256
    # strided for the scattered regime: consecutive-column segments would
    # concentrate a dense row's entries in one SG window (formats/csr.py)
    csr_k, seg_map = csr.split_heavy_rows(split_cap,
                                          strided=split_cap < 256)
    if seg_map is not None:
        log(f"[{name}] split {csr_k.nrows - M} heavy-row segments "
            f"(rows {M} -> {csr_k.nrows})")
        fstats["heavy_row_segments"] = int(csr_k.nrows - M)

    def _kernel_ids(sell_obj):
        """Kernel-output-order -> original-row segment ids (or None)."""
        perm = getattr(sell_obj, "row_perm", None)
        if seg_map is None and perm is None:
            return None
        ids = seg_map if seg_map is not None else np.arange(csr_k.nrows)
        if perm is not None:
            ids = np.asarray(ids)[perm]
        return jnp.asarray(ids, jnp.int32)

    sell = None
    if {"pallas_sell", "pallas_sell_bf16", "pallas_sell_dd"} & set(cfg.kernels):
        t0 = time.perf_counter()
        sell = build_sell(**sell_kw)
        fstats["convert_sell_s"] = time.perf_counter() - t0
        fstats["sell"] = sell.memory_stats()
    on_tpu = jax.devices()[0].platform != "cpu"

    def _run_pallas_sell(sell_obj, asm):
        """Returns True on success OR clean MemoryError skip (no fallback
        wanted), False on a stage failure worth falling back from."""
        try:  # the upload guard can raise MemoryError — keep it a per-stage
              # skip like xla_csr/sigma/dd, not a whole-matrix abort
            dsell = device_put_sell(sell_obj, dtype=dt)
        except MemoryError as e:
            log(f"[{name}] pallas_sell skipped: {e}")
            return True
        ids = _kernel_ids(sell_obj)

        def _sell_fn(d, xx, _ids=ids):
            y = sell_spmv_pallas(d, xx, interpret=not on_tpu, assembly=asm)
            if _ids is not None:
                y = jax.ops.segment_sum(y, _ids, num_segments=M)
            return y

        return bool(run_device_stage(
            "pallas_sell", _sell_fn, dsell, _x_for(sell_obj),
            time_fn=lambda d, xx: sell_spmv_pallas(
                d, xx, interpret=not on_tpu, assembly=asm)))

    if "pallas_sell" in cfg.kernels and sell is not None:
        default_kw = {"layout": cfg.sell_layout,
                      "merge_bins": cfg.sell_merge_bins}
        if not _run_pallas_sell(sell, assembly) and (
                sell_kw != default_kw or assembly != "auto"):
            # the tuned ladder's kernel failed even after the transient
            # retry (worker compile-helper HTTP 500s hit specific tuned
            # configs, Aug-19/20 sweeps) — fall back to the default ladder
            # so the matrix still ships a pallas_sell row; sigma/dd below
            # reuse the fallback bins, matching what actually measured.
            log(f"[{name}] pallas_sell fallback: tuned config "
                f"{sell_kw}/{assembly} failed -> default ladder")
            sell_kw, assembly = default_kw, "auto"
            try:
                t0 = time.perf_counter()
                sell = build_sell(**sell_kw)
                fstats["convert_sell_fallback_s"] = time.perf_counter() - t0
                fstats["sell"] = sell.memory_stats()
                if "tune" in fstats:
                    fstats["tune"]["ladder"] += "->default(fallback)"
                    fstats["tune"]["layout"] = cfg.sell_layout
                _run_pallas_sell(sell, assembly)
            except Exception as e:  # noqa: BLE001
                log(f"[{name}] pallas_sell fallback FAILED: "
                    f"{type(e).__name__}: {str(e)[:300]}")

    if "pallas_sell_bf16" in cfg.kernels and sell is not None:
      # bf16 VALUE planes on the same SELL bins: halves the dominant HBM
      # value stream (4 -> 2 B/nnz); x-table and accumulation stay f32
      # (kernels widen values at load). The downward end of the precision
      # ladder (bf16 / f32 / f64-dd) — TPU's native reduced precision, the
      # analogue of the reference benchmarking fp64 only because that's
      # the GPU's native width (cuda_src/csr_matrix_cuda.cu:96-148).
      # Validated against the fp64 SpMV of the bf16-QUANTIZED matrix: the
      # metric isolates kernel correctness (f32-level bars apply) from
      # storage quantization, which is the mode's documented tradeoff.
      try:
        dbf = device_put_sell(sell, dtype=jnp.bfloat16)
        ids_bf = _kernel_ids(sell)
        import ml_dtypes

        csr_q = CSRMatrix(csr.nrows, csr.ncols, csr.row_ptr, csr.col_idx,
                          csr.values.astype(ml_dtypes.bfloat16)
                                    .astype(np.float64))
        ref_bf = csr_q.spmv(x)

        def _bf_fn(d, xx, _ids=ids_bf):
            y = sell_spmv_pallas(d, xx, interpret=not on_tpu,
                                 assembly=assembly)
            if _ids is not None:
                y = jax.ops.segment_sum(y, _ids, num_segments=M)
            return y

        run_device_stage(
            "pallas_sell_bf16", _bf_fn, dbf, _x_for(sell),
            time_fn=lambda d, xx: sell_spmv_pallas(
                d, xx, interpret=not on_tpu, assembly=assembly),
            ref=ref_bf)
        del dbf
        gc.collect()
      except MemoryError as e:
        log(f"[{name}] pallas_sell_bf16 skipped: {e}")

    if "pallas_hll" in cfg.kernels and hll is not None:
        # HLL work profile on the Pallas machinery (≙ spmv_hll_warp_kernel,
        # cuda_src/hll_matrix.cu:379-426) — the device-side half of the
        # reference's CSR-vs-HLL format shootout. The HLL padded area on
        # power-law/dense-row matrices explodes (the reference's own HLL
        # collapse regime, 0.21 GFLOPS on webbase-1M) — skip beyond the ELL
        # element cap rather than materializing GBs of padding.
        hll_padded = int(hll.memory_stats().get("padded_nnz", nnz))
        hll_maxnz = int(np.asarray(hll.maxnz).max()) if hll.num_blocks else 0
        if hll_padded > cfg.ell_max_elements or hll_maxnz > 256:
            # monster blocks (power-law heads) recreate VMEM-exceeding K
            # bins in the repack — the reference's own HLL collapse regime
            log(f"[{name}] pallas_hll skipped: HLL padded area "
                f"{hll_padded} / max block MAXNZ {hll_maxnz}")
        else:
          try:  # upload guard raises MemoryError (2.4 GiB HLL repack on
                # power-law heavy-split rows) — keep it a per-stage skip,
                # not a whole-matrix abort
            from ..ops.pallas_hll import device_put_hll_pallas, hll_spmv_pallas

            dhll = device_put_hll_pallas(hll, dtype=dt)
            run_device_stage(
                "pallas_hll",
                lambda d, xx: hll_spmv_pallas(d, xx, interpret=not on_tpu),
                dhll, device_put_x(x, N, dt),
            )
          except MemoryError as e:
            log(f"[{name}] pallas_hll skipped: {e}")

    if "pallas_sell_sigma" in cfg.kernels:
      # SELL-C-sigma: rows sorted by nnz (padding collapse on power-law);
      # kernel output is in sorted order — validated against the permuted
      # oracle, matching SELL-C-sigma benchmarking practice
      try:
        t0 = time.perf_counter()
        sell_sig = build_sell(sigma_sort=True)
        fstats["convert_sell_sigma_s"] = time.perf_counter() - t0
        fstats["sell_sigma"] = sell_sig.memory_stats()
        dsig = device_put_sell(sell_sig, dtype=dt)
        ids_sig = _kernel_ids(sell_sig)

        def _sig_fn(d, xx, _ids=ids_sig):
            y = sell_spmv_pallas(d, xx, interpret=not on_tpu)
            if _ids is not None:
                y = jax.ops.segment_sum(y, _ids, num_segments=M)
            return y

        if cfg.flush_between_stages:
            flush_hbm()
        x_sig = _x_for(sell_sig)
        dm = validate(_sig_fn(dsig, x_sig))
        sec, _ = time_device_fn_slope(
            lambda d, xx: sell_spmv_pallas(d, xx, interpret=not on_tpu),
            dsig, x_sig, reps=cfg.iterations, rounds=cfg.rounds,
        )
        stages["pallas_sell_sigma"] = StageResult(
            "pallas_sell_sigma", sec, calculate_flops(nnz, sec) / 1e9, dm,
            extra={"padding_ratio": sell_sig.padding_ratio},
        )
        log(f"[{name}] pallas_sell_sigma: {sec*1e3:.3f} ms = "
            f"{stages['pallas_sell_sigma'].gflops:.3f} GFLOPS, "
            f"pad={sell_sig.padding_ratio:.2f}, sig_diffs={dm.significant_diffs}")
      except Exception as e:  # noqa: BLE001
        log(f"[{name}] pallas_sell_sigma FAILED: {type(e).__name__}: {str(e)[:300]}")

    pr = None  # shared between the f32 and dd PR stages when it fits both
    if "pallas_pr" in cfg.kernels:
      # PR permutation-routed kernel: gather in column order (each x-slab
      # visited once globally), route products to k-major row order by a
      # precomputed Beneš network, reduce. The zero-locality answer to the
      # reference's thread-per-row CUDA kernel (csr_matrix_cuda.cu:122-148)
      # — broadcast-scan kernels hit the diffuse floor there
      # (docs/DESIGN.md round-3). Output is in PR sigma row order.
      try:
        from ..formats.pr import pr_from_csr
        from ..ops.pallas_pr import device_put_pr, pr_spmv_pallas

        from ..formats.pr import PANEL_TARGET_ROWS
        from ..ops.pallas_pr_dd import DD_PANEL_TARGET_ROWS

        x_pr = device_put_x(x, N, dt)
        # Panel rows are clamped host-side by the predictive VMEM model
        # (formats/pr.py max_pr_rows, calibrated to the decoded compile-
        # helper OOM anchors) — the old two-cap crash-and-retry loop is
        # gone (VERDICT r4 item 5).
        t0 = time.perf_counter()
        pr = pr_from_csr(csr_k, target_rows=PANEL_TARGET_ROWS)
        fstats["convert_pr_s"] = time.perf_counter() - t0
        fstats["pr"] = pr.memory_stats()
        dpr = device_put_pr(pr, dtype=dt)
        if cfg.flush_between_stages:
            flush_hbm()
        y_pr = np.asarray(
            pr_spmv_pallas(dpr, x_pr, interpret=not on_tpu), np.float64)
        if seg_map is not None:  # host-exact heavy-row segment reduction
            ids = np.asarray(seg_map)[pr.row_perm]
            dm = validate(np.bincount(ids, weights=y_pr, minlength=M)[:M])
        else:
            dm = validate(y_pr, perm=pr.row_perm)
        sec, _ = time_device_fn_slope(
            lambda d, xx: pr_spmv_pallas(d, xx, interpret=not on_tpu),
            dpr, x_pr, reps=cfg.iterations, rounds=cfg.rounds)
        stages["pallas_pr"] = StageResult(
            "pallas_pr", sec, calculate_flops(nnz, sec) / 1e9, dm,
            extra={"padding_ratio": pr.padding_ratio})
        log(f"[{name}] pallas_pr: {sec*1e3:.3f} ms = "
            f"{stages['pallas_pr'].gflops:.3f} GFLOPS, "
            f"pad={pr.padding_ratio:.2f}, sig_diffs={dm.significant_diffs}")
        del dpr
        gc.collect()
      except Exception as e:  # noqa: BLE001
        log(f"[{name}] pallas_pr FAILED: {type(e).__name__}: {str(e)[:300]}")

    if "pallas_pr_dd" in cfg.kernels:
      # fp64-class PR: dd products ride the same Beneš routing (the dd
      # answer to the reference's fp64 kernels on zero-locality matrices,
      # where broadcast dd kernels sit at the diffuse floor)
      try:
        from ..formats.pr import pr_from_csr
        from ..ops.pallas_pr_dd import (
            DD_PANEL_TARGET_ROWS,
            device_put_pr_dd,
            pr_spmv_pallas_dd,
        )

        t0 = time.perf_counter()
        # reuse the f32 stage's conversion when every problem fits dd's
        # predictive VMEM budget (the routing is dtype-agnostic)
        from ..formats.pr import max_pr_rows
        dd_cap = min(DD_PANEL_TARGET_ROWS, max_pr_rows(N, dd=True))
        if pr is not None and all(
            q.n_rows <= dd_cap
            for q in getattr(pr, "panels", (pr,))
        ):
            pr_dd = pr
        else:
            pr_dd = pr_from_csr(csr_k, target_rows=DD_PANEL_TARGET_ROWS,
                                dd=True)
        fstats["convert_pr_dd_s"] = time.perf_counter() - t0
        dprd = device_put_pr_dd(pr_dd)
        xh = np.asarray(x, np.float32)
        xl = np.asarray(x - xh.astype(np.float64), np.float32)
        xh_d = device_put_x(xh, N, jnp.float32)
        xl_d = device_put_x(xl, N, jnp.float32)
        if cfg.flush_between_stages:
            flush_hbm()
        yh, yl = pr_spmv_pallas_dd(dprd, xh_d, xl_d, interpret=not on_tpu)
        y64 = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
        if seg_map is not None:  # host-exact heavy-row segment reduction
            ids = np.asarray(seg_map)[pr_dd.row_perm]
            dm = validate(np.bincount(ids, weights=y64, minlength=M)[:M])
        else:
            dm = validate(y64, perm=pr_dd.row_perm)

        def prdd_fn(d, xh_, xl_):
            yh_, yl_ = pr_spmv_pallas_dd(d, xh_, xl_, interpret=not on_tpu)
            return yh_ + yl_  # timing checksum path; accuracy combines in f64

        sec, _ = time_device_fn_slope(prdd_fn, dprd, xh_d, xl_d,
                                      reps=cfg.iterations, rounds=cfg.rounds)
        stages["pallas_pr_dd"] = StageResult(
            "pallas_pr_dd", sec, calculate_flops(nnz, sec) / 1e9, dm,
            extra={"padding_ratio": pr_dd.padding_ratio})
        log(f"[{name}] pallas_pr_dd: {sec*1e3:.3f} ms = "
            f"{stages['pallas_pr_dd'].gflops:.3f} GFLOPS, "
            f"pad={pr_dd.padding_ratio:.2f}, sig_diffs={dm.significant_diffs}")
        del dprd
        gc.collect()
      except Exception as e:  # noqa: BLE001
        log(f"[{name}] pallas_pr_dd FAILED: {type(e).__name__}: {str(e)[:300]}")

    if "pallas_split" in cfg.kernels:
      # locality split: near-band SELL + natural-order PR far tail (one
      # entry per row -> identity sigma -> plain vector add, no scatter).
      # The road/circuit-regime answer to the reference's thread-per-row
      # CUDA kernel (cuda_src/csr_matrix_cuda.cu:122-148); see
      # formats/split.py for the measured rationale.
      try:
        from ..formats.split import SplitMatrix
        from ..ops.pallas_split import device_put_split, split_spmv_pallas

        t0 = time.perf_counter()
        try:
            sm = SplitMatrix.from_csr(csr_k)
        except ValueError as e:
            sm = None
            log(f"[{name}] pallas_split skipped: {str(e)[:160]}")
        if sm is not None:
            fstats["convert_split_s"] = time.perf_counter() - t0
            fstats["split"] = sm.memory_stats()
            dsm = device_put_split(sm, dtype=dt)
            x_sp = device_put_x(x, N, dt)
            if cfg.flush_between_stages:
                flush_hbm()
            y_sp = np.asarray(
                split_spmv_pallas(dsm, x_sp, interpret=not on_tpu),
                np.float64)
            if seg_map is not None:  # host-exact heavy-row reduction
                dm = validate(np.bincount(np.asarray(seg_map), weights=y_sp,
                                          minlength=M)[:M])
            else:
                dm = validate(y_sp)
            sec, _ = time_device_fn_slope(
                lambda d, xx: split_spmv_pallas(d, xx, interpret=not on_tpu),
                dsm, x_sp, reps=cfg.iterations, rounds=cfg.rounds)
            stages["pallas_split"] = StageResult(
                "pallas_split", sec, calculate_flops(nnz, sec) / 1e9, dm,
                extra={"slab_dist": sm.slab_dist, "far_frac": sm.far_frac})
            log(f"[{name}] pallas_split: {sec*1e3:.3f} ms = "
                f"{stages['pallas_split'].gflops:.3f} GFLOPS, "
                f"far_frac={sm.far_frac:.3f}, "
                f"sig_diffs={dm.significant_diffs}")
            del dsm
            gc.collect()
      except Exception as e:  # noqa: BLE001
        log(f"[{name}] pallas_split FAILED: {type(e).__name__}: {str(e)[:300]}")

    if "pallas_split_dd" in cfg.kernels:
      # fp64-class locality split: SELL-dd near + PR-dd far, renormalized
      # with an error-free dd add (ops/pallas_split.py split_spmv_pallas_dd)
      try:
        from ..formats.split import SplitMatrix
        from ..ops.pallas_split import (device_put_split_dd,
                                        split_spmv_pallas_dd)

        t0 = time.perf_counter()
        try:
            # reuse the f32 stage's conversion (dtype-agnostic host product)
            sm_dd = locals().get("sm") or SplitMatrix.from_csr(csr_k)
        except ValueError as e:
            sm_dd = None
            log(f"[{name}] pallas_split_dd skipped: {str(e)[:160]}")
        if sm_dd is not None:
            fstats["convert_split_dd_s"] = time.perf_counter() - t0
            dsm_dd = device_put_split_dd(sm_dd)
            xh = np.asarray(x, np.float32)
            xl = np.asarray(x - xh.astype(np.float64), np.float32)
            xh_d = device_put_x(xh, N, jnp.float32)
            xl_d = device_put_x(xl, N, jnp.float32)
            if cfg.flush_between_stages:
                flush_hbm()
            yh, yl = split_spmv_pallas_dd(dsm_dd, xh_d, xl_d,
                                          interpret=not on_tpu)
            y64 = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
            if seg_map is not None:
                dm = validate(np.bincount(np.asarray(seg_map), weights=y64,
                                          minlength=M)[:M])
            else:
                dm = validate(y64)

            def splitdd_fn(d, xh_, xl_):
                yh_, yl_ = split_spmv_pallas_dd(d, xh_, xl_,
                                                interpret=not on_tpu)
                return yh_ + yl_

            sec, _ = time_device_fn_slope(splitdd_fn, dsm_dd, xh_d, xl_d,
                                          reps=cfg.iterations,
                                          rounds=cfg.rounds)
            stages["pallas_split_dd"] = StageResult(
                "pallas_split_dd", sec, calculate_flops(nnz, sec) / 1e9, dm,
                extra={"slab_dist": sm_dd.slab_dist,
                       "far_frac": sm_dd.far_frac})
            log(f"[{name}] pallas_split_dd: {sec*1e3:.3f} ms = "
                f"{stages['pallas_split_dd'].gflops:.3f} GFLOPS "
                f"(fp64-class), sig_diffs={dm.significant_diffs}")
            del dsm_dd
            gc.collect()
      except Exception as e:  # noqa: BLE001
        log(f"[{name}] pallas_split_dd FAILED: "
            f"{type(e).__name__}: {str(e)[:300]}")

    if "pallas_bsr_spmm" in cfg.kernels:
      # MXU block-sparse SpMM: Y = A @ X with cfg.spmm_rhs dense RHS — the
      # op class SpMV can never feed the MXU (ops/pallas_bsr.py). Runs on
      # the ORIGINAL rows (blocks absorb long rows; truly dense rows blow
      # the byte budget and fail this stage cleanly). GFLOPS counts the
      # full 2*nnz*B work; validation samples 4 columns against the fp64
      # oracle (a full fp64 host SpMM would dominate the stage wall-clock).
      try:
        from ..formats.bsr import BSRMatrix
        from ..ops.pallas_bsr import (
            bsr_spmm_pallas,
            device_put_bsr,
            pad_rhs,
        )

        B_rhs = int(cfg.spmm_rhs)
        t0 = time.perf_counter()
        bsr = BSRMatrix.from_csr(csr)
        fstats["convert_bsr_s"] = time.perf_counter() - t0
        fstats["bsr"] = {"blocks": bsr.n_real_blocks, "kb": bsr.kb,
                         "fill": bsr.fill, "pad_ratio": bsr.pad_ratio,
                         "bytes": bsr.nbytes}
        dbsr = device_put_bsr(bsr, dtype=dt)
        Xmm = np.random.default_rng(0).standard_normal(
            (N, B_rhs), dtype=np.float32)  # f32 gen: no 8*N*B transient
        xmm_d = pad_rhs(Xmm, N, dtype=dt)
        if cfg.flush_between_stages:
            flush_hbm()

        def spmm_fn(d, xx):
            return bsr_spmm_pallas(d, xx, interpret=not on_tpu)

        Ymm = np.asarray(spmm_fn(dbsr, xmm_d), np.float64)[:, :B_rhs]
        dm = (sampled_spmm_metrics(csr, Xmm, Ymm, cfg.abs_tol, cfg.rel_tol)
              if cfg.validate else DiffMetrics())
        sec, _ = time_device_fn_slope(spmm_fn, dbsr, xmm_d,
                                      reps=cfg.iterations, rounds=cfg.rounds)
        stages["pallas_bsr_spmm"] = StageResult(
            "pallas_bsr_spmm", sec,
            calculate_flops(nnz * B_rhs, sec) / 1e9, dm,
            extra={"rhs": B_rhs, "fill": bsr.fill, "kb": bsr.kb})
        log(f"[{name}] pallas_bsr_spmm: {sec*1e3:.3f} ms = "
            f"{stages['pallas_bsr_spmm'].gflops:.1f} GFLOPS (B={B_rhs}, "
            f"fill={bsr.fill:.3f}), sig_diffs={dm.significant_diffs}")
        del dbsr
        gc.collect()
      except Exception as e:  # noqa: BLE001
        log(f"[{name}] pallas_bsr_spmm FAILED: {type(e).__name__}: {str(e)[:300]}")

    if "pallas_sell_spmm" in cfg.kernels:
      # Multi-RHS SELL SpMM: stream A once, serve R right-hand sides
      # (ops/pallas_sell_spmm.py) — covers the scattered/banded matrices
      # whose fill blows the BSR byte budget, and is the fast path block
      # solvers ride (solvers/cg.py cg_multi). R is VMEM-bounded: each RHS
      # adds a whole x-table to the kernel's resident set.
      try:
        from ..ops.pallas_sell_spmm import (
            MAX_RHS,
            device_put_x_multi,
            sell_spmm_pallas,
        )

        R_rhs = min(int(cfg.sell_spmm_rhs), MAX_RHS)
        t0 = time.perf_counter()
        sell_mm = build_sell(layout="k-major")  # spmm serves k-major bins
        fstats["convert_sell_spmm_s"] = time.perf_counter() - t0
        dmm = device_put_sell(sell_mm, dtype=dt, resident=False)
        ids_mm = _kernel_ids(sell_mm)
        Xmm2 = np.random.default_rng(0).standard_normal(
            (N, R_rhs), dtype=np.float32)
        xmm2_d = device_put_x_multi(Xmm2, N, dtype=jnp.float32)
        if cfg.flush_between_stages:
            flush_hbm()

        def sell_spmm_fn(d, xx, _ids=ids_mm):
            y = sell_spmm_pallas(d, xx, interpret=not on_tpu)
            if _ids is not None:
                y = jax.ops.segment_sum(y, _ids, num_segments=M)
            return y

        Ymm2 = np.asarray(sell_spmm_fn(dmm, xmm2_d), np.float64)
        dm = (sampled_spmm_metrics(csr, Xmm2, Ymm2, cfg.abs_tol, cfg.rel_tol)
              if cfg.validate else DiffMetrics())
        sec, _ = time_device_fn_slope(
            lambda d, xx: sell_spmm_pallas(d, xx, interpret=not on_tpu),
            dmm, xmm2_d, reps=cfg.iterations, rounds=cfg.rounds)
        stages["pallas_sell_spmm"] = StageResult(
            "pallas_sell_spmm", sec,
            calculate_flops(nnz * R_rhs, sec) / 1e9, dm,
            extra={"rhs": R_rhs})
        log(f"[{name}] pallas_sell_spmm: {sec*1e3:.3f} ms = "
            f"{stages['pallas_sell_spmm'].gflops:.1f} GFLOPS (R={R_rhs}), "
            f"sig_diffs={dm.significant_diffs}")
        del dmm
        gc.collect()
      except Exception as e:  # noqa: BLE001
        log(f"[{name}] pallas_sell_spmm FAILED: {type(e).__name__}: {str(e)[:300]}")

    if "pallas_sell_dd" in cfg.kernels and sell is not None:
      # fp64-class double-double kernel (≙ the reference's fp64 kernels);
      # split/combine host-side so no x64 mode is required on device
      try:
        from ..ops.pallas_sell_dd import device_put_sell_dd, sell_spmv_pallas_dd

        sell_dd = sell
        # look through column panels too: PanelSellMatrix holds its bins on
        # .panels[*].bins (a bare .bins getattr saw none and slot-packed sg
        # panels reached device_put_sell_dd, failing the whole stage)
        all_bins = [b for part in getattr(sell, "panels", [sell])
                    for b in getattr(part, "bins", [])]
        if any(getattr(b, "sg_slots", False) for b in all_bins):
            # slot-packed sg bins are f32-only (the dd error-free transforms
            # need row-unique positions) — rebuild rows-mode for this stage
            t0 = time.perf_counter()
            sell_dd = build_sell(**{**sell_kw, "sg_slots": False})
            fstats["convert_sell_dd_s"] = time.perf_counter() - t0
        dsell_dd = device_put_sell_dd(sell_dd)
        xh = np.asarray(x, np.float32)
        xl = np.asarray(x - xh.astype(np.float64), np.float32)
        if isinstance(sell_dd, _PanelSell):
            xh_d, xl_d = jnp.asarray(xh), jnp.asarray(xl)
        else:  # pre-packed (Rp, 128) tables, like the f32 stages
            xh_d = device_put_x(xh, N, jnp.float32)
            xl_d = device_put_x(xl, N, jnp.float32)

        ids_dd = _kernel_ids(sell_dd)

        def dd_fn(d, xh_d, xl_d, _ids=ids_dd):
            yh, yl = sell_spmv_pallas_dd(d, xh_d, xl_d, interpret=not on_tpu)
            y = yh + yl  # timing checksum path; accuracy path combines in f64
            if _ids is not None:
                y = jax.ops.segment_sum(y, _ids, num_segments=M)
            return y

        for attempt in (0, 1):
            try:
                if cfg.flush_between_stages:
                    flush_hbm()
                yh, yl = sell_spmv_pallas_dd(dsell_dd, xh_d, xl_d,
                                             interpret=not on_tpu)
                y64 = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
                if ids_dd is not None:  # host-exact f64 segment reduction
                    y64 = np.bincount(np.asarray(ids_dd), weights=y64,
                                      minlength=M)[:M]
                dm = validate(y64)
                sec, _ = time_device_fn_slope(
                    lambda d, hh, ll: sell_spmv_pallas_dd(
                        d, hh, ll, interpret=not on_tpu)[0],
                    dsell_dd, xh_d, xl_d, reps=cfg.iterations,
                    rounds=cfg.rounds)
                break
            except Exception as e:  # noqa: BLE001
                if attempt == 0 and _transient_compile_error(e):
                    log(f"[{name}] pallas_sell_dd transient remote-compile "
                        f"failure — retrying in 30 s")
                    time.sleep(30)
                    continue
                raise
        stages["pallas_sell_dd"] = StageResult(
            "pallas_sell_dd", sec, calculate_flops(nnz, sec) / 1e9, dm
        )
        log(f"[{name}] pallas_sell_dd: {sec*1e3:.3f} ms = "
            f"{stages['pallas_sell_dd'].gflops:.3f} GFLOPS (fp64-class), "
            f"sig_diffs={dm.significant_diffs}, max_rel={dm.max_rel_err:.2e}")
      except Exception as e:  # noqa: BLE001
        log(f"[{name}] pallas_sell_dd FAILED: {type(e).__name__}: {str(e)[:300]}")

    return MatrixResult(name, M, N, nnz, stages, fstats, cfg)
