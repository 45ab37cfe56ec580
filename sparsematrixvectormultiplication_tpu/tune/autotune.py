"""Autotuner — kernel/layout/bin selection by measurement.

TPU re-design of the reference's launch configuration layer:
``cudaOccupancyMaxPotentialBlockSize`` picks CUDA block sizes at runtime
(main_cuda.cu:149,212,293,413,545,613) and the chosen dims are logged to CSV
(write_block_result_to_csv, cuda_src/utility.cu:236-261). Here the tunables
are the SELL K-bin ladder, forced layout (k-major / sb-major / auto cost
model), and the HLL hack size; the tuner measures real device time per
candidate and returns the winner plus a log for
:func:`..bench.csv_report.write_tile_config_row`-style reporting.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.csr import CSRMatrix
from ..formats.hll import HLLMatrix
from ..formats.sell import DEFAULT_K_BINS, SellMatrix
from ..ops.pallas_sell import device_put_sell, sell_spmv_pallas
from ..utils.timing import time_device_fn_batched

__all__ = ["SellCandidate", "TuneResult", "autotune_sell", "autotune_hack_size"]

# K-bin ladders to try: finer ladders cut padding, coarser ladders cut the
# number of pallas_call launches (127 us each on this runtime).
DEFAULT_LADDERS = {
    "default": DEFAULT_K_BINS,
    "pow2": (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024),
    "fine": tuple(range(8, 1032, 8)),
    "coarse": (8, 32, 128, 512, 2048),
}


@dataclass
class SellCandidate:
    name: str
    k_bins: tuple
    layout: str = "auto"
    merge_bins: bool = True


@dataclass
class TuneResult:
    best: SellCandidate
    best_seconds: float
    table: list = field(default_factory=list)  # (name, seconds, stats) rows
    assembly: str = "auto"  # measured bin-assembly choice for the winner


# tune on a row-prefix subsample beyond this: each candidate re-converts
# and re-uploads the matrix, and a 119M-nnz matrix makes that hours
_TUNE_NNZ_CAP = 20_000_000

# don't device-time candidates whose f32 device arrays exceed this — at
# the runtime's ~20-40 MB/s upload rate a 65x-padded scattered candidate
# costs minutes to time and its padding already disqualifies it
_TUNE_UPLOAD_CAP_BYTES = 600 * 1024 * 1024


def _tune_sample(csr: CSRMatrix, x):
    """Group-aligned row prefix of ~_TUNE_NNZ_CAP nnz (tuning measures
    RELATIVE candidate cost; a structurally-representative prefix ranks
    identically at a fraction of the conversion/upload time)."""
    if csr.nnz <= _TUNE_NNZ_CAP:
        return csr, x
    cut_rows = int(np.searchsorted(csr.row_ptr, _TUNE_NNZ_CAP))
    cut_rows = max(1024, (cut_rows // 1024) * 1024)
    cut_rows = min(cut_rows, csr.nrows)
    p1 = int(csr.row_ptr[cut_rows])
    sub = CSRMatrix(cut_rows, csr.ncols,
                    csr.row_ptr[: cut_rows + 1].copy(),
                    csr.col_idx[:p1], csr.values[:p1])
    return sub, x


def autotune_sell(
    csr: CSRMatrix,
    x=None,
    candidates=None,
    dtype=jnp.float32,
    reps: int = 10,
    log=None,
) -> TuneResult:
    """Measure each (ladder, layout) candidate's SpMV time; return the winner.

    On non-TPU backends falls back to the host cost model (conversion-only,
    no device timing) so tests stay fast. Matrices beyond ~20M nnz tune on
    a group-aligned row-prefix subsample (see _tune_sample).
    """
    if candidates is None:
        candidates = [SellCandidate(n, kb) for n, kb in DEFAULT_LADDERS.items()]
        candidates += [
            SellCandidate("default-kmajor", DEFAULT_K_BINS, "k-major"),
            SellCandidate("default-sbmajor", DEFAULT_K_BINS, "sb-major"),
            SellCandidate("default-sblist", DEFAULT_K_BINS, "sb-list"),
            # forced wl relaxes the fill guard to 8x (formats/sell.py) so
            # moderately-banded groups get a MEASURED shot at wl's ~430 GB/s
            # streaming (VERDICT r2 item 2)
            SellCandidate("default-wl", DEFAULT_K_BINS, "wl"),
            # wl with pile shedding (one slot per slab; overflow -> add_into
            # remainder) — cuts forced-wl padding 4.4x -> 2.0x on
            # random-in-band (formats/sell.py _from_csr_wl_shed)
            SellCandidate("default-wlshed", DEFAULT_K_BINS, "wl-shed"),
            SellCandidate("default-nomerge", DEFAULT_K_BINS, merge_bins=False),
        ]
    on_tpu = jax.devices()[0].platform == "tpu"
    if x is None:
        x = np.ones(csr.ncols)
    csr, x = _tune_sample(csr, x)

    # pre-conversion padding estimate (K-bin pad from the row-nnz profile,
    # no conversion): scattered power-law shapes pad 60x+, and CONVERTING
    # such a candidate costs minutes before the upload gate can reject it
    nnz_rows = np.diff(csr.row_ptr).astype(np.int64)
    padded_rows_n = -(-csr.nrows // 1024) * 1024
    prof = np.zeros(padded_rows_n, np.int64)
    prof[: csr.nrows] = nnz_rows
    kg_prof = prof.reshape(-1, 1024).max(axis=1)

    def _est_padded(k_bins):
        edges = np.asarray(sorted(set(int(e) for e in k_bins)), np.int64)
        idx = np.minimum(np.searchsorted(edges, np.maximum(kg_prof, 1),
                                         side="left"), edges.size - 1)
        K = np.maximum(edges[idx], np.maximum(kg_prof, 1))
        return int(K.sum()) * 1024

    # operator opt-out: candidate names listed in <repo>/.tune_skip (one per
    # line, '#' comments) are skipped without conversion or upload. Read per
    # autotune_sell call so a LIVE sweep can be steered between matrices —
    # added Aug 19 after a default-sbmajor device call blocked a worker-side
    # hang for 40+ min with no timeout able to interrupt it in-process.
    skip_names: set = set()
    try:
        _skip_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".tune_skip")
        with open(_skip_path) as _f:
            skip_names = {ln.strip() for ln in _f
                          if ln.strip() and not ln.startswith("#")}
    except OSError:
        pass

    table = []
    best = None
    best_sec = float("inf")
    for cand in candidates:
        if cand.name in skip_names:
            if log:
                log(f"[tune] {cand.name} skipped: listed in .tune_skip")
            table.append((cand.name, float("inf"), {"skipped": ".tune_skip"}))
            continue
        if on_tpu:
            est_bytes = _est_padded(cand.k_bins) * 8
            if est_bytes > _TUNE_UPLOAD_CAP_BYTES:
                if log:
                    log(f"[tune] {cand.name} skipped: est device arrays "
                        f"{est_bytes / 2**20:.0f} MiB > upload cap")
                table.append((cand.name, float("inf"),
                              {"skipped": f"est {est_bytes>>20} MiB"}))
                continue
        t0 = time.perf_counter()
        try:
            sell = SellMatrix.from_csr(csr, k_bins=cand.k_bins, layout=cand.layout,
                                       merge_bins=cand.merge_bins)
        except Exception as e:
            table.append((cand.name, float("inf"), {"error": str(e)}))
            continue
        conv_s = time.perf_counter() - t0
        stats = sell.memory_stats()
        stats["convert_s"] = conv_s
        if on_tpu:
            # upload-cost gate: this runtime sustains only ~20-40 MB/s to
            # the device, so a 65x-padded scattered candidate costs 5-10
            # MINUTES of pure upload to measure a kernel that padding
            # already disqualifies (powerlaw_web, sweep_r3 Aug 19: the
            # tune alone ate the resume budget). Candidates beyond the cap
            # keep their host conversion stats but are not device-timed.
            dev_bytes = int(stats["padded_nnz"]) * 8  # f32 ja+as planes
            if dev_bytes > _TUNE_UPLOAD_CAP_BYTES:
                if log:
                    log(f"[tune] {cand.name} skipped: device arrays "
                        f"{dev_bytes / 2**20:.0f} MiB > upload cap "
                        f"{_TUNE_UPLOAD_CAP_BYTES / 2**20:.0f} MiB")
                table.append((cand.name, float("inf"),
                              {"skipped": f"upload {dev_bytes>>20} MiB"}))
                continue
            # per-candidate failure tolerance: adversarial regimes produce
            # candidates that exceed the upload guard (65x-padded scattered
            # SELL -> MemoryError), SMEM (sb-list prefetch tables), or VMEM
            # (register spills) — a losing candidate must cost a table row,
            # not the whole matrix (sweep_r3 Aug 19: thermal/road/powerlaw/
            # webbase all lost every stage to one bad candidate here)
            try:
                dsell = device_put_sell(sell, dtype=dtype)
                xd = jnp.asarray(x, dtype)
                sec, _ = time_device_fn_batched(
                    lambda d, xx: sell_spmv_pallas(d, xx), dsell, xd,
                    reps=reps, rounds=2
                )
            except Exception as e:  # noqa: BLE001
                if log:
                    log(f"[tune] {cand.name} FAILED: "
                        f"{type(e).__name__}: {str(e)[:200]}")
                table.append((cand.name, float("inf"), {"error": str(e)[:300]}))
                continue
        else:
            # host cost model: same constants the converter's merge policy
            # uses (formats/sell.py, measured on TPU v5e)
            from ..formats.sell import _LAUNCH_S, _PALLAS_BW, _VREG_OP_S

            passes = sum(b.cost_passes for b in sell.bins)
            stream = stats["bytes_total"]
            sec = max(passes * _VREG_OP_S, stream / _PALLAS_BW) \
                + len(sell.bins) * _LAUNCH_S
        stats["modeled" if not on_tpu else "measured"] = sec
        table.append((cand.name, sec, stats))
        if log:
            log(f"[tune] {cand.name}: {sec*1e3:.3f} ms, pad={stats['padding_ratio']:.2f}, "
                f"bins={stats['num_bins']}")
        if sec < best_sec:
            best, best_sec = cand, sec

    # assembly A/B on the winner: "sum" gives every bin its own zero buffer
    # (data-independent calls overlap DMA/compute — measured 386 GB/s
    # two-call overlap, probes/kernel_probe4); "auto" chains core bins and
    # isolates add_into bins. Only worth measuring on TPU with >1 bin.
    assembly = "auto"
    if on_tpu and best is not None:
        try:
            sell = SellMatrix.from_csr(csr, k_bins=best.k_bins,
                                       layout=best.layout,
                                       merge_bins=best.merge_bins)
            if len(sell.bins) > 1:
                dsell = device_put_sell(sell, dtype=dtype)
                xd = jnp.asarray(x, dtype)
                s_sum, _ = time_device_fn_batched(
                    lambda d, xx: sell_spmv_pallas(d, xx, assembly="sum"),
                    dsell, xd, reps=reps, rounds=2)
                if log:
                    log(f"[tune] assembly: auto {best_sec*1e3:.3f} ms vs "
                        f"sum {s_sum*1e3:.3f} ms")
                if s_sum < best_sec:
                    assembly = "sum"
        except Exception:  # noqa: BLE001 — assembly tuning is best-effort
            pass
    return TuneResult(best=best, best_seconds=best_sec, table=table,
                      assembly=assembly)


def autotune_hack_size(
    coo_or_csr,
    sizes=(8, 16, 32, 64, 128),
    x=None,
    log=None,
):
    """HLL hack-size sweep (BASELINE.json config 3): returns
    (best_size, [(size, padded_ratio, host_spmv_seconds), ...]).

    Ranks by padded area (the true ELLPACK work measure the reference's HLL
    scheduler balances by, SURVEY §2.1) — measured host SpMV time is also
    recorded.
    """
    csr = coo_or_csr if isinstance(coo_or_csr, CSRMatrix) else CSRMatrix.from_coo(coo_or_csr)
    if x is None:
        x = np.ones(csr.ncols)
    csr, x = _tune_sample(csr, x)
    rows = []
    best = None
    best_area = float("inf")
    for h in sizes:
        hll = HLLMatrix.from_csr(csr, hack_size=h)
        st = hll.memory_stats()
        t0 = time.perf_counter()
        hll.spmv(x)
        sec = time.perf_counter() - t0
        rows.append((h, st["padding_ratio"], sec))
        if log:
            log(f"[tune] hack={h}: pad={st['padding_ratio']:.3f}, host spmv {sec*1e3:.1f} ms")
        if st["padded_nnz"] < best_area:
            best, best_area = h, st["padded_nnz"]
    return best, rows
