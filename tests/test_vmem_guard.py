"""Predictive VMEM guard (VERDICT r4 item 5).

The tunneled compile helper's HTTP 500 was decoded to a deterministic
VMEM OOM at AOT compile (docs/DESIGN.md): f32 PR at 2^15 Beneš rows used
152.59M of the chip's 128M; the 2^14 control compiled at ~76M; the dd
twin's 2^14 panels run at suite scale. These tests pin the host-side
model to those measured anchors so panel sizing can never rediscover the
limit by crashing the compile helper (the old harness crash-and-retry
path is dead code).
"""
import numpy as np

from sparsematrixvectormultiplication_tpu.formats.pr import (
    PANEL_TARGET_ROWS,
    PR_VMEM_BUDGET,
    estimate_pr_vmem_bytes,
    max_pr_rows,
    pr_from_csr,
)
from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix


def test_f32_anchor_2e15_rejected():
    # measured "Used 152.59M of 128.00M" — the model must price 2^15 f32
    # beyond budget for any ncols
    est = estimate_pr_vmem_bytes(1 << 15, ncols=1024)
    assert est > PR_VMEM_BUDGET
    # and close to the measured 152.59M (within 10%)
    assert abs(est - 152.59e6 * 1.048576) / (152.59 * 2**20) < 0.10


def test_f32_anchor_2e14_admitted():
    # measured ~76M used — comfortably under budget even at 1M columns
    est = estimate_pr_vmem_bytes(1 << 14, ncols=1_000_000)
    assert est < PR_VMEM_BUDGET


def test_dd_2e14_suite_scale_admitted():
    # dd 2^14 panels ran the full suite at ~1M cols (r3/r4 PR result dirs)
    assert max_pr_rows(1_000_000, dd=True) >= 1 << 14


def test_dd_2e15_rejected():
    assert max_pr_rows(1024, dd=True) < 1 << 15


def test_f32_cap_is_2e14():
    # the f32 2^15 OOM means the guard must cap at 2^14 for typical ncols
    assert max_pr_rows(1_000_000, dd=False) == 1 << 14


def test_monotone_in_ncols():
    # wider x tables can only shrink the admissible row count
    caps = [max_pr_rows(n, dd=True) for n in (1_000, 1_000_000, 60_000_000)]
    assert sorted(caps, reverse=True) == caps


def _tiny_csr(nrows=256, k=4, ncols=512, seed=0):
    rng = np.random.default_rng(seed)
    ptr = np.arange(nrows + 1, dtype=np.int64) * k
    col = rng.integers(0, ncols, size=nrows * k).astype(np.int32)
    # PR conversion requires column-sorted rows
    col = np.sort(col.reshape(nrows, k), axis=1).ravel()
    val = rng.standard_normal(nrows * k)
    return CSRMatrix(nrows, ncols, ptr, col, val)


def test_pr_from_csr_clamps_target_rows():
    csr = _tiny_csr()
    # an absurd explicit target is clamped by the model, not honored
    pr = pr_from_csr(csr, target_rows=1 << 20, dd=True)
    for p in getattr(pr, "panels", (pr,)):
        assert p.n_rows <= max_pr_rows(csr.ncols, dd=True)
        assert estimate_pr_vmem_bytes(p.n_rows, csr.ncols,
                                      dd=True) <= PR_VMEM_BUDGET
