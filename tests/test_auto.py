"""Automatic format selection (ops/auto.py): the one-call user surface.

choose_format must route each measured regime to the layout that won it
in the round-3 benchmarks, and auto_device_op's matvec must validate
against the fp64 oracle whichever path it takes.
"""

import numpy as np
import pytest

from sparsematrixvectormultiplication_tpu.formats.coo import COOMatrix
from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
from sparsematrixvectormultiplication_tpu.models import synthetic as syn
from sparsematrixvectormultiplication_tpu.ops.auto import (auto_device_op,
                                                           choose_format)


def _band_tail(n=6000, seed=0):
    rng = np.random.default_rng(seed)
    coo = syn.banded(n, 4, 60, seed=seed)
    nf = coo.row.size // 20
    return CSRMatrix.from_coo(COOMatrix(
        n, n,
        np.concatenate([coo.row, rng.integers(0, n, nf).astype(np.int32)]),
        np.concatenate([coo.col, rng.integers(0, n, nf).astype(np.int32)]),
        np.concatenate([coo.val, rng.standard_normal(nf)])))


def test_choose_format_banded_is_sell():
    csr = CSRMatrix.from_coo(syn.banded(4000, 9, 60, seed=1))
    kind, stats = choose_format(csr)
    assert kind == "sell", stats


def test_choose_format_band_tail_is_split():
    kind, stats = choose_format(_band_tail())
    assert kind == "split", stats


def test_choose_format_uniform_random_is_pr():
    # needs enough columns that the per-group distinct-slab count is the
    # dominant cost; at toy sizes (24 slabs total) SELL is genuinely right
    # and the chooser must say so (see test_choose_format_banded_is_sell)
    csr = CSRMatrix.from_coo(syn.random_general(40000, 40000, 0.0002, seed=2))
    kind, stats = choose_format(csr)
    assert kind == "pr", stats


@pytest.mark.slow
@pytest.mark.parametrize("builder,expect", [
    (lambda: CSRMatrix.from_coo(syn.banded(3000, 9, 60, seed=3)), "sell"),
    (_band_tail, "split"),
    (lambda: CSRMatrix.from_coo(
        syn.random_general(40000, 40000, 0.0002, seed=4)), "pr"),
])
def test_auto_device_op_validates(builder, expect):
    csr = builder()
    op = auto_device_op(csr)
    assert op.kind == expect
    x = np.random.default_rng(5).standard_normal(csr.ncols)
    y = op.matvec(x)
    ref = csr.spmv(x)
    rel = np.abs(y - ref) / np.maximum(1.0, np.abs(ref))
    assert rel.max() < 1e-5, f"{op.kind}: max rel {rel.max():.2e}"


@pytest.mark.slow
def test_auto_device_op_dense_rows_heavy_split():
    """Dense rows route to PR via the strided heavy-row split + host
    segment reduction (the harness recipe, automated)."""
    rng = np.random.default_rng(7)
    n = 30000
    coo = syn.random_general(n, n, 0.0002, seed=7)
    # rows dense enough that k*8 dest rows blow the Benes cap and
    # pr_from_csr raises its actionable error
    hot = rng.choice(n, 4, replace=False)
    fr = np.repeat(hot, 12000).astype(np.int32)
    fc = rng.integers(0, n, fr.size).astype(np.int32)
    c = COOMatrix(n, n, np.concatenate([coo.row, fr]),
                  np.concatenate([coo.col, fc]),
                  np.concatenate([coo.val, rng.standard_normal(fr.size)]))
    csr = CSRMatrix.from_coo(c).sum_duplicates() \
        if hasattr(CSRMatrix, "sum_duplicates") else CSRMatrix.from_coo(
            c.sum_duplicates())
    op = auto_device_op(csr)
    assert op.kind == "pr" and op.seg_ids is not None
    x = rng.standard_normal(n)
    y = op.matvec(x)
    ref = csr.spmv(x)
    rel = np.abs(y - ref) / np.maximum(1.0, np.abs(ref))
    assert rel.max() < 1e-5, f"max rel {rel.max():.2e}"
