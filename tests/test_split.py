"""Locality-split layout tests (formats/split.py, ops/pallas_split.py).

The split composite = near-band SELL + natural-order PR far tail — the
road/circuit-regime answer to the reference's thread-per-row CUDA kernel
(cuda_src/csr_matrix_cuda.cu:122-148). The load-bearing invariant is that
the PR part's sigma permutation is the IDENTITY (uniform one-entry rows),
so the two outputs add without any device scatter.
"""

import numpy as np
import pytest

from sparsematrixvectormultiplication_tpu.formats.coo import COOMatrix
from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
from sparsematrixvectormultiplication_tpu.formats.split import (SplitMatrix,
                                                                split_stats)
from sparsematrixvectormultiplication_tpu.models import synthetic as syn


def _band_plus_tail(n=3000, nnz_per_row=4, bandwidth=60, far_frac=0.05,
                    seed=0):
    """Banded matrix with a scattered far tail — the road_like shape."""
    rng = np.random.default_rng(seed)
    coo = syn.banded(n, nnz_per_row, bandwidth, seed=seed)
    row, col, val = [coo.row], [coo.col], [coo.val]
    n_far = int(coo.row.size * far_frac)
    fr = rng.integers(0, n, n_far)
    fc = rng.integers(0, n, n_far)
    row.append(fr.astype(np.int32))
    col.append(fc.astype(np.int32))
    val.append(rng.standard_normal(n_far))
    c = COOMatrix(n, n, np.concatenate(row), np.concatenate(col),
                  np.concatenate(val))
    return CSRMatrix.from_coo(c)


def test_split_auto_threshold_and_oracle():
    csr = _band_plus_tail()
    sm = SplitMatrix.from_csr(csr)
    assert sm.far_frac <= 0.30
    # the whole point: the PR part's sigma is the identity
    assert (sm.far.row_perm == np.arange(csr.nrows)).all()
    x = np.random.default_rng(1).standard_normal(csr.ncols)
    np.testing.assert_allclose(sm.spmv(x), csr.spmv(x), rtol=1e-12,
                               atol=1e-12)


def test_split_conserves_entries():
    csr = _band_plus_tail(seed=3)
    sm = SplitMatrix.from_csr(csr)
    # near nnz + real far entries == original nnz (pads carry value 0)
    near_nnz = sm.near.nnz
    real_far = int(np.count_nonzero(sm.far.val))
    assert near_nnz + real_far == csr.nnz
    # every row contributed at most ONE entry to the PR side
    assert sm.far.nnz == csr.nrows


def test_split_stats_reports_slab_reduction():
    csr = _band_plus_tail(seed=5)
    st_all = split_stats(csr, 1)
    assert st_all["gslabs_near"] < 0.5 * st_all["gslabs_all"]
    assert 0.0 < st_all["far_frac"] < 0.2


def test_split_rejects_zero_locality():
    coo = syn.random_general(1500, 1500, 0.004, seed=2)
    csr = CSRMatrix.from_coo(coo)
    with pytest.raises(ValueError, match="zero-locality|pure-band|no profitable"):
        SplitMatrix.from_csr(csr)


def test_split_pure_band_rejected_or_trivial():
    """A pure banded matrix has no far tail at the smallest threshold —
    auto must refuse (plain SELL owns this regime) rather than build a
    useless all-pad PR problem."""
    coo = syn.banded(2000, 5, 30, seed=7)
    csr = CSRMatrix.from_coo(coo)
    with pytest.raises(ValueError):
        SplitMatrix.from_csr(csr)


def test_split_multi_far_rows_overflow_to_sell():
    """Rows with several far entries keep exactly one on the PR side."""
    n = 1500
    rng = np.random.default_rng(11)
    coo = syn.banded(n, 3, 40, seed=11)
    # give 50 rows four far entries each
    hot = rng.choice(n, 50, replace=False)
    fr = np.repeat(hot, 4).astype(np.int32)
    fc = rng.integers(0, n, fr.size).astype(np.int32)
    c = COOMatrix(n, n, np.concatenate([coo.row, fr]),
                  np.concatenate([coo.col, fc]),
                  np.concatenate([coo.val, rng.standard_normal(fr.size)]))
    csr = CSRMatrix.from_coo(c)
    sm = SplitMatrix.from_csr(csr, slab_dist=1)
    x = rng.standard_normal(n)
    np.testing.assert_allclose(sm.spmv(x), csr.spmv(x), rtol=1e-12,
                               atol=1e-12)


def test_split_far_panels_natural_order_and_oracle():
    """far_target_rows below one problem's need forces PanelPRMatrix on
    the far side; uniform k=1 keeps the concatenated panel output in
    NATURAL row order (row_perm == arange), so the composite still adds
    without a scatter. Host oracle must match exactly."""
    from sparsematrixvectormultiplication_tpu.formats.pr import PanelPRMatrix

    csr = _band_plus_tail(n=6000, seed=17)
    sm = SplitMatrix.from_csr(csr, far_target_rows=32)
    assert isinstance(sm.far, PanelPRMatrix)
    assert len(sm.far.panels) >= 2
    assert (sm.far.row_perm == np.arange(csr.nrows)).all()
    x = np.random.default_rng(2).standard_normal(csr.ncols)
    np.testing.assert_allclose(sm.spmv(x), csr.spmv(x), rtol=1e-12,
                               atol=1e-12)


@pytest.mark.slow
def test_split_far_panels_kernel_interpret():
    """f32 composite with a paneled far side (interpret mode)."""
    import jax.numpy as jnp

    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        device_put_x)
    from sparsematrixvectormultiplication_tpu.ops.pallas_split import (
        device_put_split, split_spmv_pallas)

    csr = _band_plus_tail(n=6000, seed=19)
    sm = SplitMatrix.from_csr(csr, far_target_rows=32)
    assert len(getattr(sm.far, "panels", ())) >= 2
    x = np.random.default_rng(3).standard_normal(csr.ncols)
    ds = device_put_split(sm, dtype=jnp.float32)
    y = np.asarray(split_spmv_pallas(
        ds, device_put_x(x, csr.ncols), interpret=True), np.float64)
    y_ref = csr.spmv(x)
    rel = np.abs(y - y_ref) / np.maximum(1.0, np.abs(y_ref))
    assert rel.max() < 1e-5, f"max rel {rel.max():.2e}"


@pytest.mark.slow
def test_split_dd_far_panels_interpret():
    """dd upload must ACCEPT a paneled far side (the r3 guard refused
    whole problems over 2^14 Beneš rows; panels are the fix) and keep
    fp64-class accuracy."""
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        device_put_x)
    from sparsematrixvectormultiplication_tpu.ops.pallas_split import (
        device_put_split_dd, split_spmv_pallas_dd)

    csr = _band_plus_tail(n=6000, seed=23)
    sm = SplitMatrix.from_csr(csr, far_target_rows=32)
    assert len(getattr(sm.far, "panels", ())) >= 2
    x = np.random.default_rng(5).standard_normal(csr.ncols)
    xh = np.asarray(x, np.float32)
    xl = np.asarray(x - xh.astype(np.float64), np.float32)
    ds = device_put_split_dd(sm)
    yh, yl = split_spmv_pallas_dd(
        ds, device_put_x(xh, csr.ncols), device_put_x(xl, csr.ncols),
        interpret=True)
    y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    ref = csr.spmv(x)
    rel = np.abs(y - ref) / np.maximum(1.0, np.abs(ref))
    assert rel.max() < 1e-11, f"max rel {rel.max():.2e}"


@pytest.mark.slow
def test_split_kernel_interpret_matches_oracle():
    import jax.numpy as jnp

    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        device_put_x)
    from sparsematrixvectormultiplication_tpu.ops.pallas_split import (
        device_put_split, split_spmv_pallas)

    # n must give enough x-slabs that the far tail dominates gslabs_all
    # (at n=2048 there are only 16 slabs and auto correctly refuses)
    csr = _band_plus_tail(n=6000, seed=9)
    sm = SplitMatrix.from_csr(csr)
    x = np.random.default_rng(4).standard_normal(csr.ncols)
    ds = device_put_split(sm, dtype=jnp.float32)
    y = np.asarray(split_spmv_pallas(
        ds, device_put_x(x, csr.ncols), interpret=True), np.float64)
    y_ref = csr.spmv(x)
    rel = np.abs(y - y_ref) / np.maximum(1.0, np.abs(y_ref))
    assert rel.max() < 1e-5, f"max rel {rel.max():.2e}"


@pytest.mark.slow
def test_split_kernel_road_network_interpret():
    """The real target shape: grid road network with long-range links."""
    import jax.numpy as jnp

    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        device_put_x)
    from sparsematrixvectormultiplication_tpu.ops.pallas_split import (
        device_put_split, split_spmv_pallas)

    coo = syn.road_network(6000, seed=1)
    csr = CSRMatrix.from_coo(coo)
    sm = SplitMatrix.from_csr(csr)
    x = np.random.default_rng(6).standard_normal(csr.ncols)
    ds = device_put_split(sm, dtype=jnp.float32)
    y = np.asarray(split_spmv_pallas(
        ds, device_put_x(x, csr.ncols), interpret=True), np.float64)
    y_ref = csr.spmv(x)
    rel = np.abs(y - y_ref) / np.maximum(1.0, np.abs(y_ref))
    assert rel.max() < 1e-5, f"max rel {rel.max():.2e}"


@pytest.mark.slow
def test_split_dd_kernel_interpret_fp64_class():
    """dd composite: both halves' (hi, lo) planes renormalized with an
    error-free add — fp64-class accuracy (~1e-13) on the band+tail shape."""
    import jax.numpy as jnp

    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        device_put_x)
    from sparsematrixvectormultiplication_tpu.ops.pallas_split import (
        device_put_split_dd, split_spmv_pallas_dd)

    csr = _band_plus_tail(n=6000, seed=13)
    sm = SplitMatrix.from_csr(csr)
    x = np.random.default_rng(8).standard_normal(csr.ncols)
    xh = np.asarray(x, np.float32)
    xl = np.asarray(x - xh.astype(np.float64), np.float32)
    ds = device_put_split_dd(sm)
    yh, yl = split_spmv_pallas_dd(
        ds, device_put_x(xh, csr.ncols), device_put_x(xl, csr.ncols),
        interpret=True)
    y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    ref = csr.spmv(x)
    rel = np.abs(y - ref) / np.maximum(1.0, np.abs(ref))
    assert rel.max() < 1e-11, f"max rel {rel.max():.2e}"
