"""Double-double arithmetic + DD Pallas kernel accuracy tests.

The DD path must validate far below the 1e-9 bar (BASELINE.json) where the
plain f32 kernels sit around 1e-7."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparsematrixvectormultiplication_tpu import CSRMatrix, SellMatrix
from sparsematrixvectormultiplication_tpu.ops.doubledouble import (
    combine_f64,
    dd_add_dd,
    dd_mul_dd,
    split_f64,
    two_prod,
    two_sum,
)
from sparsematrixvectormultiplication_tpu.ops.pallas_sell_dd import (
    device_put_sell_dd,
    sell_spmv_dd_f64,
    sell_spmv_pallas_dd,
)


pytestmark = pytest.mark.slow


def test_split_combine_roundtrip(rng):
    x = rng.standard_normal(1000) * np.exp(rng.uniform(-20, 20, 1000))
    hi, lo = split_f64(x)
    back = hi.astype(np.float64) + lo.astype(np.float64)
    # pair precision ~2^-48 relative
    assert np.max(np.abs(back - x) / np.abs(x)) < 2**-45


def test_two_sum_exact(rng):
    a = jnp.asarray(rng.standard_normal(512), jnp.float32)
    b = jnp.asarray(rng.standard_normal(512) * 1e-6, jnp.float32)
    s, e = two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    assert np.array_equal(got, exact)  # error-free by construction


def test_two_prod_exact(rng):
    a = jnp.asarray(rng.standard_normal(512), jnp.float32)
    b = jnp.asarray(rng.standard_normal(512), jnp.float32)
    p, e = two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    assert np.array_equal(got, exact)


def test_dd_dot_product_accuracy(rng):
    """DD accumulation of an ill-conditioned dot product."""
    n = 4096
    a64 = rng.standard_normal(n)
    b64 = rng.standard_normal(n)
    ah, al = (jnp.asarray(v) for v in split_f64(a64))
    bh, bl = (jnp.asarray(v) for v in split_f64(b64))
    sh = jnp.zeros((), jnp.float32)
    sl = jnp.zeros((), jnp.float32)
    ph, pl = dd_mul_dd(ah, al, bh, bl)
    # sequential dd reduction
    import jax

    def body(i, carry):
        h, l = carry
        return dd_add_dd(h, l, ph[i], pl[i])

    h, l = jax.lax.fori_loop(0, n, body, (sh, sl))
    got = float(h) + float(l)
    exact = float(a64 @ b64)
    assert abs(got - exact) / abs(exact) < 1e-12


@pytest.fixture
def problem(make_random_coo):
    coo, s = make_random_coo(3000, 2500, 0.01)
    x = np.random.default_rng(7).standard_normal(2500)
    return coo, s, x


def test_dd_kernel_interpret_accuracy(problem):
    coo, s, x = problem
    sell = SellMatrix.from_coo(coo)
    dsell = device_put_sell_dd(sell)
    y = np.asarray(sell_spmv_dd_f64(dsell, jnp.asarray(x), interpret=True))
    y_ref = s.tocsr() @ x
    nz = y_ref != 0
    rel = np.abs(y - y_ref)[nz] / np.abs(y_ref[nz])
    # fp64-class: far below the 1e-9 bar (cancellation-tiny outputs can push
    # pure relative error to ~1e-11; norm-scaled error stays ~1e-14)
    assert np.max(rel) < 1e-10
    assert np.max(np.abs(y - y_ref)) / np.linalg.norm(y_ref, np.inf) < 1e-13


def test_dd_kernel_both_layouts(make_random_coo):
    # banded -> sb-major; scattered -> k-major
    import scipy.sparse as sp

    from sparsematrixvectormultiplication_tpu import COOMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import banded, power_law

    for coo in [banded(3000, 12, 200, seed=1), power_law(3000, 4, seed=2)]:
        s = sp.coo_matrix((coo.val, (coo.row, coo.col)), shape=coo.shape).tocsr()
        sell = SellMatrix.from_coo(coo)
        x = np.random.default_rng(0).standard_normal(coo.ncols)
        dsell = device_put_sell_dd(sell)
        y = np.asarray(sell_spmv_dd_f64(dsell, jnp.asarray(x), interpret=True))
        y_ref = s @ x
        nz = y_ref != 0
        rel = np.abs(y - y_ref)[nz] / np.abs(y_ref[nz])
        # interpret mode partially folds EFTs even with rolled loops
        # (~1e-10-grade); Mosaic-compiled TPU runs hold ~1e-13 (RESULTS.md)
        assert np.max(rel) < 1e-9, sell.memory_stats()["bin_layouts"]


def test_dd_beats_f32(problem):
    """DD must be orders of magnitude more accurate than the f32 kernel."""
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        device_put_sell,
        sell_spmv_pallas,
    )

    coo, s, x = problem
    sell = SellMatrix.from_coo(coo)
    y_ref = s.tocsr() @ x
    nz = y_ref != 0

    y32 = np.asarray(sell_spmv_pallas(
        device_put_sell(sell, dtype=jnp.float32), jnp.asarray(x, jnp.float32),
        interpret=True))
    ydd = np.asarray(sell_spmv_dd_f64(
        device_put_sell_dd(sell), jnp.asarray(x), interpret=True))
    err32 = np.max(np.abs(y32 - y_ref)[nz] / np.abs(y_ref[nz]))
    errdd = np.max(np.abs(ydd - y_ref)[nz] / np.abs(y_ref[nz]))
    assert errdd < err32 * 1e-3


def test_dd_resident_noncontiguous_bins(rng):
    """Regression: device_put_sell_dd pads non-contiguous k-major bins for
    resident-y mode (gid = -1 padding groups); _bin_call_dd must dispatch
    the resident kernel + whole-buffer out specs, or the padding groups'
    zero tiles land on a real group's output through the revolving out_map
    (silent corruption, caught by review in r3)."""
    ngrp, n = 8, 8 * 1024
    indptr = np.zeros(n + 1, np.int64)
    # groups of 1024 rows alternate 1 / 12 nnz per row -> the k=1 bin's
    # group_ids are [0, 2, 4, 6]: non-contiguous, ng >= 4 -> resident mode
    row_nnz = np.where((np.arange(n) // 1024) % 2 == 0, 1, 12)
    indptr[1:] = np.cumsum(row_nnz)
    nnz = int(indptr[-1])
    indices = rng.integers(0, n, nnz)
    # column-sort within rows (CSRMatrix invariant)
    for r in range(n):
        s, e = indptr[r], indptr[r + 1]
        indices[s:e] = np.sort(indices[s:e])
    csr = CSRMatrix(n, n, indptr, indices.astype(np.int64),
                    rng.standard_normal(nnz))
    x = rng.standard_normal(n)
    y_ref = csr.spmv(x)

    sell = SellMatrix.from_csr(csr, layout="k-major", merge_bins=False,
                               sg_slots=False)
    d = device_put_sell_dd(sell)
    assert any(b.resident_g_per > 1 for b in d.bins), \
        "construction no longer triggers resident mode; rebuild the case"
    y = np.asarray(sell_spmv_dd_f64(d, jnp.asarray(x), interpret=True))
    rel = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-10)
    assert rel.max() < 1e-11, f"dd resident max rel {rel.max():.2e}"
