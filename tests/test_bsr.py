"""BSR block-sparse SpMM tests — blocking, MXU kernel, XLA twin.

SpMM (multi-RHS ``Y = A @ X``) extends the reference's SpMV-only surface
(cuda_src/csr_matrix_cuda.cu kernels all take one ``x``); the BSR path
(formats/bsr.py, ops/pallas_bsr.py) is the TPU-native MXU formulation.
Oracle: scipy ``csr_matrix @ X`` in fp64, per the suite convention
(SURVEY §4; src/matrix_generator.py:279).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from sparsematrixvectormultiplication_tpu.formats.bsr import BLOCK, BSRMatrix
from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
from sparsematrixvectormultiplication_tpu.models import synthetic as syn
from sparsematrixvectormultiplication_tpu.ops.pallas_bsr import (
    bsr_spmm_pallas,
    device_put_bsr,
    pad_rhs,
)
from sparsematrixvectormultiplication_tpu.ops.xla import csr_spmm


def _csr_and_scipy(coo):
    csr = CSRMatrix.from_coo(coo)
    s = sp.csr_matrix(
        (coo.val, (coo.row, coo.col)), shape=(coo.nrows, coo.ncols))
    return csr, s


def _rhs(rng, ncols, b):
    return rng.standard_normal((ncols, b))


# ---------------------------------------------------------------------------
# blocking (host)
# ---------------------------------------------------------------------------

def test_bsr_structure_banded():
    coo = syn.banded(700, 9, 40, seed=3)
    csr, s = _csr_and_scipy(coo)
    bsr = BSRMatrix.from_csr(csr)
    assert bsr.n_block_rows == -(-700 // BLOCK)
    assert bsr.nnz == csr.nnz
    # a width-81 band crosses at most 2 block columns per block-row
    assert bsr.kb <= 3
    assert 0 < bsr.fill <= 1
    assert bsr.pad_ratio >= 1
    # pad slots are all-zero tiles: total stored mass == matrix mass
    assert np.isclose(bsr.blocks.astype(np.float64).sum(), csr.values.sum(),
                      rtol=1e-6)


def test_bsr_host_oracle_matches_scipy(rng):
    coo = syn.fem_3d(6, 6, 6, dof=3, seed=1)
    csr, s = _csr_and_scipy(coo)
    bsr = BSRMatrix.from_csr(csr, value_dtype=np.float64)
    X = _rhs(rng, csr.ncols, 7)
    np.testing.assert_allclose(bsr.spmm(X), s @ X, rtol=1e-12, atol=1e-12)


def test_bsr_rejects_scattered_budget():
    coo = syn.random_general(4000, 4000, 0.001, seed=2)
    csr = CSRMatrix.from_coo(coo)
    with pytest.raises(ValueError, match="too .*scattered|budget|SELL"):
        BSRMatrix.from_csr(csr, max_bytes=1 << 20)


def test_bsr_empty_and_tiny():
    empty = CSRMatrix(5, 9, np.zeros(6, np.int64), np.zeros(0, np.int32),
                      np.zeros(0, np.float64))
    bsr = BSRMatrix.from_csr(empty)
    assert bsr.spmm(np.ones((9, 2))).shape == (5, 2)
    assert np.all(bsr.spmm(np.ones((9, 2))) == 0)

    one = CSRMatrix(1, 1, np.array([0, 1], np.int64),
                    np.array([0], np.int32), np.array([2.5]))
    bsr1 = BSRMatrix.from_csr(one)
    np.testing.assert_allclose(bsr1.spmm(np.array([[2.0]])), [[5.0]])


# ---------------------------------------------------------------------------
# Pallas MXU kernel (interpret mode on CPU; conftest forces CPU)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("route", ["blockspec", "dma"])
def test_pallas_bsr_matches_oracle(rng, route):
    coo = syn.banded(500, 7, 30, seed=5)
    csr, s = _csr_and_scipy(coo)
    d = device_put_bsr(BSRMatrix.from_csr(csr))
    X = _rhs(rng, csr.ncols, 9)
    y = np.asarray(bsr_spmm_pallas(d, pad_rhs(X, csr.ncols), interpret=True,
                                   route=route))
    ref = s @ X
    np.testing.assert_allclose(y[:, :9], ref, rtol=2e-5,
                               atol=2e-5 * np.abs(ref).max())
    # pad_rhs widens to a lane multiple; the kernel crops only when handed
    # the raw rhs — also exercise that path (in-jit pad + crop)
    y2 = np.asarray(bsr_spmm_pallas(d, jnp.asarray(X, jnp.float32),
                                    interpret=True, route=route))
    assert y2.shape == (csr.nrows, 9)
    np.testing.assert_allclose(y2, ref, rtol=2e-5,
                               atol=2e-5 * np.abs(ref).max())


@pytest.mark.slow
def test_pallas_bsr_nonmultiple_dims_and_vector_rhs(rng):
    coo = syn.random_general(300, 257, 0.02, seed=6)
    csr, s = _csr_and_scipy(coo)
    d = device_put_bsr(BSRMatrix.from_csr(csr))
    x = rng.standard_normal(257)
    y = np.asarray(bsr_spmm_pallas(d, jnp.asarray(x, jnp.float32),
                                   interpret=True))
    assert y.shape == (300,)
    ref = s @ x
    np.testing.assert_allclose(y, ref, rtol=2e-5,
                               atol=2e-5 * np.abs(ref).max())


@pytest.mark.slow
def test_pallas_bsr_bf16(rng):
    coo = syn.fem_3d(5, 5, 5, dof=3, seed=7)
    csr, s = _csr_and_scipy(coo)
    d = device_put_bsr(BSRMatrix.from_csr(csr), dtype=jnp.bfloat16)
    X = _rhs(rng, csr.ncols, 4)
    y = np.asarray(bsr_spmm_pallas(
        d, pad_rhs(X, csr.ncols, dtype=jnp.bfloat16), interpret=True))
    ref = s @ X
    # bf16 inputs, f32 accumulate: ~8 mantissa bits on the inputs
    np.testing.assert_allclose(y[:, :4], ref, rtol=0.05,
                               atol=0.05 * np.abs(ref).max())


@pytest.mark.slow
def test_pallas_bsr_wide_rhs_chunks(rng):
    """B > _MAX_TB splits into independent pallas_calls per column chunk."""
    coo = syn.banded(260, 5, 12, seed=8)
    csr, s = _csr_and_scipy(coo)
    d = device_put_bsr(BSRMatrix.from_csr(csr))
    X = _rhs(rng, csr.ncols, 520)
    y = np.asarray(bsr_spmm_pallas(d, pad_rhs(X, csr.ncols), interpret=True))
    ref = s @ X
    np.testing.assert_allclose(y[:, :520], ref, rtol=2e-5,
                               atol=2e-5 * np.abs(ref).max())


def test_pallas_bsr_tpu_lowering():
    """Mosaic op-support check without a TPU (memory: trace+lower on CPU)."""
    import jax

    coo = syn.banded(400, 7, 30, seed=9)
    csr = CSRMatrix.from_coo(coo)
    d = device_put_bsr(BSRMatrix.from_csr(csr))
    xp = pad_rhs(np.ones((csr.ncols, 64)), csr.ncols)
    for route in ("blockspec", "dma"):
        lowered = jax.jit(
            lambda dd, xx: bsr_spmm_pallas(dd, xx, route=route)
        ).trace(d, xp).lower(lowering_platforms=("tpu",))
        # lowering itself runs the Mosaic pipeline (unsupported ops raise);
        # the kernel lands as a tpu_custom_call in the stablehlo text
        assert "tpu_custom_call" in lowered.as_text()


# ---------------------------------------------------------------------------
# XLA twin
# ---------------------------------------------------------------------------

def test_csr_spmm_xla_matches_scipy(rng):
    coo = syn.dense_rows_mix(400, seed=10)
    csr, s = _csr_and_scipy(coo)
    X = _rhs(rng, csr.ncols, 6)
    row_ids = np.repeat(np.arange(csr.nrows), np.diff(csr.row_ptr))
    y = np.asarray(csr_spmm(
        jnp.asarray(csr.values), jnp.asarray(csr.col_idx),
        jnp.asarray(row_ids), jnp.asarray(X), nrows=csr.nrows))
    np.testing.assert_allclose(y, s @ X, rtol=1e-10, atol=1e-10)


def test_bsr_sums_duplicate_entries():
    """Duplicate (row,col) coordinates — legal in .mtx files — must SUM
    (oracle/segment-sum semantics), not last-write-win (review finding)."""
    row_ptr = np.array([0, 0, 0, 0, 0, 0, 2], np.int64)  # row 5: two (5,9)s
    csr = CSRMatrix(6, 12, row_ptr, np.array([9, 9], np.int32),
                    np.array([1.0, 2.0]))
    bsr = BSRMatrix.from_csr(csr)
    x = np.zeros(12); x[9] = 1.0
    assert bsr.spmm(x[:, None])[5, 0] == 3.0


def test_bsr_native_matches_numpy():
    """native/fast_bsr.cpp vs the numpy blocker: identical blocks, bcols,
    kb, block counts — incl. duplicate-entry summing and zero block-rows."""
    coo = syn.banded(5000, 9, 40, seed=30)
    csr = CSRMatrix.from_coo(coo)
    # inject an ADJACENT duplicate coordinate (CSR keeps columns sorted,
    # so real duplicates are always adjacent) + an empty block-row tail
    row_ptr = csr.row_ptr.copy()
    ci = np.concatenate([csr.col_idx[:1], csr.col_idx])
    va = np.concatenate([csr.values[:1], csr.values])
    row_ptr[1:] += 1  # row 0's first entry appears twice
    csr2 = CSRMatrix(csr.nrows + 300, csr.ncols,  # 300 empty tail rows
                     np.concatenate([row_ptr, np.full(300, row_ptr[-1])]),
                     ci, va)
    a = BSRMatrix.from_csr(csr2, native=True)
    b = BSRMatrix.from_csr(csr2, native=False)
    assert a.kb == b.kb and a.n_real_blocks == b.n_real_blocks
    np.testing.assert_array_equal(a.block_cols, b.block_cols)
    np.testing.assert_array_equal(a.blocks, b.blocks)
