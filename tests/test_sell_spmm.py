"""Multi-RHS SELL SpMM (ops/pallas_sell_spmm.py): stream A once, serve R
right-hand sides. The reference has no SpMM surface at all (its kernels
are single-vector SpMV, cuda_src/csr_matrix_cuda.cu) — this is the
TPU-first extension feeding block solvers (solvers/cg.py cg_multi).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sparsematrixvectormultiplication_tpu.models import synthetic as syn
from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
from sparsematrixvectormultiplication_tpu.formats.sell import SellMatrix
from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
    device_put_sell,
)
from sparsematrixvectormultiplication_tpu.ops.pallas_sell_spmm import (
    MAX_RHS,
    device_put_x_multi,
    pack_x_multi,
    sell_spmm_pallas,
)


def _run(csr, sell, X, dtype=jnp.float32):
    d = device_put_sell(sell, dtype=dtype, resident=False)
    xt = device_put_x_multi(X, csr.ncols, jnp.float32)
    return np.asarray(sell_spmm_pallas(d, xt, interpret=True), np.float64)


def _oracle(csr, sell, X):
    Y = np.column_stack([csr.spmv(X[:, j]) for j in range(X.shape[1])])
    perm = getattr(sell, "row_perm", None)
    return Y if perm is None else Y[perm]


@pytest.mark.parametrize("r", [1, 8, 16])
def test_spmm_banded_matches_oracle(r):
    csr = CSRMatrix.from_coo(syn.banded(3000, 9, 30, seed=1))
    sell = SellMatrix.from_csr(csr, layout="k-major")
    X = np.random.default_rng(0).standard_normal((csr.ncols, r))
    Y = _run(csr, sell, X)
    Yref = _oracle(csr, sell, X)
    rel = np.abs(Y - Yref) / np.maximum(np.abs(Yref), 1.0)
    assert Y.shape == (csr.nrows, r)
    assert rel.max() < 1e-5, rel.max()


def test_spmm_each_column_equals_spmv():
    """Column j of the SpMM must equal the SpMV kernel on X[:, j] exactly
    (same bins, same accumulation order, same dtype)."""
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        device_put_x,
        sell_spmv_pallas,
    )

    csr = CSRMatrix.from_coo(syn.banded(2000, 9, 30, seed=2))
    sell = SellMatrix.from_csr(csr, layout="k-major")
    X = np.random.default_rng(1).standard_normal((csr.ncols, 4))
    Y = _run(csr, sell, X)
    d = device_put_sell(sell, dtype=jnp.float32)
    for j in range(4):
        xj = device_put_x(X[:, j], csr.ncols, jnp.float32)
        yj = np.asarray(sell_spmv_pallas(d, xj, interpret=True), np.float64)
        np.testing.assert_array_equal(Y[:, j], yj[:csr.nrows])


def test_spmm_rolled_reduction_big_k():
    """Power-law heads produce K>64 bins: the rolled scratch reduction."""
    csr = CSRMatrix.from_coo(syn.power_law(3000, 12, 2.3, seed=5))
    sell = SellMatrix.from_csr(csr, layout="k-major")
    assert any(b.k > 64 for b in sell.bins)  # the path under test
    X = np.random.default_rng(2).standard_normal((csr.ncols, 8))
    Y = _run(csr, sell, X)
    Yref = _oracle(csr, sell, X)
    rel = np.abs(Y - Yref) / np.maximum(np.abs(Yref), 1.0)
    assert rel.max() < 1e-4, rel.max()


def test_spmm_bf16_values():
    csr = CSRMatrix.from_coo(syn.banded(2000, 9, 30, seed=3))
    sell = SellMatrix.from_csr(csr, layout="k-major")
    X = np.random.default_rng(3).standard_normal((csr.ncols, 8))
    Y = _run(csr, sell, X, dtype=jnp.bfloat16)
    Yref = _oracle(csr, sell, X)
    rel = np.abs(Y - Yref) / np.maximum(np.abs(Yref), 1.0)
    assert rel.max() < 6e-2, rel.max()


def test_spmm_guards():
    csr = CSRMatrix.from_coo(syn.banded(500, 5, 10, seed=0))
    with pytest.raises(ValueError, match="MAX_RHS"):
        pack_x_multi(np.ones((csr.ncols, MAX_RHS + 1)), csr.ncols)
    sell_sb = SellMatrix.from_csr(csr, layout="sb-major")
    d = device_put_sell(sell_sb, dtype=jnp.float32)
    xt = device_put_x_multi(np.ones((csr.ncols, 2)), csr.ncols)
    with pytest.raises(NotImplementedError, match="k-major"):
        sell_spmm_pallas(d, xt, interpret=True)


def test_spmm_feeds_cg_multi():
    """cg_multi over the SpMM matmat converges on an SPD system — the
    block-solver integration the kernel exists for."""
    from sparsematrixvectormultiplication_tpu.solvers.cg import cg_multi

    n = 1024
    # SPD: tridiagonal Laplacian + 4I
    rows = np.repeat(np.arange(n), 3)[1:-1]
    cols = (rows + np.tile([-1, 0, 1], n)[1:-1]).clip(0, n - 1)
    vals = np.tile([-1.0, 6.0, -1.0], n)[1:-1]
    keep = (cols >= 0) & (cols < n)
    from sparsematrixvectormultiplication_tpu.formats.coo import COOMatrix

    coo = COOMatrix(n, n, rows[keep].astype(np.int64),
                    cols[keep].astype(np.int64), vals[keep])
    csr = CSRMatrix.from_coo(coo)
    sell = SellMatrix.from_csr(csr, layout="k-major")
    assert getattr(sell, "row_perm", None) is None
    d = device_put_sell(sell, dtype=jnp.float32, resident=False)

    def matmat(V):
        return sell_spmm_pallas(d, jnp.asarray(V, jnp.float32),
                                interpret=True)[:n]

    B = np.random.default_rng(4).standard_normal((n, 4))
    X, iters, resnorms = cg_multi(matmat, jnp.asarray(B, jnp.float32),
                                  tol=1e-5, maxiter=400)
    R = B - np.column_stack([csr.spmv(np.asarray(X, np.float64)[:, j])
                             for j in range(4)])
    assert np.linalg.norm(R) / np.linalg.norm(B) < 1e-4


def test_spmm_harness_stage():
    """The pallas_sell_spmm bench stage runs and validates (sampled)."""
    from sparsematrixvectormultiplication_tpu.bench.harness import (
        BenchConfig,
        run_matrix,
    )

    coo = syn.banded(1200, 8, 64, seed=0)
    cfg = BenchConfig(
        iterations=2, rounds=1, skip=1, sell_spmm_rhs=8,
        kernels=("serial_csr", "pallas_sell_spmm"),
        flush_between_stages=False,
    )
    res = run_matrix("spmm_banded", coo, cfg, log=lambda *a, **k: None)
    assert "pallas_sell_spmm" in res.stages
    st = res.stages["pallas_sell_spmm"]
    assert st.diff.significant_diffs == 0
    assert st.extra["rhs"] == 8


def test_spmm_rejects_resident_padded_bins():
    """Regression (code review, reproduced): _resident_pad appends gid=-1
    sentinel groups that only the resident SpMV kernels predicate off; fed
    to the SpMM kernel they would write tiles through output block index
    -1 and silently corrupt real rows. The SpMM path must refuse resident
    uploads and accept resident=False ones."""
    from sparsematrixvectormultiplication_tpu.formats.coo import COOMatrix

    # bimodal row densities in ALTERNATING 1024-row groups -> two k-major
    # bins with non-contiguous group lists -> resident padding kicks in
    rng = np.random.default_rng(0)
    n = 16 * 1024
    light = np.arange(n)[(np.arange(n) // 1024) % 2 == 0]
    heavy = np.arange(n)[(np.arange(n) // 1024) % 2 == 1]
    rows = np.concatenate([np.repeat(light, 2), np.repeat(heavy, 180)])
    cols = rng.integers(0, n, rows.size)
    coo = COOMatrix(n, n, rows.astype(np.int64), cols.astype(np.int64),
                    rng.standard_normal(rows.size))
    csr = CSRMatrix.from_coo(coo)
    sell = SellMatrix.from_csr(csr, layout="k-major")
    d_res = device_put_sell(sell, dtype=jnp.float32)  # resident padding on
    assert any(getattr(b, "resident_g_per", 0) > 1 for b in d_res.bins), \
        "fixture no longer triggers resident padding"
    X = rng.standard_normal((n, 2))
    xt = device_put_x_multi(X, n, jnp.float32)
    with pytest.raises(NotImplementedError, match="resident"):
        sell_spmm_pallas(d_res, xt, interpret=True)
    # the documented escape hatch computes correctly
    d_flat = device_put_sell(sell, dtype=jnp.float32, resident=False)
    Y = np.asarray(sell_spmm_pallas(d_flat, xt, interpret=True), np.float64)
    Yref = _oracle(csr, sell, X)
    rel = np.abs(Y - Yref) / np.maximum(np.abs(Yref), 1.0)
    assert rel.max() < 1e-4, rel.max()


@pytest.mark.slow
def test_spmm_wl_layout():
    """wl (window-layered) SpMM: per-window W tables built once per RHS,
    each layer tile's m/vals load amortized over R gathers. slow: the
    R-unrolled gather pipeline interprets elementwise (~1 min)."""
    csr = CSRMatrix.from_coo(syn.banded(2048, 18, 40, seed=2))
    sell = SellMatrix.from_csr(csr, layout="wl")
    assert all(b.layout == "wl" for b in sell.bins)
    X = np.random.default_rng(5).standard_normal((csr.ncols, 4))
    Y = _run(csr, sell, X)
    Yref = _oracle(csr, sell, X)
    rel = np.abs(Y - Yref) / np.maximum(np.abs(Yref), 1.0)
    assert rel.max() < 1e-5, rel.max()


def test_spmm_column_panels():
    """Panel SpMM: X beyond the stacked-table VMEM budget splits into
    column panels; accumulation across panels matches the oracle."""
    from sparsematrixvectormultiplication_tpu.formats.sell import (
        PanelSellMatrix,
    )

    csr = CSRMatrix.from_coo(syn.banded(3000, 9, 400, seed=7))
    psell = PanelSellMatrix.from_csr(csr, max_panel_cols=1024,
                                     layout="k-major")
    assert len(psell.panels) >= 3
    d = device_put_sell(psell, dtype=jnp.float32, resident=False)
    X = np.random.default_rng(6).standard_normal((csr.ncols, 4))
    Y = np.asarray(sell_spmm_pallas(d, jnp.asarray(X, jnp.float32),
                                    interpret=True), np.float64)
    Yref = np.column_stack([csr.spmv(X[:, j]) for j in range(4)])
    perm = getattr(psell, "row_perm", None)
    if perm is not None:
        Yref = Yref[perm]
    rel = np.abs(Y - Yref) / np.maximum(np.abs(Yref), 1.0)
    assert Y.shape == (csr.nrows, 4)
    assert rel.max() < 1e-5, rel.max()
