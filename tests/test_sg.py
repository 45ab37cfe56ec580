"""SG layout tests — the scattered/short-row kernel family (formats/sg.py,
ops/pallas_sell.py _kernel_sg, ops/pallas_sell_dd.py _kernel_sg_dd).

The SG layout is the TPU answer to the reference's thread-per-row CUDA
kernel (cuda_src/csr_matrix_cuda.cu:122-148): entries pack into
shared-window tiles at free sublane slots of their lane (f32; a per-tile
sigma-reduction lands products on their row) or at row-unique positions
(dd; error-free transforms need exact selection), and isolated entries
shed into K-binned accumulate k-major "far" bins. Every test is a
differential against scipy / the host fp64 oracle (SURVEY §4 strategy).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from sparsematrixvectormultiplication_tpu.formats.coo import COOMatrix
from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
from sparsematrixvectormultiplication_tpu.formats.sell import SellMatrix
from sparsematrixvectormultiplication_tpu.formats.sg import (
    SG_DYNAMIC,
    _pack_round,
    sg_profile,
)
from sparsematrixvectormultiplication_tpu.models.synthetic import (
    power_law,
    random_general,
    road_network,
)
from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
    device_put_sell,
    sell_spmv_pallas,
)


def _scipy_ref(csr, x):
    return sp.csr_matrix(
        (csr.values, csr.col_idx, csr.row_ptr), shape=(csr.nrows, csr.ncols)
    ) @ x


def _run(csrk, seg, x, nrows, **sell_kw):
    sell = SellMatrix.from_csr(csrk, **sell_kw)
    d = device_put_sell(sell, dtype=jnp.float32)
    y = np.asarray(
        sell_spmv_pallas(d, jnp.asarray(x, jnp.float32), interpret=True),
        np.float64,
    )
    y = sell.unpermute(y)
    if seg is not None:
        y = np.bincount(seg, weights=y, minlength=nrows)[:nrows]
    return y[:nrows], sell


# ---------------------------------------------------------------------------
# host-side assignment invariants
# ---------------------------------------------------------------------------


def test_pack_round_position_invariants(rng):
    # CSR-order rows (sorted), columns sorted within each row
    rows = np.sort(rng.integers(0, 2048, size=5000)).astype(np.int64)
    cols = rng.integers(0, 4096, size=5000).astype(np.int64)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    ng = -(-2048 // 1024)
    # rows mode (dd): one entry per (row, tile) — EFT-exact selection
    t, pos = _pack_round(rows, cols, ng, slots=False)
    assert np.unique(rows * (t.max() + 1) + t).size == t.size
    assert np.array_equal(pos, (rows >> 7) & 7)
    # slots mode (f32): one entry per (tile, pos, lane); lane capacity 8
    t, pos = _pack_round(rows, cols, ng, slots=True)
    lane = rows & 127
    g = rows >> 10
    key = ((g * (t.max() + 1) + t) * 8 + pos) * 128 + lane
    assert np.unique(key).size == key.size
    assert pos.max() < 8 and pos.min() >= 0


def test_sg_profile_geometry(rng):
    coo = random_general(4096, 4096, 1e-3, seed=3)
    csr = CSRMatrix.from_coo(coo)
    num_groups = -(-csr.nrows // 1024)
    R = -(-csr.ncols // 128)
    Rp = (R // 8 + 1) * 8
    prof = sg_profile(csr.row_ids().astype(np.int64), csr.col_idx, csr.values,
                      num_groups, Rp)
    # every entry accounted for exactly once
    assert prof.e_md.size + prof.far_rows.size == csr.nnz
    # shared windows stay inside the x table (8-row chunked reads)
    t = prof.e_flatrow // 8
    w0 = prof.w0[prof.e_group, t].astype(np.int64)
    doff = prof.e_md.astype(np.int64) >> 10
    assert (w0 + doff).max() < Rp
    scan8 = -(-prof.passes.astype(np.int64) // 8) * 8
    assert (prof.w0.astype(np.int64) + scan8).max() <= Rp
    # pass counts cover every entry's window offset
    assert np.all(doff < prof.passes[prof.e_group, t])
    # no two entries share a (group, tile, slot, lane) position
    key = (prof.e_group * prof.t_max + t) * 1024 \
        + (prof.e_flatrow % 8) * 128 + prof.e_lane
    assert np.unique(key).size == key.size
    # md's sigma bits must round-trip the destination row's sigma
    # (sg_profile is called on unsplit CSR rows here)
    # -- decoded columns must reproduce the matrix exactly
    cols_rec = (w0 + doff) * 128 + (prof.e_md & 127)
    import scipy.sparse as _sp

    a = _sp.coo_matrix(
        (np.concatenate([prof.e_val, prof.far_vals]),
         (np.concatenate([
             prof.e_group * 1024 + ((prof.e_md >> 7) & 7) * 128 + prof.e_lane,
             prof.far_rows.astype(np.int64)]),
          np.concatenate([cols_rec, prof.far_cols.astype(np.int64)]))),
        shape=(num_groups * 1024, Rp * 128),
    ).tocsr()
    b = _sp.csr_matrix(
        (csr.values, csr.col_idx, csr.row_ptr),
        shape=(csr.nrows, csr.ncols),
    )
    b.resize(num_groups * 1024, Rp * 128)
    assert abs(a - b).sum() == 0.0


# ---------------------------------------------------------------------------
# converter + oracle differentials
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sigma", [False, True])
def test_sg_oracle_matches_scipy(rng, sigma):
    coo = road_network(20_000, seed=5)
    csr = CSRMatrix.from_coo(coo)
    x = rng.standard_normal(coo.ncols)
    y_ref = _scipy_ref(csr, x)
    sell = SellMatrix.from_csr(csr, layout="sg", sigma_sort=sigma)
    y = sell.unpermute(sell.spmv(x))
    assert np.allclose(y, y_ref, rtol=1e-9, atol=1e-11)
    layouts = set(b.layout for b in sell.bins)
    assert "sg" in layouts
    # far remainder bins accumulate (road has ~5% long links)
    assert any(b.add_into for b in sell.bins)


def test_sg_cost_model_picks_sg_on_scattered(rng):
    coo = random_general(20_000, 20_000, 2.5e-4, seed=8)
    csr = CSRMatrix.from_coo(coo)
    sell = SellMatrix.from_csr(csr, layout="auto")
    assert any(b.layout == "sg" for b in sell.bins), \
        "auto cost model should route uniform-random groups to sg"
    x = rng.standard_normal(coo.ncols)
    assert np.allclose(sell.spmv(x), _scipy_ref(csr, x), rtol=1e-9, atol=1e-11)


# ---------------------------------------------------------------------------
# kernel differentials (interpret mode)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name,builder", [
    ("road", lambda: road_network(8000, seed=5)),
    pytest.param("powerlaw", lambda: power_law(8000, 3, seed=6),
                 marks=pytest.mark.slow),
    pytest.param("uniform", lambda: random_general(6000, 6000, 8e-4, seed=8),
                 marks=pytest.mark.slow),
])
def test_sg_kernel_matches_scipy(rng, name, builder):
    coo = builder()
    csr = CSRMatrix.from_coo(coo)
    csrk, seg = csr.split_heavy_rows(256)
    x = rng.standard_normal(coo.ncols)
    y_ref = _scipy_ref(csr, x)
    y, sell = _run(csrk, seg, x, coo.nrows, layout="sg")
    rel = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-6)
    assert rel.max() < 5e-4, f"{name}: max rel {rel.max():.2e}"
    # static and dynamic kernels both exercised across the corpus
    spans = set(b.span for b in sell.bins if b.layout == "sg")
    assert spans, "no sg bins emitted"


@pytest.mark.slow
def test_sg_kernel_sum_assembly(rng):
    coo = road_network(8000, seed=5)
    csr = CSRMatrix.from_coo(coo)
    x = rng.standard_normal(coo.ncols)
    sell = SellMatrix.from_csr(csr, layout="sg")
    d = device_put_sell(sell, dtype=jnp.float32)
    xd = jnp.asarray(x, jnp.float32)
    y_chain = np.asarray(sell_spmv_pallas(d, xd, interpret=True))
    y_sum = np.asarray(sell_spmv_pallas(d, xd, interpret=True, assembly="sum"))
    # identical bins, identical f32 arithmetic -> exact equality
    np.testing.assert_array_equal(y_chain, y_sum)


@pytest.mark.slow
def test_sg_kernel_dd_matches_fp64(rng):
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell_dd import (
        device_put_sell_dd,
        sell_spmv_pallas_dd,
    )

    coo = power_law(6000, 3, seed=6)
    csr = CSRMatrix.from_coo(coo)
    csrk, seg = csr.split_heavy_rows(256)
    x = rng.standard_normal(coo.ncols)
    y_ref = _scipy_ref(csr, x)
    # dd needs row-unique positions (EFTs sum one product per position)
    sell = SellMatrix.from_csr(csrk, layout="sg", sg_slots=False)
    d = device_put_sell_dd(sell)
    xh = np.asarray(x, np.float32)
    xl = np.asarray(x - xh.astype(np.float64), np.float32)
    yh, yl = sell_spmv_pallas_dd(d, jnp.asarray(xh), jnp.asarray(xl),
                                 interpret=True)
    y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    if seg is not None:
        y = np.bincount(seg, weights=y, minlength=coo.nrows)[:coo.nrows]
    rel = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-10)
    assert rel.max() < 1e-11, f"dd max rel {rel.max():.2e}"


def test_sg_empty_and_tiny():
    # empty matrix
    coo = COOMatrix(0, 0, np.zeros(0, np.int64), np.zeros(0, np.int64),
                    np.zeros(0))
    sell = SellMatrix.from_csr(CSRMatrix.from_coo(coo), layout="sg")
    assert sell.spmv(np.zeros(0)).size == 0
    # single entry
    coo = COOMatrix(3, 5, np.array([1]), np.array([4]), np.array([2.5]))
    sell = SellMatrix.from_csr(CSRMatrix.from_coo(coo), layout="sg")
    y = sell.spmv(np.arange(5, dtype=np.float64))
    assert np.allclose(y, [0.0, 10.0, 0.0])
