"""Window-layered (WL) layout tests — the clustered-matrix kernel.

WL (formats/sell.py _wl_profile): per 128-row block, slabs expand into
depth-split slots grouped into windows of 8; sublane = slot, so each (8,128)
layer tile needs a single take_along_axis from a stacked W table. Measured
r2 (probes/fem40 A/B): 52.9 GFLOPS vs 47.0 for sb-list on fem3d-40.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sparsematrixvectormultiplication_tpu import CSRMatrix
from sparsematrixvectormultiplication_tpu.formats.sell import SellMatrix
from sparsematrixvectormultiplication_tpu.models.synthetic import fem_3d
from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
    device_put_sell,
    sell_spmv_pallas,
)


@pytest.fixture(scope="module")
def fem():
    coo = fem_3d(16, 16, 16, dof=3, seed=0)
    csr = CSRMatrix.from_coo(coo)
    x = np.random.default_rng(2).standard_normal(coo.ncols)
    return csr, x, csr.spmv(x)


def test_wl_profile_invariants(fem):
    from sparsematrixvectormultiplication_tpu.formats import sell as sm

    csr, x, y_ref = fem
    rows = csr.row_ids().astype(np.int64)
    num_groups = -(-csr.nrows // 1024)
    R = -(-csr.ncols // 128)
    Rp = (R // 8 + 1) * 8
    rb, w, s, layer, NW_g, L_g = sm._wl_profile(rows, csr.col_idx, num_groups, Rp)
    g = rb >> 3
    for arr, bound in ((w, NW_g), (layer, L_g)):
        mx = np.zeros(num_groups, np.int64)
        np.maximum.at(mx, g, arr)
        assert (mx < bound).all(), "profile coordinate exceeds its group bound"
    assert (s >= 0).all() and (s < 8).all()


def test_wl_forced_matches_oracle(fem):
    csr, x, y_ref = fem
    sell = SellMatrix.from_csr(csr, layout="wl")
    assert any(b.layout == "wl" for b in sell.bins)
    assert np.allclose(sell.spmv(x), y_ref, rtol=1e-12, atol=1e-12)


@pytest.mark.slow
def test_wl_kernel_interpret(fem):
    csr, x, y_ref = fem
    sell = SellMatrix.from_csr(csr, layout="wl")
    d = device_put_sell(sell, dtype=jnp.float64)
    y = np.asarray(sell_spmv_pallas(d, jnp.asarray(x), interpret=True))
    assert np.allclose(y, y_ref, rtol=1e-11, atol=1e-11)


@pytest.mark.slow
def test_wl_dd_kernel_interpret(fem):
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell_dd import (
        device_put_sell_dd,
        sell_spmv_pallas_dd,
    )

    csr, x, y_ref = fem
    sell = SellMatrix.from_csr(csr, layout="wl")
    dd = device_put_sell_dd(sell)
    xh = np.asarray(x, np.float32)
    xl = np.asarray(x - xh.astype(np.float64), np.float32)
    yh, yl = sell_spmv_pallas_dd(dd, jnp.asarray(xh), jnp.asarray(xl),
                                 interpret=True)
    y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    rel = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-300)
    assert ((np.abs(y - y_ref) < 1e-9) | (rel < 1e-9)).all()


def test_wl_sigma_sort(fem):
    csr, x, y_ref = fem
    sell = SellMatrix.from_csr(csr, sigma_sort=True)
    y = sell.unpermute(sell.spmv(x))
    assert np.allclose(y, y_ref, rtol=1e-12, atol=1e-12)


def test_wl_rejected_for_scattered():
    """Scattered matrices must NOT pick wl (fill guard)."""
    from sparsematrixvectormultiplication_tpu.models.synthetic import power_law

    coo = power_law(40_000, 3, seed=6)
    csr = CSRMatrix.from_coo(coo)
    sell = SellMatrix.from_csr(csr, sigma_sort=True)
    assert not any(b.layout == "wl" for b in sell.bins), \
        [(b.layout, b.k) for b in sell.bins]


# ---------------------------------------------------------------------------
# wl-shed: pile shedding ("slot-packing" — forced-wl padding on
# random-in-band is pile-depth driven; deep (row, slab) piles shed to an
# add_into remainder). See formats/sell.py _from_csr_wl_shed.
# ---------------------------------------------------------------------------

def _shed_cases():
    from sparsematrixvectormultiplication_tpu.models.synthetic import banded
    return [
        ("banded_adv", banded(20_000, 60, 2500, seed=1)),
        ("banded_med", banded(10_000, 12, 60, seed=6)),
        ("fem3d", fem_3d(10, 10, 10, dof=3, seed=8)),
    ]


def test_wl_shed_padding_and_oracle():
    rng = np.random.default_rng(0)
    for name, coo in _shed_cases():
        csr = CSRMatrix.from_coo(coo)
        shed = SellMatrix.from_csr(csr, layout="wl-shed")
        wl = SellMatrix.from_csr(csr, layout="wl")
        x = rng.standard_normal(csr.ncols)
        np.testing.assert_allclose(shed.spmv(x), csr.spmv(x),
                                   rtol=1e-12, atol=1e-12, err_msg=name)
        assert shed.padding_ratio <= wl.padding_ratio + 1e-9, name
        # remainder bins accumulate; wl core partitions the groups
        assert any(b.add_into for b in shed.bins), name
    # the motivating case: padding must drop materially (4.4x -> ~2x)
    csr = CSRMatrix.from_coo(_shed_cases()[0][1])
    assert SellMatrix.from_csr(csr, layout="wl-shed").padding_ratio < 2.5


@pytest.mark.slow
def test_wl_shed_kernel_f32_and_dd():
    from sparsematrixvectormultiplication_tpu.models.synthetic import banded
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import device_put_x
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell_dd import (
        device_put_sell_dd,
        sell_spmv_dd_f64,
    )

    rng = np.random.default_rng(1)
    coo = banded(4096, 40, 1000, seed=1)  # sheds + wl/sb-major mix, interpret-affordable
    csr = CSRMatrix.from_coo(coo)
    x = rng.standard_normal(csr.ncols)
    ref = csr.spmv(x)
    s = SellMatrix.from_csr(csr, layout="wl-shed")
    d = device_put_sell(s, dtype=jnp.float32)
    xt = device_put_x(np.asarray(x, np.float32), csr.ncols, jnp.float32)
    for assembly in ("auto", "sum"):
        y = np.asarray(sell_spmv_pallas(d, xt, interpret=True,
                                        assembly=assembly),
                       np.float64)[:csr.nrows]
        rel = np.abs(y - ref) / np.maximum(1.0, np.abs(ref))
        assert rel.max() < 5e-5, f"assembly={assembly}: {rel.max():.1e}"
    # dd twin rides the same add_into assembly. NOTE: interpret mode folds
    # straight-line EFTs on this matrix class (XLA CPU excess precision,
    # CLAUDE.md) — plain k-major dd also measures ~4e-7 here — so the bound
    # only catches wiring bugs (those are O(1)); true dd accuracy is a TPU
    # property (r2-measured 1e-13).
    sdd = SellMatrix.from_csr(csr, layout="wl-shed", sg_slots=False)
    ydd = np.asarray(sell_spmv_dd_f64(device_put_sell_dd(sdd), jnp.asarray(x),
                                      interpret=True))[:csr.nrows]
    reldd = np.abs(ydd - ref) / np.maximum(1.0, np.abs(ref))
    assert reldd.max() < 1e-5, f"dd: {reldd.max():.1e}"


def test_wl_shed_no_shed_fallback():
    """A matrix with piles <= 1 sheds nothing and must fall back to the
    plain forced-wl conversion (no add_into bins, identical results)."""
    from sparsematrixvectormultiplication_tpu.models.synthetic import (
        random_general,
    )

    rng = np.random.default_rng(2)
    coo = random_general(3000, 200_000, 0.00002, seed=3)  # ~1 per (row, slab)
    csr = CSRMatrix.from_coo(coo)
    s = SellMatrix.from_csr(csr, layout="wl-shed")
    x = rng.standard_normal(csr.ncols)
    np.testing.assert_allclose(s.spmv(x), csr.spmv(x), rtol=1e-12, atol=1e-12)


def test_wl_packed_ja_bit_identical(monkeypatch):
    """Index bit-plane packing (VERDICT r4 item 6): SPMV_WL_PACK=1 packs
    four 7-bit lane indices per int32 tile (4B -> 1B of index traffic per
    wl slot); outputs must be BIT-identical to the unpacked kernel for f32
    and dd."""
    import numpy as np
    import jax.numpy as jnp

    from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
    from sparsematrixvectormultiplication_tpu.formats.sell import SellMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import fem_3d
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        device_put_sell, device_put_x, sell_spmv_pallas,
    )
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell_dd import (
        device_put_sell_dd, sell_spmv_pallas_dd,
    )

    coo = fem_3d(10, 10, 10, dof=3, seed=7)
    csr = CSRMatrix.from_coo(coo)
    x = np.random.default_rng(0).standard_normal(csr.ncols)
    sell = SellMatrix.from_csr(csr, layout="wl")
    assert any(b.layout == "wl" for b in sell.bins)
    xd = device_put_x(x, csr.ncols, jnp.float32)
    xh = np.asarray(x, np.float32)
    xl = np.asarray(x - xh.astype(np.float64), np.float32)
    xh_d = device_put_x(xh, csr.ncols, jnp.float32)
    xl_d = device_put_x(xl, csr.ncols, jnp.float32)

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("SPMV_WL_PACK", flag)
        d = device_put_sell(sell, dtype=jnp.float32)
        if flag == "1":
            assert any(b.ja_packed for b in d.bins if b.layout == "wl")
            for b in d.bins:
                if b.ja_packed:  # index plane really shrank ~4x
                    assert b.ja.shape[0] * 4 <= b.as_.shape[0] + 32 * 8
        y = np.asarray(sell_spmv_pallas(d, xd, interpret=True))
        ddm = device_put_sell_dd(sell)
        yh, yl = sell_spmv_pallas_dd(ddm, xh_d, xl_d, interpret=True)
        outs[flag] = (y, np.asarray(yh), np.asarray(yl))
    np.testing.assert_array_equal(outs["0"][0], outs["1"][0])
    np.testing.assert_array_equal(outs["0"][1], outs["1"][1])
    np.testing.assert_array_equal(outs["0"][2], outs["1"][2])
