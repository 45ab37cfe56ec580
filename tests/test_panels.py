"""Column-panel decomposition tests (x beyond the VMEM budget).

Reference parity target: unbounded-N SpMV (src/csr_matrix.c:130-139 reads x
straight from memory at any N; the TPU kernels stage x in VMEM, so large N
splits into slab-aligned column panels with y accumulated across panels).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sparsematrixvectormultiplication_tpu import CSRMatrix
from sparsematrixvectormultiplication_tpu.formats.sell import (
    PanelSellMatrix,
    SellMatrix,
)
from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
    device_put_panel_sell,
    max_x_table_cols,
    sell_spmv_pallas,
)


@pytest.fixture
def wide_csr(make_random_coo):
    coo, s = make_random_coo(3000, 9000, density=0.002)
    return CSRMatrix.from_coo(coo), s


def test_panel_host_oracle(wide_csr):
    csr, s = wide_csr
    psell = PanelSellMatrix.from_csr(csr, max_panel_cols=2048)
    assert len(psell.panels) == -(-9000 // 2048)
    x = np.random.default_rng(0).standard_normal(csr.ncols)
    assert np.allclose(psell.spmv(x), s.tocsr() @ x, rtol=1e-12, atol=1e-12)


@pytest.mark.slow
def test_panel_device_matches_oracle(wide_csr):
    csr, s = wide_csr
    psell = PanelSellMatrix.from_csr(csr, max_panel_cols=2048)
    dps = device_put_panel_sell(psell, dtype=jnp.float64)
    x = np.random.default_rng(1).standard_normal(csr.ncols)
    y = np.asarray(sell_spmv_pallas(dps, jnp.asarray(x), interpret=True))
    assert np.allclose(y, s.tocsr() @ x, rtol=1e-11, atol=1e-11)


@pytest.mark.slow
def test_panel_matches_single_table(wide_csr):
    """Panelled result must be identical to the single-table kernel path."""
    csr, s = wide_csr
    x = np.random.default_rng(2).standard_normal(csr.ncols)
    sell = SellMatrix.from_csr(csr)
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import device_put_sell

    y1 = np.asarray(
        sell_spmv_pallas(device_put_sell(sell, dtype=jnp.float64),
                         jnp.asarray(x), interpret=True)
    )
    psell = PanelSellMatrix.from_csr(csr, max_panel_cols=1024)
    y2 = np.asarray(
        sell_spmv_pallas(device_put_panel_sell(psell, dtype=jnp.float64),
                         jnp.asarray(x), interpret=True)
    )
    assert np.allclose(y1, y2, rtol=1e-12, atol=1e-12)


def test_panel_skip_empty_groups(make_random_coo):
    """Panels covering a column range touched by few rows skip the rest."""
    # block-diagonal-ish: rows 0..999 touch cols 0..999, rows 2048..3071
    # touch cols 4096..5119
    rng = np.random.default_rng(3)
    r1 = rng.integers(0, 1000, 5000)
    c1 = rng.integers(0, 1000, 5000)
    r2 = rng.integers(2048, 3072, 5000)
    c2 = rng.integers(4096, 5120, 5000)
    import scipy.sparse as sp

    s = sp.coo_matrix(
        (np.ones(10000), (np.concatenate([r1, r2]), np.concatenate([c1, c2]))),
        shape=(3072, 5120),
    )
    s.sum_duplicates()
    from sparsematrixvectormultiplication_tpu import COOMatrix

    coo = COOMatrix(3072, 5120, s.row, s.col, s.data)
    csr = CSRMatrix.from_coo(coo)
    psell = PanelSellMatrix.from_csr(csr, max_panel_cols=1024)
    # panel 0 (cols 0..1023) must only bin the first group of rows
    p0_groups = sum(b.n_groups for b in psell.panels[0].bins)
    assert p0_groups == 1
    # middle panels (cols 1024..4095) have no entries at all
    assert sum(b.n_groups for b in psell.panels[2].bins) == 0
    x = np.random.default_rng(4).standard_normal(5120)
    y = np.asarray(
        sell_spmv_pallas(device_put_panel_sell(psell, dtype=jnp.float64),
                         jnp.asarray(x), interpret=True)
    )
    assert np.allclose(y, s.tocsr() @ x, rtol=1e-11, atol=1e-11)


def test_panel_sigma_sort(wide_csr):
    csr, s = wide_csr
    psell = PanelSellMatrix.from_csr(csr, max_panel_cols=2048, sigma_sort=True)
    x = np.random.default_rng(5).standard_normal(csr.ncols)
    y_perm = psell.spmv(x)
    y_nat = psell.unpermute(y_perm)
    assert np.allclose(y_nat, s.tocsr() @ x, rtol=1e-12, atol=1e-12)


def test_max_x_table_cols():
    n = max_x_table_cols(jnp.float32)
    assert n > 20_000_000  # ~24M f32 columns fit the 96 MiB budget
    assert n % 1024 == 0


def test_pack_x_table_at_limit_fits():
    """pack_x_table must accept a vector of EXACTLY max_x_table_cols width:
    the limit formula must account for the spare sublane block pack_x_table
    adds (Rp = (R//8+1)*8) — every non-last panel of a PanelSellMatrix is
    built at exactly this width (advisor r2 medium finding)."""
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        _X_TABLE_VMEM_BUDGET, pack_x_table,
    )

    for dt in (jnp.float32, jnp.float64):
        n = max_x_table_cols(dt)
        tab = pack_x_table(jnp.zeros((n,), dt), n)
        assert tab.shape[0] * tab.shape[1] * jnp.dtype(dt).itemsize \
            <= _X_TABLE_VMEM_BUDGET
        # one more slab row must overflow (the limit is tight)
        with pytest.raises(ValueError):
            pack_x_table(jnp.zeros((n + 8 * 128,), dt), n + 8 * 128)


@pytest.mark.slow
def test_panel_dd_matches_oracle(wide_csr):
    """fp64-class dd kernel through column panels."""
    import numpy as np

    from sparsematrixvectormultiplication_tpu.ops.pallas_sell_dd import (
        device_put_panel_sell_dd,
        sell_spmv_pallas_dd,
    )

    csr, s = wide_csr
    psell = PanelSellMatrix.from_csr(csr, max_panel_cols=2048)
    dps = device_put_panel_sell_dd(psell)
    x = np.random.default_rng(7).standard_normal(csr.ncols)
    xh = np.asarray(x, np.float32)
    xl = np.asarray(x - xh.astype(np.float64), np.float32)
    yh, yl = sell_spmv_pallas_dd(dps, jnp.asarray(xh), jnp.asarray(xl),
                                 interpret=True)
    y = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    y_ref = s.tocsr() @ x
    rel = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-300)
    ok = (np.abs(y - y_ref) < 1e-9) | (rel < 1e-9)
    assert ok.all(), f"max rel {rel.max():.2e}"


@pytest.mark.slow
def test_harness_auto_panels(monkeypatch, make_random_coo):
    """run_matrix transparently panels when N exceeds the VMEM budget."""
    import sparsematrixvectormultiplication_tpu.bench.harness as harness
    import sparsematrixvectormultiplication_tpu.ops.pallas_sell as ps

    # shrink the budget so a 9000-column matrix needs panels
    # (f64 limit = 64 slabs * 128 = 8192 cols, halved to 4096 for dd)
    monkeypatch.setattr(ps, "_X_TABLE_VMEM_BUDGET", 64 * 128 * 8)
    coo, s = make_random_coo(2000, 9000, density=0.002)
    cfg = harness.BenchConfig(
        iterations=2, rounds=1, dtype="float64",
        kernels=("serial_csr", "pallas_sell", "pallas_sell_dd"),
        flush_between_stages=False,
    )
    res = harness.run_matrix("auto_panel", coo, cfg, log=lambda *a: None)
    assert res.format_stats["sell"].get("num_panels", 1) > 1
    assert res.stage("pallas_sell").diff.significant_diffs == 0
    assert res.stage("pallas_sell_dd").diff.significant_diffs == 0
