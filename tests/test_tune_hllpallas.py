"""Autotuner + HLL-Pallas adapter tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparsematrixvectormultiplication_tpu import CSRMatrix, HLLMatrix, SellMatrix
from sparsematrixvectormultiplication_tpu.models.synthetic import banded, power_law
from sparsematrixvectormultiplication_tpu.ops.pallas_hll import (
    device_put_hll_pallas,
    hll_spmv_pallas,
    hll_to_sell,
)
from sparsematrixvectormultiplication_tpu.tune.autotune import (
    SellCandidate,
    autotune_hack_size,
    autotune_sell,
)


pytestmark = pytest.mark.slow


def test_hll_to_sell_preserves_padding_profile(make_random_coo):
    coo, s = make_random_coo(2000, 1500, 0.02)
    hll = HLLMatrix.from_coo(coo, hack_size=32)
    sell = hll_to_sell(hll)
    # SELL from HLL carries at least the HLL padded area (bin rounding adds more)
    assert sell.nnz == hll.padded_nnz
    x = np.random.default_rng(0).standard_normal(1500)
    assert np.allclose(sell.spmv(x), s.tocsr() @ x, rtol=1e-12, atol=1e-12)


def test_hll_pallas_interpret(make_random_coo):
    coo, s = make_random_coo(1500, 1200, 0.02)
    hll = HLLMatrix.from_coo(coo)
    dhll = device_put_hll_pallas(hll, dtype=jnp.float64)
    x = np.random.default_rng(1).standard_normal(1200)
    y = np.asarray(hll_spmv_pallas(dhll, jnp.asarray(x), interpret=True))
    assert np.allclose(y, s.tocsr() @ x, rtol=1e-11, atol=1e-11)


def test_autotune_sell_cost_model(make_random_coo):
    coo, _ = make_random_coo(3000, 2500, 0.01)
    csr = CSRMatrix.from_coo(coo)
    res = autotune_sell(csr, reps=2)
    assert res.best is not None
    assert len(res.table) >= 4
    assert res.best_seconds <= min(sec for _, sec, _ in res.table)


def test_autotune_sell_forced_layouts_correct():
    coo = banded(2048, 10, 100, seed=3)
    csr = CSRMatrix.from_coo(coo)
    res = autotune_sell(
        csr,
        candidates=[
            SellCandidate("km", (16,), "k-major"),
            SellCandidate("sb", (16,), "sb-major"),
        ],
        reps=2,
    )
    names = [r[0] for r in res.table]
    assert set(names) == {"km", "sb"}


def test_autotune_hack_size():
    coo = power_law(5000, 4, seed=2)
    best, rows = autotune_hack_size(coo, sizes=(8, 32, 128))
    assert best in (8, 32, 128)
    # power-law: smaller hacks pad less
    ratios = {h: r for h, r, _ in rows}
    assert ratios[8] <= ratios[128]


def test_tune_sample_prefix_caps_nnz():
    """Big matrices tune on a group-aligned row prefix (~20M nnz cap)."""
    import numpy as np

    from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
    from sparsematrixvectormultiplication_tpu.tune.autotune import (
        _TUNE_NNZ_CAP, _tune_sample)

    nrows = 40_000
    per_row = 700  # 28M nnz > cap
    ptr = np.arange(nrows + 1, dtype=np.int64) * per_row
    cols = np.tile(np.arange(per_row, dtype=np.int64) * 3, nrows)
    vals = np.ones(nrows * per_row)
    csr = CSRMatrix(nrows, 2100, ptr, cols, vals)
    x = np.ones(2100)
    sub, xs = _tune_sample(csr, x)
    assert sub.nnz <= _TUNE_NNZ_CAP + per_row * 1024
    assert sub.nrows % 1024 == 0
    assert xs is x
    # prefix is exact: same leading rows
    np.testing.assert_array_equal(sub.row_ptr, ptr[: sub.nrows + 1])
    # small matrices pass through untouched
    small = CSRMatrix(1024, 2100, ptr[:1025], cols[: ptr[1024]],
                      vals[: ptr[1024]])
    same, _ = _tune_sample(small, x)
    assert same is small


def test_autotune_candidate_failure_is_tolerated(make_random_coo, monkeypatch):
    """A candidate whose upload/compile fails (oversize-upload MemoryError,
    SMEM/VMEM compile OOM through the tunnel) must cost one table row, not
    the whole matrix (sweep_r3 Aug 19: four suite matrices lost every stage
    to one bad candidate)."""
    from sparsematrixvectormultiplication_tpu.tune import autotune as at

    coo, _ = make_random_coo(600, 600, 0.01)
    csr = CSRMatrix.from_coo(coo)

    class _FakeDev:
        platform = "tpu"

    monkeypatch.setattr(at.jax, "devices", lambda: [_FakeDev()])

    def _boom(sell, dtype=None):
        raise MemoryError("SELL device arrays 2806 MiB > 2200 MiB")

    monkeypatch.setattr(at, "device_put_sell", _boom)
    msgs = []
    tr = at.autotune_sell(csr, x=np.ones(600), log=msgs.append)
    # every candidate failed -> no winner, but no exception either
    assert tr.best is None
    assert all(s == float("inf") for _, s, _ in tr.table)
    assert any("FAILED" in m for m in msgs)


def test_autotune_upload_cap_skips_padded_candidates(make_random_coo, monkeypatch):
    """Candidates whose padded device arrays exceed the upload cap must be
    skipped without a device upload (the runtime uploads at ~20-40 MB/s:
    powerlaw_web's 65x-padded candidates each cost minutes to time)."""
    from sparsematrixvectormultiplication_tpu.tune import autotune as at

    coo, _ = make_random_coo(600, 600, 0.01)
    csr = CSRMatrix.from_coo(coo)

    class _FakeDev:
        platform = "tpu"

    monkeypatch.setattr(at.jax, "devices", lambda: [_FakeDev()])
    monkeypatch.setattr(at, "_TUNE_UPLOAD_CAP_BYTES", 1)  # everything too big

    def _boom(sell, dtype=None):
        raise AssertionError("device_put_sell must not be called")

    monkeypatch.setattr(at, "device_put_sell", _boom)
    msgs = []
    tr = at.autotune_sell(csr, x=np.ones(600), log=msgs.append)
    assert tr.best is None
    assert any("skipped" in m for m in msgs)


def test_tune_skip_file_opts_out_candidates(make_random_coo, monkeypatch, tmp_path):
    """Candidate names listed in <repo>/.tune_skip are skipped before any
    conversion/upload (live-steering escape hatch for worker-side hangs:
    sweep_r3 Aug 19 evening, default-sbmajor blocked 40+ min in a tunnel
    call no in-process timeout can interrupt)."""
    import sparsematrixvectormultiplication_tpu.tune.autotune as at

    coo, _ = make_random_coo(600, 600, 0.01)
    csr = CSRMatrix.from_coo(coo)
    skip = tmp_path / ".tune_skip"
    skip.write_text("# comment\ndefault-sbmajor\n")
    real_open = open

    def _open(path, *a, **k):
        if str(path).endswith(".tune_skip"):
            return real_open(skip, *a, **k)
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", _open)
    msgs = []
    tr = at.autotune_sell(csr, x=np.ones(600), log=msgs.append)
    assert any("default-sbmajor skipped: listed in .tune_skip" in m for m in msgs)
    skipped = dict((n, meta) for n, _, meta in tr.table)
    assert skipped["default-sbmajor"] == {"skipped": ".tune_skip"}
