"""PR (permutation-routed) layout tests — routing, conversion, kernel.

The PR layout (formats/pr.py, ops/pallas_pr.py) is the zero-locality
scattered-regime kernel: gather in column order, Beneš-route products to a
k-major row layout, reduce. Covers the reference's thread-per-row CUDA
regime (cuda_src/csr_matrix_cuda.cu:122-148).
"""

import sys

import numpy as np
import pytest

from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
from sparsematrixvectormultiplication_tpu.formats.pr import PRMatrix
from sparsematrixvectormultiplication_tpu.formats.pr_route import (
    apply_benes,
    benes_masks,
    benes_stage_distances,
    edge_color_128,
    route_elements,
)
from sparsematrixvectormultiplication_tpu.models import synthetic as syn

sys.setrecursionlimit(200_000)


# ---------------------------------------------------------------------------
# routing primitives
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [2, 8, 64, 512])
def test_benes_realizes_random_permutations(rng, n):
    for _ in range(4):
        perm = rng.permutation(n)
        masks = benes_masks(perm)
        assert masks.shape == (2 * (int(n).bit_length() - 1) - 1, n)
        out = apply_benes(np.arange(n), masks)
        # element initially at i ends at position perm[i]
        assert np.array_equal(out[perm], np.arange(n))


def test_benes_stage_distances_symmetric():
    assert benes_stage_distances(16) == [8, 4, 2, 1, 2, 4, 8]


@pytest.mark.parametrize("deg", [2, 8, 32])
def test_edge_coloring_proper(rng, deg):
    n_rows = 24
    src = np.repeat(np.arange(n_rows), deg)
    dst = rng.permutation(src.copy())
    col = edge_color_128(src, dst, n_rows, degree=deg)
    for r in range(n_rows):
        assert len(set(col[src == r])) == deg
        assert len(set(col[dst == r])) == deg


def _check_routing(src_row, dst_row, dst_lane, n_rows, router):
    src_lane, packed, final_lane = router(src_row, dst_row, dst_lane, n_rows)
    rng = np.random.default_rng(7)
    vals = rng.standard_normal(n_rows * 128).astype(np.float32)
    a = np.zeros((n_rows, 128), np.float32)
    a[src_row, src_lane] = vals
    for s, d in enumerate(benes_stage_distances(n_rows)):
        partner = a[np.arange(n_rows) ^ d]
        a = np.where(((packed >> s) & 1).astype(bool), partner, a)
    out = np.take_along_axis(a, final_lane.astype(np.int64), axis=1)
    ref = np.zeros((n_rows, 128), np.float32)
    ref[dst_row, dst_lane] = vals
    assert np.array_equal(out, ref)


def test_route_elements_python_reference(rng):
    n_rows = 16
    pos = rng.permutation(n_rows * 128)
    _check_routing(np.repeat(np.arange(n_rows), 128), pos // 128, pos % 128,
                   n_rows, route_elements)


def test_route_elements_native_matches_semantics(rng):
    """The native router may pick different colors than python — verify it
    realizes the same element movement (the only contract)."""
    from sparsematrixvectormultiplication_tpu.native.build import (
        load_fast_route,
        run_fast_route,
    )

    lib = load_fast_route()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    n_rows = 32
    pos = rng.permutation(n_rows * 128)
    _check_routing(
        np.repeat(np.arange(n_rows), 128), pos // 128, pos % 128, n_rows,
        lambda s, d, l, nr: run_fast_route(lib, s, d, l, nr))


# ---------------------------------------------------------------------------
# conversion + host oracle
# ---------------------------------------------------------------------------

CASES = [
    ("random", lambda: syn.random_general(500, 400, 0.01, seed=2)),
    ("powerlaw", lambda: syn.power_law(1500, 3, seed=3)),
    ("banded", lambda: syn.banded(800, 5, 50, seed=4)),
    ("road", lambda: syn.road_network(1200, seed=5)),
]


@pytest.mark.parametrize("name,builder", CASES)
def test_pr_host_oracle(rng, name, builder):
    csr = CSRMatrix.from_coo(builder())
    pr = PRMatrix.from_csr(csr, native=False)
    x = rng.standard_normal(csr.ncols)
    np.testing.assert_allclose(pr.spmv(x), csr.spmv(x), rtol=1e-12, atol=1e-12)
    # structural invariants
    assert pr.n_rows & (pr.n_rows - 1) == 0
    assert pr.n_stages <= 31
    ks = [b[0] for b in pr.bins]
    assert ks == sorted(ks, reverse=True)  # sigma groups -> contiguous bins


def test_pr_conversion_uses_native_router(rng):
    from sparsematrixvectormultiplication_tpu.native.build import load_fast_route

    if load_fast_route() is None:
        pytest.skip("native toolchain unavailable")
    csr = CSRMatrix.from_coo(syn.power_law(1500, 3, seed=3))
    pr_n = PRMatrix.from_csr(csr, native=True)
    x = rng.standard_normal(csr.ncols)
    np.testing.assert_allclose(pr_n.spmv(x), csr.spmv(x), rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# Pallas kernel (interpret mode on CPU)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,builder", CASES)
def test_pr_kernel_vs_oracle(rng, name, builder):
    from sparsematrixvectormultiplication_tpu.ops.pallas_pr import (
        device_put_pr,
        pr_spmv_pallas,
    )
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import device_put_x

    csr = CSRMatrix.from_coo(builder())
    pr = PRMatrix.from_csr(csr, native=False)
    dpr = device_put_pr(pr)
    x = rng.standard_normal(csr.ncols)
    y = np.asarray(
        pr_spmv_pallas(dpr, device_put_x(x, csr.ncols), interpret=True),
        np.float64)
    y_nat = pr.unpermute(y)
    ref = csr.spmv(x)
    rel = np.abs(y_nat - ref) / np.maximum(1.0, np.abs(ref))
    assert rel.max() < 5e-6, f"{name}: max rel {rel.max():.2e}"


def test_pr_kernel_far_tiles(rng):
    """Sparse column occupancy creates slab gaps -> far tiles take the
    per-row dynamic-load path."""
    from sparsematrixvectormultiplication_tpu.formats.coo import COOMatrix
    from sparsematrixvectormultiplication_tpu.ops.pallas_pr import (
        device_put_pr,
        pr_spmv_pallas,
    )
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import device_put_x

    n, m = 600, 2_000_000  # few, very scattered columns -> big slab gaps
    row = rng.integers(0, n, 1600).astype(np.int32)
    col = rng.integers(0, m, 1600).astype(np.int32)
    val = rng.standard_normal(1600)
    coo = COOMatrix(n, m, row, col, val)
    csr = CSRMatrix.from_coo(coo)
    pr = PRMatrix.from_csr(csr, native=False)
    assert (pr.tile_far == 2).any(), "case must exercise the far path"
    dpr = device_put_pr(pr)
    x = rng.standard_normal(m)
    y = pr.unpermute(np.asarray(
        pr_spmv_pallas(dpr, device_put_x(x, m), interpret=True), np.float64))
    ref = csr.spmv(x)
    rel = np.abs(y - ref) / np.maximum(1.0, np.abs(ref))
    assert rel.max() < 5e-6


# ---------------------------------------------------------------------------
# panels (capacity beyond one Beneš problem)
# ---------------------------------------------------------------------------

def test_pr_panels_host_and_kernel(rng):
    from sparsematrixvectormultiplication_tpu.formats.pr import (
        PanelPRMatrix,
        pr_from_csr,
    )
    from sparsematrixvectormultiplication_tpu.ops.pallas_pr import (
        device_put_pr,
        pr_spmv_pallas,
    )
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import device_put_x

    csr = CSRMatrix.from_coo(syn.random_general(3000, 2500, 0.01, seed=11))
    # force small panels so several are exercised; panels now ENFORCE the
    # Beneš row cap (chunks that overflow it split recursively)
    pp = PanelPRMatrix.from_csr(csr, native=False, target_rows=512)
    assert len(pp.panels) >= 3
    assert all(p.n_rows <= 512 for p in pp.panels)
    x = rng.standard_normal(csr.ncols)
    np.testing.assert_allclose(pp.spmv(x), csr.spmv(x), rtol=1e-12, atol=1e-12)
    dpp = device_put_pr(pp)
    y = np.asarray(
        pr_spmv_pallas(dpp, device_put_x(x, csr.ncols), interpret=True),
        np.float64)
    ref = csr.spmv(x)
    rel = np.abs(pp.unpermute(y) - ref) / np.maximum(1.0, np.abs(ref))
    assert rel.max() < 5e-6
    # dispatcher picks the single-problem path for small matrices
    assert not isinstance(pr_from_csr(csr, native=False), PanelPRMatrix)


# ---------------------------------------------------------------------------
# dd twin
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("panel", [False, True])
def test_pr_dd_kernel_fp64_class(rng, panel):
    from sparsematrixvectormultiplication_tpu.formats.pr import PanelPRMatrix
    from sparsematrixvectormultiplication_tpu.ops.pallas_pr_dd import (
        device_put_pr_dd,
        pr_spmv_pallas_dd,
    )
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import device_put_x

    csr = CSRMatrix.from_coo(syn.power_law(1500, 3, seed=3))
    pr = (PanelPRMatrix.from_csr(csr, native=False, target_rows=512)
          if panel else PRMatrix.from_csr(csr, native=False))
    dpr = device_put_pr_dd(pr)
    x = rng.standard_normal(csr.ncols)
    xh = np.asarray(x, np.float32)
    xl = np.asarray(x - xh.astype(np.float64), np.float32)
    yh, yl = pr_spmv_pallas_dd(dpr, device_put_x(xh, csr.ncols),
                               device_put_x(xl, csr.ncols), interpret=True)
    y = pr.unpermute(np.asarray(yh, np.float64) + np.asarray(yl, np.float64))
    ref = csr.spmv(x)
    rel = np.abs(y - ref) / np.maximum(1.0, np.abs(ref))
    assert rel.max() < 1e-11, f"dd accuracy {rel.max():.2e}"  # fp64-class


# ---------------------------------------------------------------------------
# harness stage
# ---------------------------------------------------------------------------

def test_harness_pallas_pr_stage(rng):
    from sparsematrixvectormultiplication_tpu.bench.harness import (
        BenchConfig,
        run_matrix,
    )

    coo = syn.dense_rows_mix(1200, seed=9)  # heavy rows -> seg_map path
    cfg = BenchConfig(iterations=2, rounds=1, flush_between_stages=False,
                      kernels=("serial_csr", "pallas_pr", "pallas_pr_dd"))
    res = run_matrix("pr_smoke", coo, cfg, log=lambda *_: None)
    for stage in ("pallas_pr", "pallas_pr_dd"):
        st = res.stage(stage)
        assert st is not None, f"{stage} stage missing"
        assert st.diff.significant_diffs == 0


def test_pr_panels_zero_row_tail(rng):
    """All-zero rows glob onto the sigma tail; an entirely-empty chunk must
    be skipped (no panel) with unpermute zero-filling those rows
    (regression: np.empty left garbage there)."""
    from sparsematrixvectormultiplication_tpu.formats.pr import PanelPRMatrix

    coo = syn.random_general(2000, 1500, 0.008, seed=7)
    csr0 = CSRMatrix.from_coo(coo)
    # append 4096 all-zero rows so sigma-tail chunks can be entirely empty
    n = csr0.nrows + 4096
    indptr = np.concatenate([csr0.row_ptr,
                             np.full(4096, csr0.row_ptr[-1])])
    csr = CSRMatrix(n, csr0.ncols, indptr, csr0.col_idx, csr0.values)
    pp = PanelPRMatrix.from_csr(csr, native=False, target_rows=512)
    assert pp.row_perm.size <= n  # zero-tail rows may carry no panel
    x = rng.standard_normal(csr.ncols)
    y = pp.spmv(x)
    ref = csr.spmv(x)
    np.testing.assert_allclose(y, ref, rtol=1e-12, atol=1e-12)
    assert np.all(y[csr0.nrows:] == 0.0)


def test_pr_dense_row_error_is_actionable(rng):
    """A dense row of k entries forces k*8 dest Benes rows (k-major depth)
    -- no panel split can host it. Direct conversion must fail with a
    message pointing at split_heavy_rows (regression: the panel recursion
    bottomed out with an opaque capacity error), and the harness's
    split-first path must convert the same matrix fine."""
    from sparsematrixvectormultiplication_tpu.formats.coo import COOMatrix
    from sparsematrixvectormultiplication_tpu.formats.pr import pr_from_csr

    n, ncols = 2048, 16384
    dense_cols = rng.permutation(ncols)[:12000].astype(np.int64)
    rows = np.concatenate([np.zeros(dense_cols.size, np.int64),
                           np.arange(1, n, dtype=np.int64)])
    cols = np.concatenate([dense_cols, rng.integers(0, ncols, n - 1)])
    vals = rng.standard_normal(rows.size)
    coo = COOMatrix(n, ncols, rows.astype(np.int32), cols.astype(np.int32),
                    vals)
    csr = CSRMatrix.from_coo(coo)

    with pytest.raises(ValueError, match="split heavy rows"):
        pr_from_csr(csr, native=False)

    csr_k, seg = csr.split_heavy_rows(256)
    pr = pr_from_csr(csr_k, native=False)
    x = rng.standard_normal(ncols)
    y_seg = pr.spmv(x)
    y = np.bincount(seg, weights=y_seg, minlength=n)[:n]
    np.testing.assert_allclose(y, csr.spmv(x), rtol=1e-10, atol=1e-10)


def test_pr_force_ladder_host_exact():
    """force_ladder + min_rows (SPMD harmonization) must leave the routed
    result bit-exact: padding groups dummy-fill like natural tails, and
    y_pos maps each natural row to its non-contiguous kernel position."""
    from sparsematrixvectormultiplication_tpu.models.synthetic import power_law

    coo = power_law(5000, 3, seed=1)
    csr = CSRMatrix.from_coo(coo)
    p0 = PRMatrix.from_csr(csr, native=True)
    nat = {K: G for (K, G, _, _) in p0.bins}
    ladder = dict(nat)
    ladder[64] = ladder.get(64, 0) + 1       # a K level absent naturally
    for K in nat:
        ladder[K] += 2                       # spare groups per level
    forced = tuple(sorted(ladder.items(), key=lambda t: -t[0]))
    p1 = PRMatrix.from_csr(csr, native=True, force_ladder=forced,
                           min_rows=4 * p0.n_rows)
    assert p1.n_rows == 4 * p0.n_rows
    assert p1.y_pos is not None and p1.y_rows > p0.y_rows
    x = np.random.default_rng(0).standard_normal(csr.ncols)
    y_ref = csr.spmv(x)
    np.testing.assert_allclose(p1.spmv(x), y_ref, rtol=1e-12, atol=1e-12)
    # an undersized ladder is rejected
    import pytest
    with pytest.raises(ValueError, match="cannot host"):
        PRMatrix.from_csr(csr, force_ladder=((1, 1),))
