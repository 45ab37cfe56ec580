"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY §4 implication: multi-device tests on forced CPU meshes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsematrixvectormultiplication_tpu import CSRMatrix, HLLMatrix
from sparsematrixvectormultiplication_tpu.parallel.scheduler import (
    balanced_partition,
    partition_report,
)
from sparsematrixvectormultiplication_tpu.parallel.sharding import (
    col_sharded_spmv,
    make_mesh,
    row_sharded_spmv,
    shard_ell_2d,
    shard_ell_rows,
    sharded_spmv_2d,
)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


# ---------------- scheduler ----------------

def test_balanced_partition_uniform():
    w = np.ones(100, dtype=np.int64)
    p = balanced_partition(w, 4)
    assert p.num_parts == 4
    assert np.all(p.loads == 25)
    assert p.imbalance == 1.0


def test_balanced_partition_skewed():
    # one huge item + many small: greedy must isolate the hot range
    w = np.ones(100, dtype=np.int64)
    w[10] = 1000
    p = balanced_partition(w, 8)
    assert p.num_parts <= 8
    assert p.loads.sum() == w.sum()
    # ranges are contiguous and cover everything
    assert p.starts[0] == 0 and p.ends[-1] == 100
    assert np.all(p.starts[1:] == p.ends[:-1])


def test_balanced_partition_more_parts_than_items():
    w = np.array([5, 3, 2], dtype=np.int64)
    p = balanced_partition(w, 10)
    assert p.num_parts <= 3  # capped (≙ csr_matrix.c:173)
    assert p.loads.sum() == 10


def test_balanced_partition_empty():
    p = balanced_partition(np.zeros(0, np.int64), 4)
    assert p.loads.sum() == 0


def test_partition_report():
    p = balanced_partition(np.ones(10, np.int64), 2)
    rep = partition_report(p, "rows")
    assert "rows" in rep and "part 0" in rep


# ---------------- sharded SpMV ----------------

@pytest.fixture
def problem(make_random_coo):
    coo, s = make_random_coo(3000, 2600, 0.01)
    x = np.random.default_rng(3).standard_normal(2600)
    hll = HLLMatrix.from_coo(coo)
    return hll, s, x


def test_row_sharded_spmv(problem):
    hll, s, x = problem
    mesh = make_mesh(8, ("rows",))
    sh = shard_ell_rows(hll, mesh)
    y = np.asarray(row_sharded_spmv(sh, jnp.asarray(x), mesh))
    assert np.allclose(y, s.tocsr() @ x, rtol=1e-12, atol=1e-12)


def test_row_sharded_output_sharding(problem):
    hll, s, x = problem
    mesh = make_mesh(8, ("rows",))
    sh = shard_ell_rows(hll, mesh)
    # the ELL rectangle really is distributed over all 8 devices
    assert len(sh.as_.sharding.device_set) == 8


def test_2d_sharded_spmv(problem):
    hll, s, x = problem
    mesh = make_mesh(8, ("rows", "cols"), shape=(4, 2))
    sh = shard_ell_2d(hll, mesh)
    y = np.asarray(sharded_spmv_2d(sh, jnp.asarray(x), mesh))
    assert np.allclose(y, s.tocsr() @ x, rtol=1e-12, atol=1e-12)


def test_col_sharded_spmv(problem):
    hll, s, x = problem
    mesh = make_mesh(8, ("cols",))
    y = np.asarray(col_sharded_spmv(hll, jnp.asarray(x), mesh))
    assert np.allclose(y, s.tocsr() @ x, rtol=1e-12, atol=1e-12)


def test_2d_mesh_4x2_vs_2x4(problem):
    hll, s, x = problem
    y_ref = s.tocsr() @ x
    for shape in [(2, 4), (8, 1), (1, 8)]:
        mesh = make_mesh(8, ("rows", "cols"), shape=shape)
        sh = shard_ell_2d(hll, mesh)
        y = np.asarray(sharded_spmv_2d(sh, jnp.asarray(x), mesh))
        assert np.allclose(y, y_ref, rtol=1e-12, atol=1e-12), shape


@pytest.mark.slow
def test_multidevice_pallas_spmv(problem):
    """Manual-DP Pallas dispatch across the 8 CPU devices."""
    from sparsematrixvectormultiplication_tpu import CSRMatrix
    from sparsematrixvectormultiplication_tpu.parallel.multidevice import (
        shard_sell_rows,
    )

    hll, s, x = problem
    coo = None
    csr = CSRMatrix(
        nrows=s.shape[0], ncols=s.shape[1],
        row_ptr=s.tocsr().indptr.astype(np.int64),
        col_idx=s.tocsr().indices.astype(np.int32),
        values=s.tocsr().data,
    )
    md = shard_sell_rows(csr, jax.devices(), dtype=jnp.float64)
    assert md.num_shards >= 2
    # every shard really lives on its own device
    devs = {sh[0] for sh in md.shards}
    assert len(devs) == md.num_shards
    y = md.spmv(x, interpret=True)
    assert np.allclose(y, s.tocsr() @ x, rtol=1e-11, atol=1e-11)


def test_multidevice_balances_nnz():
    from sparsematrixvectormultiplication_tpu import CSRMatrix, COOMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import dense_rows_mix
    from sparsematrixvectormultiplication_tpu.parallel.multidevice import (
        shard_sell_rows,
    )

    coo = dense_rows_mix(20000, seed=3)
    csr = CSRMatrix.from_coo(coo)
    md = shard_sell_rows(csr, jax.devices(), dtype=jnp.float64)
    nnzs = [sh[1].nnz for sh in md.shards]
    assert max(nnzs) < 3 * (sum(nnzs) / len(nnzs))  # roughly balanced


@pytest.mark.slow
def test_spmd_pallas_shard_map(problem):
    """Flagship Pallas kernel under shard_map on the 8-device CPU mesh."""
    from sparsematrixvectormultiplication_tpu import CSRMatrix
    from sparsematrixvectormultiplication_tpu.parallel.spmd_pallas import (
        build_spmd_sell,
        sell_spmv_spmd,
    )

    hll, s, x = problem
    sc = s.tocsr()
    csr = CSRMatrix(
        nrows=s.shape[0], ncols=s.shape[1],
        row_ptr=sc.indptr.astype(np.int64),
        col_idx=sc.indices.astype(np.int32),
        values=sc.data,
    )
    mesh = make_mesh(8, ("rows",))
    spmd = build_spmd_sell(csr, 8, mesh=mesh, dtype=jnp.float64)
    assert spmd.n_shards == 8
    # every stacked leaf carries the shard axis
    for b in spmd.stacked.bins:
        assert b.ja.shape[0] == 8 and b.group_ids.shape[0] == 8
    y = sell_spmv_spmd(spmd, jnp.asarray(x), mesh, interpret=True)
    assert y.shape == (s.shape[0],)
    assert np.allclose(y, sc @ x, rtol=1e-11, atol=1e-11)


@pytest.mark.slow
def test_spmd_pallas_unbalanced_shards():
    """Shards with heterogeneous bin structures harmonize correctly."""
    from sparsematrixvectormultiplication_tpu import CSRMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import dense_rows_mix
    from sparsematrixvectormultiplication_tpu.parallel.spmd_pallas import (
        build_spmd_sell,
        sell_spmv_spmd,
    )

    coo = dense_rows_mix(9000, seed=3)
    csr = CSRMatrix.from_coo(coo)
    mesh = make_mesh(4, ("rows",))
    spmd = build_spmd_sell(csr, 4, mesh=mesh, dtype=jnp.float64)
    x = np.random.default_rng(5).standard_normal(coo.ncols)
    y = sell_spmv_spmd(spmd, jnp.asarray(x), mesh, interpret=True)
    assert np.allclose(y, csr.spmv(x), rtol=1e-11, atol=1e-11)


@pytest.mark.slow
def test_spmd_bsr_spmm_shard_map():
    """MXU BSR SpMM under shard_map: block-rows sharded, X replicated,
    no collectives (parallel/spmd_bsr.py)."""
    import scipy.sparse as sp

    from sparsematrixvectormultiplication_tpu import CSRMatrix
    from sparsematrixvectormultiplication_tpu.formats.bsr import BSRMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import banded
    from sparsematrixvectormultiplication_tpu.parallel.spmd_bsr import (
        bsr_spmm_spmd,
        shard_bsr,
    )

    coo = banded(2100, 9, 30, seed=6)  # 17 block-rows: not a multiple of 8
    csr = CSRMatrix.from_coo(coo)
    s = sp.csr_matrix((coo.val, (coo.row, coo.col)),
                      shape=(coo.nrows, coo.ncols))
    mesh = make_mesh(8, ("rows",))
    spmd = shard_bsr(BSRMatrix.from_csr(csr), 8, mesh=mesh)
    assert spmd.stacked.blocks.shape[0] == 8  # leading shard axis
    X = np.random.default_rng(8).standard_normal((coo.ncols, 9))
    Y = bsr_spmm_spmd(spmd, X.astype(np.float32), mesh, interpret=True)
    assert Y.shape == (coo.nrows, 9)
    ref = s @ X
    assert np.allclose(Y, ref, rtol=2e-5, atol=2e-5 * np.abs(ref).max())


@pytest.mark.slow
def test_spmd_sell_spmm_shard_map():
    """Multi-RHS SELL SpMM under shard_map: rows sharded, the R stacked
    x-tables replicated (parallel/spmd_pallas.py sell_spmm_spmd)."""
    from sparsematrixvectormultiplication_tpu import CSRMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import banded
    from sparsematrixvectormultiplication_tpu.parallel.spmd_pallas import (
        build_spmd_sell,
        sell_spmm_spmd,
    )

    coo = banded(9000, 9, 30, seed=6)
    csr = CSRMatrix.from_coo(coo)
    mesh = make_mesh(8, ("rows",))
    spmd = build_spmd_sell(csr, 8, mesh=mesh, dtype=jnp.float64,
                           sell_kwargs={"layout": "k-major"})
    X = np.random.default_rng(9).standard_normal((coo.ncols, 8))
    Y = sell_spmm_spmd(spmd, X, mesh, interpret=True)
    assert Y.shape == (coo.nrows, 8)
    Yref = np.column_stack([csr.spmv(X[:, j]) for j in range(8)])
    assert np.allclose(Y, Yref, rtol=1e-11, atol=1e-11)


@pytest.mark.slow
def test_spmd_sg_layout_scattered():
    """The scattered-regime SG layout harmonizes and runs under shard_map
    (the r3 headline kernel's multi-chip path)."""
    from sparsematrixvectormultiplication_tpu import CSRMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import power_law
    from sparsematrixvectormultiplication_tpu.parallel.spmd_pallas import (
        build_spmd_sell,
        sell_spmv_spmd,
    )

    coo = power_law(12000, 7, 2.3, seed=11)
    csr = CSRMatrix.from_coo(coo)
    mesh = make_mesh(4, ("rows",))
    spmd = build_spmd_sell(csr, 4, mesh=mesh, dtype=jnp.float64,
                           sell_kwargs={"layout": "sg"})
    assert any(b.layout == "sg" for b in spmd.stacked.bins)
    x = np.random.default_rng(12).standard_normal(coo.ncols)
    y = sell_spmv_spmd(spmd, x, mesh, interpret=True)
    assert np.allclose(y, csr.spmv(x), rtol=1e-11, atol=1e-11)


@pytest.mark.slow
def test_spmd_pr_shard_map():
    """The PR zero-locality kernel under shard_map: force_ladder panels
    are geometry-identical, stack on a leading shard axis, and reproduce
    the oracle through the 8-device mesh (heavy rows pre-split, segments
    reduced host-side like bench/harness.py)."""
    from sparsematrixvectormultiplication_tpu import CSRMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import power_law
    from sparsematrixvectormultiplication_tpu.parallel.spmd_pr import (
        build_spmd_pr,
        pr_spmv_spmd,
    )

    coo = power_law(20000, 3, seed=13)
    csr = CSRMatrix.from_coo(coo)
    csr_k, seg = csr.split_heavy_rows(16, strided=True)
    mesh = make_mesh(8, ("rows",))
    spmd = build_spmd_pr(csr_k, 8, mesh=mesh, target_rows=1 << 12)
    assert spmd.stacked.val.shape[:2] == (8, spmd.pps)

    x = np.random.default_rng(14).standard_normal(coo.ncols)
    y = pr_spmv_spmd(spmd, x, mesh, interpret=True).astype(np.float64)
    if seg is not None:
        y = np.bincount(np.asarray(seg), weights=y,
                        minlength=csr.nrows)[:csr.nrows]
    y_ref = csr.spmv(x)
    rel = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)
    assert int(((np.abs(y - y_ref) > 1e-5) & (rel > 1e-5)).sum()) == 0


@pytest.mark.slow
def test_spmd_pr_needs_multiple_panels_per_shard():
    """When one panel per shard cannot meet target_rows, the builder
    grows panels-per-shard until the union geometry fits."""
    from sparsematrixvectormultiplication_tpu import CSRMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import (
        random_general,
    )
    from sparsematrixvectormultiplication_tpu.parallel.spmd_pr import (
        build_spmd_pr,
        pr_spmv_spmd,
    )

    coo = random_general(9000, 9000, 2e-3, seed=15)
    csr = CSRMatrix.from_coo(coo)
    mesh = make_mesh(2, ("rows",))
    spmd = build_spmd_pr(csr, 2, mesh=mesh, target_rows=1 << 10)
    assert spmd.pps > 1 and spmd.stacked.n_rows <= 1 << 10
    # a target below the matrix's union-ladder floor raises, promptly
    with pytest.raises(ValueError, match="union-ladder floor"):
        build_spmd_pr(csr, 2, mesh=mesh, target_rows=1 << 7)
    x = np.random.default_rng(16).standard_normal(coo.ncols)
    y = pr_spmv_spmd(spmd, x, mesh, interpret=True).astype(np.float64)
    y_ref = csr.spmv(x)
    rel = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1e-30)
    assert int(((np.abs(y - y_ref) > 1e-5) & (rel > 1e-5)).sum()) == 0


@pytest.mark.slow
def test_spmd_split_shard_map():
    """The locality-split composite under shard_map: near SELL shards and
    far natural-order PR shards over the SAME group partition, local
    same-shape vector add, natural-order reassembly."""
    from sparsematrixvectormultiplication_tpu import COOMatrix, CSRMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import banded
    from sparsematrixvectormultiplication_tpu.parallel.spmd_split import (
        build_spmd_split,
        split_spmv_spmd,
    )

    # band + scattered tail at >= 8 groups so every shard is non-empty
    rng = np.random.default_rng(21)
    n = 9000
    coo = banded(n, 4, 60, seed=21)
    nf = coo.row.size // 20
    fr = rng.integers(0, n, nf).astype(np.int32)
    fc = rng.integers(0, n, nf).astype(np.int32)
    c = COOMatrix(n, n, np.concatenate([coo.row, fr]),
                  np.concatenate([coo.col, fc]),
                  np.concatenate([coo.val, rng.standard_normal(nf)]))
    csr = CSRMatrix.from_coo(c)

    mesh = make_mesh(8, ("rows",))
    spmd = build_spmd_split(csr, 8, mesh=mesh)
    assert spmd.far.val.shape[0] == 8
    x = rng.standard_normal(n)
    y = split_spmv_spmd(spmd, x, mesh, interpret=True).astype(np.float64)
    y_ref = csr.spmv(x)
    rel = np.abs(y - y_ref) / np.maximum(1.0, np.abs(y_ref))
    assert rel.max() < 1e-5, f"max rel {rel.max():.2e}"


def test_col_sharded_sell_psum_equals_serial():
    """Column-sharded SELL Pallas + psum epilogue (VERDICT r4 item 8): the
    TP-style layout must match the fp64 oracle at every device count."""
    import numpy as np
    import jax
    from jax.sharding import Mesh

    from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
    from sparsematrixvectormultiplication_tpu.models.synthetic import banded
    from sparsematrixvectormultiplication_tpu.parallel.spmd_colsell import (
        build_spmd_sell_cols, sell_spmv_spmd_cols,
    )

    coo = banded(4096, 5, 120, seed=9)
    csr = CSRMatrix.from_coo(coo)
    x = np.random.default_rng(1).standard_normal(csr.ncols)
    y_ref = csr.spmv(x)
    for n in (1, 2, 8):
        mesh = Mesh(np.array(jax.devices()[:n]).reshape(n), ("cols",))
        spmd = build_spmd_sell_cols(csr, n, mesh=mesh)
        y = sell_spmv_spmd_cols(spmd, x, mesh, interpret=True)
        np.testing.assert_allclose(y.astype(np.float64), y_ref,
                                   rtol=5e-4, atol=5e-4)
