"""Column-sharded SPMD Pallas SELL SpMV — the TP-style psum path.

`spmd_pallas.py` row-shards A and replicates x (the DP layout: zero
hot-loop collectives). This module is the other half of SURVEY §2.4's
distribution matrix (VERDICT r4 item 8): COLUMNS are sharded, each device
holds a SELL conversion of its column slice of A (all rows) plus only its
slice of x, computes a full-length partial y with the flagship Pallas
kernel, and one ``psum`` over the ``cols`` axis assembles the result on
ICI — the TP analogue of the reference's per-thread column blocking (the
reference has no such mode; its OpenMP kernels all row-partition,
src/csr_matrix.c:167-266).

Byte model (docs/DESIGN.md "Column vs row sharding"): per device and step,
row-sharding streams A/n + x (replicated) and writes y/n; col-sharding
streams A/n + x/n and psums a FULL y per step. Col-sharding therefore wins
only when x dominates the per-device budget — x_bytes > A_bytes/n + y_psum
cost — i.e. very wide matrices (N >> nnz/n) or x tables beyond per-chip
VMEM/HBM; for ordinary SpMV shapes the row layout's zero-collective loop
is strictly cheaper. Both are built so the cost model has measured rows.

Harmonization: unlike the row path (one global conversion sliced by shard),
column slices are structurally different matrices, so each shard converts
independently (forced k-major, shared K ladder) and bins are harmonized to
the UNION of K keys with trash-group padding — the r2-style scheme, priced
here as conversion-time cost only (the padded groups stream zero tiles).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.csr import CSRMatrix
from ..formats.sell import DEFAULT_K_BINS, GROUP_ROWS, LANES, SUBLANES, SellMatrix
from ..ops.pallas_sell import DeviceSell, DeviceSellBin, sell_spmv_pallas, slab_table_rows

__all__ = ["SpmdColSell", "build_spmd_sell_cols", "sell_spmv_spmd_cols"]


@dataclass
class SpmdColSell:
    stacked: DeviceSell      # every leaf has a leading n_shards axis
    cols_per: int            # uniform columns per shard (slab-aligned)
    r_loc: int               # local packed-x table rows
    nrows: int
    ncols: int
    nnz: int
    axis: str = "cols"

    @property
    def n_shards(self) -> int:
        return int(self.stacked.bins[0].group_ids.shape[0]) if \
            self.stacked.bins else 1


def _slice_cols(csr: CSRMatrix, c_lo: int, c_hi: int) -> CSRMatrix:
    """All rows, columns in [c_lo, c_hi), column ids made slice-local.
    CSR column order within rows is preserved (slices keep sortedness)."""
    keep = (csr.col_idx >= c_lo) & (csr.col_idx < c_hi)
    # per-row counts of kept entries -> new row_ptr
    row_of = np.repeat(np.arange(csr.nrows, dtype=np.int64),
                       np.diff(csr.row_ptr).astype(np.int64))
    kept_rows = row_of[keep]
    counts = np.bincount(kept_rows, minlength=csr.nrows)
    ptr = np.zeros(csr.nrows + 1, dtype=np.int64)
    np.cumsum(counts, out=ptr[1:])
    return CSRMatrix(csr.nrows, c_hi - c_lo, ptr,
                     (csr.col_idx[keep] - c_lo).astype(csr.col_idx.dtype),
                     csr.values[keep])


def build_spmd_sell_cols(
    csr: CSRMatrix,
    n_shards: int,
    *,
    dtype=jnp.float32,
    mesh: Mesh | None = None,
    axis: str = "cols",
    k_bins=DEFAULT_K_BINS,
) -> SpmdColSell:
    n_shards = max(1, n_shards)
    num_groups = -(-csr.nrows // GROUP_ROWS) if csr.nrows else 1
    trash_gid = num_groups          # padded/empty groups write here
    cols_per = -(-max(csr.ncols, 1) // (n_shards * LANES)) * LANES
    r_loc = slab_table_rows(cols_per)
    np_dtype = np.dtype(jnp.dtype(dtype).name)

    shards = []
    for i in range(n_shards):
        # uniform cols_per on every shard (the tail range may reach past
        # ncols — _slice_cols keeps only real entries; the uniform local
        # width is what pack_x_cols / r_loc harmonization require)
        sl = _slice_cols(csr, i * cols_per, (i + 1) * cols_per)
        shards.append(SellMatrix.from_csr(sl, k_bins=k_bins,
                                          layout="k-major"))

    # union of bin keys (K); per key pad group counts / list widths to max
    keys = sorted({int(b.k) for s in shards for b in s.bins})
    stacked_bins = []
    for K in keys:
        kb = K * SUBLANES
        per = []
        for s in shards:
            b = next((bb for bb in s.bins if int(bb.k) == K), None)
            if b is None:
                per.append((np.zeros(0, np.int64),
                            np.zeros((0, LANES), np.int32),
                            np.zeros((0, LANES), np_dtype),
                            np.zeros((0, 1), np.int32),
                            np.zeros(0, np.int32)))
            else:
                sl_ = np.asarray(b.slab_list, np.int32)
                if sl_.ndim == 1:
                    sl_ = sl_.reshape(max(int(b.n_groups), 1), -1) \
                        if b.n_groups else sl_.reshape(0, 1)
                per.append((np.asarray(b.group_ids, np.int64),
                            np.asarray(b.ja, np.int32),
                            np.asarray(b.as_, np_dtype),
                            sl_,
                            np.asarray(b.slab_count, np.int32)))
        g_max = max(p[0].size for p in per)
        if g_max == 0:
            continue
        w_max = max((p[3].shape[1] for p in per if p[3].size), default=1)
        gid_s, ja_s, as_s, sl_s, cnt_s = [], [], [], [], []
        for gids, ja, as_, sl_, cnt in per:
            ng = gids.size
            pad_g = g_max - ng
            if sl_.shape[1] < w_max:
                sl_ = np.concatenate(
                    [sl_, np.zeros((sl_.shape[0], w_max - sl_.shape[1]),
                                   np.int32)], axis=1)
            gid_s.append(np.concatenate(
                [gids.astype(np.int32), np.full(pad_g, trash_gid, np.int32)]))
            ja_s.append(np.concatenate(
                [ja, np.zeros((pad_g * kb, LANES), np.int32)]))
            as_s.append(np.concatenate(
                [as_, np.zeros((pad_g * kb, LANES), np_dtype)]))
            sl_s.append(np.concatenate(
                [sl_, np.zeros((pad_g, w_max), np.int32)]))
            cnt_s.append(np.concatenate([cnt, np.zeros(pad_g, np.int32)]))
        stacked_bins.append(
            DeviceSellBin(
                k=K, n_groups=g_max, layout="k-major", span=0,
                group_ids=np.stack(gid_s),
                ja=np.stack(ja_s), as_=np.stack(as_s),
                slab_list=np.stack(sl_s), slab_count=np.stack(cnt_s),
                contig_start=-1,
            )
        )

    stacked = DeviceSell(
        nrows=csr.nrows, ncols=cols_per, nnz=csr.nnz,
        num_groups=num_groups + 1, bins=stacked_bins,  # +1 trash group
    )

    if mesh is not None:
        def put(leaf):
            spec = P(axis, *([None] * (np.ndim(leaf) - 1)))
            return jax.device_put(jnp.asarray(leaf), NamedSharding(mesh, spec))

        stacked = jax.tree_util.tree_map(put, stacked)
    else:
        stacked = jax.tree_util.tree_map(jnp.asarray, stacked)

    return SpmdColSell(stacked=stacked, cols_per=cols_per, r_loc=r_loc,
                       nrows=csr.nrows, ncols=csr.ncols, nnz=csr.nnz,
                       axis=axis)


def pack_x_cols(spmd: SpmdColSell, x, mesh: Mesh, dtype=jnp.float32):
    """Shard x by column range: (n_shards, r_loc, 128) device array with the
    leading axis on the mesh's ``cols`` axis."""
    n = spmd.n_shards
    xp = np.zeros(n * spmd.cols_per, np.dtype(jnp.dtype(dtype).name))
    xp[: spmd.ncols] = np.asarray(x)[: spmd.ncols]
    x2 = xp.reshape(n, spmd.cols_per // LANES, LANES)
    if x2.shape[1] < spmd.r_loc:
        x2 = np.concatenate(
            [x2, np.zeros((n, spmd.r_loc - x2.shape[1], LANES), x2.dtype)],
            axis=1)
    return jax.device_put(jnp.asarray(x2),
                          NamedSharding(mesh, P(spmd.axis, None, None)))


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "interpret"))
def _spmd_run_cols(stacked, x_tabs, *, mesh, axis, interpret):
    def local_fn(st, xt):
        dsell = jax.tree_util.tree_map(lambda a: a[0], st)
        y_part = sell_spmv_pallas(dsell, xt[0], interpret=interpret)
        return jax.lax.psum(y_part, axis)

    run = shard_map(
        local_fn, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(axis), stacked),
                  P(axis, None, None)),
        out_specs=P(),
        check_vma=False,
    )
    return run(stacked, x_tabs)


def sell_spmv_spmd_cols(spmd: SpmdColSell, x, mesh: Mesh, *,
                        interpret: bool = False):
    """y = A @ x with columns sharded and one psum over ``cols``."""
    x_tabs = pack_x_cols(spmd, x, mesh,
                         dtype=spmd.stacked.bins[0].as_.dtype
                         if spmd.stacked.bins else jnp.float32)
    y = _spmd_run_cols(spmd.stacked, x_tabs, mesh=mesh, axis=spmd.axis,
                       interpret=interpret)
    return np.asarray(y)[: spmd.nrows]
