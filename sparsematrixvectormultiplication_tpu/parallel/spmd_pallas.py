"""SPMD Pallas SpMV — the flagship kernel under ``shard_map``.

`parallel/multidevice.py` scales the Pallas kernel by explicit per-device
dispatch (host reassembly per call). This module does it the TPU-native SPMD
way: one ``shard_map`` program over a ``Mesh`` axis, groups row-sharded,
x replicated, zero hot-loop collectives (the DP layout of SURVEY §2.4 —
the reference itself has no distribution; its closest analogue is the
per-thread contiguous row ranges of csr_matrix.c:167-266, here promoted to
chips).

Pallas calls have no SPMD partitioning rules, so the matrix is pre-sharded:
rows are split into ``n_shards`` contiguous, group-aligned, nnz-balanced
ranges (``balanced_partition``); each range is converted to SELL
independently; and the per-shard bin structures are **harmonized** to a
single static shape (same bin keys, same group counts, same slab-list
widths) so the stacked arrays form one sharded pytree. Padding groups write
their (zero) output tiles to a dedicated trash group so they can never
clobber real rows.
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
from ..formats.sell import GROUP_ROWS, LANES, SUBLANES, SellMatrix
from ..ops.pallas_sell import DeviceSell, DeviceSellBin, sell_spmv_pallas
from .scheduler import balanced_partition

__all__ = ["SpmdSell", "build_spmd_sell", "sell_spmv_spmd",
           "sell_spmm_spmd"]

@dataclass
class SpmdSell:
    """Stacked, mesh-sharded SELL shards (leading axis = shard)."""

    stacked: DeviceSell      # every array leaf has a leading n_shards axis
    shard_rows: np.ndarray   # (n_shards,) real rows per shard
    local_rows: int          # uniform padded rows per shard (ng_max * 1024)
    nrows: int
    ncols: int
    nnz: int
    axis: str = "rows"
    # (n_shards, 2) [group_start, group_end) of each shard's row range —
    # lets composites (spmd_split.py) build aligned shards of a sibling
    # structure over the SAME partition
    group_bounds: np.ndarray | None = None

    @property
    def n_shards(self) -> int:
        return int(self.shard_rows.size)


def build_spmd_sell(
    csr: CSRMatrix,
    n_shards: int,
    *,
    dtype=jnp.float32,
    mesh: Mesh | None = None,
    axis: str = "rows",
    sell_kwargs: dict | None = None,
) -> SpmdSell:
    """Row-shard ``csr`` into ``n_shards`` group-aligned nnz-balanced ranges
    and slice ONE global SELL conversion by shard — every shard sees the
    same bin keys and slab-list widths by construction (the r2 scheme
    converted each shard independently and padded every bin to the union-max
    group count and list width, inflating small shards; VERDICT r2 weak #5).
    Bins' group lists are ascending, so shard slices are contiguous
    zero-copy views; per-shard counts pad to the per-key max with
    trash-group rows."""
    sell_kwargs = dict(sell_kwargs or {})
    if sell_kwargs.get("sigma_sort"):
        raise ValueError("sigma_sort permutes rows across shard boundaries; "
                         "sort before sharding instead")
    num_groups = -(-csr.nrows // GROUP_ROWS) if csr.nrows else 0
    n_shards = max(1, n_shards)

    row_nnz = np.zeros(num_groups * GROUP_ROWS, dtype=np.int64)
    row_nnz[: csr.nrows] = csr.row_nnz()
    group_nnz = row_nnz.reshape(num_groups, GROUP_ROWS).sum(axis=1)
    part = list(balanced_partition(group_nnz, min(n_shards, max(num_groups, 1))))
    # shard_map needs exactly mesh-axis many shards: pad with empty ranges
    while len(part) < n_shards:
        part.append((num_groups, num_groups, 0))
    gstarts = np.array([gs for gs, _, _ in part], np.int64)
    gends = np.array([ge for _, ge, _ in part], np.int64)
    shard_rows = [
        max(0, min(ge * GROUP_ROWS, csr.nrows) - min(gs * GROUP_ROWS, csr.nrows))
        for gs, ge in zip(gstarts, gends)
    ]

    sell = SellMatrix.from_csr(csr, **sell_kwargs)

    ng_max = int((gends - gstarts).max()) if num_groups else 1
    ng_max = max(ng_max, 1)
    trash_gid = ng_max  # padded groups write a dedicated trash output tile
    np_dtype = np.dtype(jnp.dtype(dtype).name)

    stacked_bins = []
    for b in sell.bins:
        gids = np.asarray(b.group_ids, np.int64)
        kb = int(b.k) * SUBLANES
        sl = np.asarray(b.slab_list, np.int32)
        if sl.ndim == 1:
            sl = sl.reshape(max(b.n_groups, 1), -1) if b.n_groups else \
                sl.reshape(0, 1)
        w = sl.shape[1] if sl.size else 1
        # shard boundaries within this bin's ascending group list
        lo = np.searchsorted(gids, gstarts)
        hi = np.searchsorted(gids, gends)
        g_max = int((hi - lo).max()) if gids.size else 0
        if g_max == 0:
            continue
        gid_s, ja_s, as_s, sl_s, cnt_s = [], [], [], [], []
        for i in range(n_shards):
            a, z = int(lo[i]), int(hi[i])
            ng = z - a
            pad_g = g_max - ng
            gid = np.concatenate([
                (gids[a:z] - gstarts[i]).astype(np.int32),
                np.full(pad_g, trash_gid, np.int32),
            ])
            ja = b.ja[a * kb : z * kb]
            as_ = np.asarray(b.as_[a * kb : z * kb], np_dtype)
            slab = sl[a:z] if sl.size else np.zeros((ng, w), np.int32)
            cnt = np.asarray(b.slab_count[a:z], np.int32)
            if pad_g:
                ja = np.concatenate(
                    [ja, np.zeros((pad_g * kb, LANES), b.ja.dtype)])
                as_ = np.concatenate(
                    [as_, np.zeros((pad_g * kb, LANES), np_dtype)])
                # pad slab rows with 0 (in range; padded rows' values are 0,
                # and k-major loop bounds are the padded counts = 0)
                slab = np.concatenate(
                    [slab, np.zeros((pad_g, w), np.int32)])
                cnt = np.concatenate([cnt, np.zeros(pad_g, np.int32)])
            gid_s.append(gid)
            ja_s.append(ja)
            as_s.append(as_)
            sl_s.append(slab)
            cnt_s.append(cnt)
        stacked_bins.append(
            DeviceSellBin(
                k=int(b.k),
                n_groups=g_max,
                layout=b.layout,
                span=int(b.span),
                group_ids=np.stack(gid_s),
                ja=np.stack(ja_s),
                as_=np.stack(as_s),
                slab_list=np.stack(sl_s),
                slab_count=np.stack(cnt_s),
                contig_start=-1,
                chunk_k=int(getattr(b, "chunk_k", 8)),
                add_into=bool(getattr(b, "add_into", False)),
                sg_slots=bool(getattr(b, "sg_slots", False)),
            )
        )

    stacked = DeviceSell(
        nrows=ng_max * GROUP_ROWS,       # uniform per-shard padded rows
        ncols=csr.ncols,
        nnz=csr.nnz,
        num_groups=ng_max + 1,           # +1 trash group
        bins=stacked_bins,
    )

    if mesh is not None:
        def put(leaf):
            spec = P(axis, *([None] * (leaf.ndim - 1)))
            return jax.device_put(jnp.asarray(leaf), NamedSharding(mesh, spec))

        stacked = jax.tree_util.tree_map(put, stacked)
    else:
        stacked = jax.tree_util.tree_map(jnp.asarray, stacked)

    return SpmdSell(
        stacked=stacked,
        shard_rows=np.asarray(shard_rows, np.int64),
        local_rows=ng_max * GROUP_ROWS,
        nrows=csr.nrows,
        ncols=csr.ncols,
        nnz=csr.nnz,
        axis=axis,
        group_bounds=np.stack([gstarts, gends], axis=1),
    )


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "interpret"))
def _spmd_run(stacked, x, *, mesh, axis, interpret):
    def local_fn(st, xl):
        dsell = jax.tree_util.tree_map(lambda a: a[0], st)
        return sell_spmv_pallas(dsell, xl, interpret=interpret)

    run = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return run(stacked, x)


def sell_spmv_spmd(spmd: SpmdSell, x, mesh: Mesh, *, interpret: bool = False):
    """y = A @ x with the Pallas kernel running SPMD over ``mesh``.

    Returns the global y in natural row order (host-side shard reassembly —
    shards' padded tails are dropped)."""
    xr = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))
    y = _spmd_run(spmd.stacked, xr, mesh=mesh, axis=spmd.axis, interpret=interpret)
    y = np.asarray(y)
    L = spmd.local_rows
    parts = [y[i * L : i * L + int(r)] for i, r in enumerate(spmd.shard_rows)]
    return np.concatenate(parts) if parts else y[:0]


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "interpret"))
def _spmd_run_spmm(stacked, x_tabs, *, mesh, axis, interpret):
    from ..ops.pallas_sell_spmm import sell_spmm_pallas

    def local_fn(st, xt):
        dsell = jax.tree_util.tree_map(lambda a: a[0], st)
        return sell_spmm_pallas(dsell, xt, interpret=interpret)

    run = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return run(stacked, x_tabs)


def sell_spmm_spmd(spmd: SpmdSell, X, mesh: Mesh, *, interpret: bool = False):
    """Y = A @ X (multi-RHS, ops/pallas_sell_spmm.py) SPMD over ``mesh``:
    rows sharded, the R stacked x-tables replicated, zero hot-loop
    collectives. Build the shards with ``sell_kwargs={"layout":
    "k-major"}`` — the SpMM kernel serves k-major bins.

    Returns the global ``(nrows, R)`` in natural row order."""
    from ..ops.pallas_sell_spmm import pack_x_multi

    xt = jax.device_put(jnp.asarray(pack_x_multi(jnp.asarray(X), spmd.ncols)),
                        NamedSharding(mesh, P()))
    y = _spmd_run_spmm(spmd.stacked, xt, mesh=mesh, axis=spmd.axis,
                       interpret=interpret)
    y = np.asarray(y)
    L = spmd.local_rows
    parts = [y[i * L : i * L + int(r)] for i, r in enumerate(spmd.shard_rows)]
    return np.concatenate(parts) if parts else y[:0]
