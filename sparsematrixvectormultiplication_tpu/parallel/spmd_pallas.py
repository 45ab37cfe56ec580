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

__all__ = ["SpmdSell", "build_spmd_sell", "sell_spmv_spmd"]

_SENTINEL = np.int32(2**30)  # k-major slab-list pad (never scanned: count=0)


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

    @property
    def n_shards(self) -> int:
        return int(self.shard_rows.size)


def _bin_key(b):
    return (b.layout, int(b.k), int(b.span), int(getattr(b, "chunk_k", 8)),
            bool(getattr(b, "add_into", False)),
            bool(getattr(b, "sg_slots", False)))


def _pad_groups(arr_list, ng_max, pad_block):
    """Stack per-shard arrays, padding each to ng_max groups with
    ``pad_block`` rows per missing group."""
    out = []
    for a in arr_list:
        ng = a.shape[0] // pad_block if pad_block else 0
        missing = ng_max - ng
        if missing > 0:
            pad = np.zeros((missing * pad_block,) + a.shape[1:], a.dtype)
            a = np.concatenate([a, pad]) if a.size else pad
        out.append(a)
    return np.stack(out)


def build_spmd_sell(
    csr: CSRMatrix,
    n_shards: int,
    *,
    dtype=jnp.float32,
    mesh: Mesh | None = None,
    axis: str = "rows",
    sell_kwargs: dict | None = None,
) -> SpmdSell:
    """Row-shard ``csr`` into ``n_shards`` group-aligned nnz-balanced ranges,
    convert each to SELL, harmonize bin structures, stack, and upload sharded
    over ``mesh``'s ``axis`` (replicated-host arrays if mesh is None)."""
    sell_kwargs = dict(sell_kwargs or {})
    num_groups = -(-csr.nrows // GROUP_ROWS) if csr.nrows else 0
    n_shards = max(1, n_shards)

    row_nnz = np.zeros(num_groups * GROUP_ROWS, dtype=np.int64)
    row_nnz[: csr.nrows] = csr.row_nnz()
    group_nnz = row_nnz.reshape(num_groups, GROUP_ROWS).sum(axis=1)
    part = list(balanced_partition(group_nnz, min(n_shards, max(num_groups, 1))))
    # shard_map needs exactly mesh-axis many shards: pad with empty ranges
    # (their bins are all-trash-group padding — harmless, uniform structure)
    while len(part) < n_shards:
        part.append((num_groups, num_groups, 0))

    sells, shard_rows = [], []
    for gs, ge, _load in part:
        r0 = gs * GROUP_ROWS
        r1 = min(ge * GROUP_ROWS, csr.nrows)
        r0 = min(r0, csr.nrows)
        p0, p1 = int(csr.row_ptr[r0]), int(csr.row_ptr[r1])
        sub = CSRMatrix(
            nrows=r1 - r0,
            ncols=csr.ncols,
            row_ptr=(csr.row_ptr[r0 : r1 + 1] - p0).astype(np.int64),
            col_idx=csr.col_idx[p0:p1],
            values=csr.values[p0:p1],
        )
        sells.append(SellMatrix.from_csr(sub, **sell_kwargs))
        shard_rows.append(r1 - r0)

    ng_max = max(max(s.num_groups, 1) for s in sells)
    trash_gid = ng_max  # groups padded onto a dedicated trash output tile
    np_dtype = np.dtype(jnp.dtype(dtype).name)

    # union of bin keys, deterministic order
    keys = []
    for s in sells:
        for b in s.bins:
            k = _bin_key(b)
            if k not in keys:
                keys.append(k)
    # add_into bins (sg far remainders) sort LAST: the chained spmv must run
    # them after the core bins whose tiles they accumulate onto
    keys.sort(key=lambda t: (t[4], t[1], t[0], t[2], t[3]))

    stacked_bins = []
    for layout, K, span, ck, add_into, sg_slots in keys:
        per_shard = []
        for s in sells:
            match = [b for b in s.bins
                     if _bin_key(b) == (layout, K, span, ck, add_into,
                                        sg_slots)]
            per_shard.append(match[0] if match else None)
        g_max = max((b.n_groups if b else 0) for b in per_shard)
        if g_max == 0:
            continue
        # k-major slab-list widths differ per shard: pad to the max
        if layout == "k-major":
            w = max((b.s_max if b else 1) for b in per_shard)
            w = max(w, 1)
        elif layout == "sb-major":
            w = SUBLANES * (K // ck)
        elif layout == "wl":
            w = SUBLANES * ck * 8  # ck carries NW for wl bins
        elif layout == "sg":
            w = K * (2 if span == 0 else 1)  # shared w0 per tile (+pass count)
        else:  # sb-list
            w = SUBLANES * (K // ck) * span

        kb = K * SUBLANES
        gids, jas, ass, lists, counts = [], [], [], [], []
        for b in per_shard:
            ng = b.n_groups if b else 0
            pad_g = g_max - ng
            gid = np.concatenate([
                np.asarray(b.group_ids, np.int32) if b else np.zeros(0, np.int32),
                np.full(pad_g, trash_gid, np.int32),
            ])
            ja = b.ja if b else np.zeros((0, LANES), np.int32)
            as_ = b.as_.astype(np_dtype) if b else np.zeros((0, LANES), np_dtype)
            if b is not None:
                sl = np.asarray(b.slab_list, np.int32)
                if sl.ndim == 1:
                    sl = sl.reshape(ng, -1)
                if sl.shape[1] < w:
                    # k-major widening pads with the in-range spare zero slab
                    # Rp-1 (the formats/sell.py convention) — the kernel's
                    # chunked loop reads ceil(count/8)*8 list entries, which
                    # stays within the shard's own (8-aligned, Rp-1-padded)
                    # width, but an in-range pad keeps any over-read harmless
                    # rather than relying on that coupling
                    if layout == "k-major":
                        R = -(-csr.ncols // LANES)
                        fillv = np.int32((R // SUBLANES + 1) * SUBLANES - 1)
                        assert sl.shape[1] % 8 == 0, \
                            "k-major slab lists must be 8-aligned"
                    else:
                        fillv = np.int32(0)
                    sl = np.concatenate(
                        [sl, np.full((ng, w - sl.shape[1]), fillv, np.int32)], axis=1
                    )
                cnt = np.asarray(b.slab_count, np.int32)
            else:
                sl = np.zeros((0, w), np.int32)
                cnt = np.zeros(0, np.int32)
            pad_list_fill = np.int32(0)  # in-range; pad groups' values are 0
            sl = np.concatenate([sl, np.full((pad_g, w), pad_list_fill, np.int32)])
            # pad slab_count: k-major loop bound 0 => no work; sb kernels use
            # the static span, count is informational
            cnt = np.concatenate([cnt, np.zeros(pad_g, np.int32)])
            gids.append(gid)
            jas.append(ja)
            ass.append(as_)
            lists.append(sl)
            counts.append(cnt)

        stacked_bins.append(
            DeviceSellBin(
                k=K,
                n_groups=g_max,
                layout=layout,
                span=span,
                group_ids=np.stack(gids),
                ja=_pad_groups(jas, g_max, kb),
                as_=_pad_groups(ass, g_max, kb),
                slab_list=np.stack(lists),
                slab_count=np.stack(counts),
                contig_start=-1,   # group ids are shard-local and padded
                chunk_k=ck,
                add_into=add_into,
                sg_slots=sg_slots,
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
