"""SPMD locality-split SpMV — the road/circuit composite under shard_map.

Row-sharded: each chip owns a contiguous group-aligned row range and runs
BOTH halves of the composite (near SELL bins + natural-order PR far tail)
locally — x is replicated, zero collectives in the hot loop, and the per
-shard outputs concatenate in natural row order.

Harmonization is almost free here, unlike the general PR case
(spmd_pr.py): the far side has EXACTLY one entry per row by construction
(formats/split.py split_csr), so every shard's K ladder is the single run
``(1, ng_max)`` and only the Beneš row count needs a shared power of two
(``min_rows`` = the max over shards). The per-shard far y length equals
the near side's padded local rows (``ng_max * 1024``), so the local
combine is one same-shape vector add.

≙ the reference's one-GPU-per-row-slice decomposition of its
thread-per-row kernel (cuda_src/csr_matrix_cuda.cu:122-148), as one SPMD
program.
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
from ..formats.pr import MAX_PR_ROWS, PRMatrix
from ..formats.sell import GROUP_ROWS, LANES, SUBLANES
from ..formats.split import split_csr
from ..ops.pallas_pr import DevicePR, pr_spmv_pallas
from ..ops.pallas_sell import sell_spmv_pallas, slab_table_rows
from .spmd_pallas import SpmdSell, build_spmd_sell

__all__ = ["SpmdSplit", "build_spmd_split", "split_spmv_spmd"]


@dataclass
class SpmdSplit:
    near: SpmdSell         # stacked SELL shards (leading n_shards axis)
    far: DevicePR          # stacked PR shards (leading n_shards axis)
    nrows: int
    ncols: int
    nnz: int
    axis: str


def build_spmd_split(csr: CSRMatrix, n_shards: int, *, dtype=jnp.float32,
                     mesh: Mesh | None = None, axis: str = "rows",
                     slab_dist="auto", sell_kwargs: dict | None = None
                     ) -> SpmdSplit:
    near_csr, pr_csr, _d, _ff = split_csr(csr, slab_dist=slab_dist)
    near = build_spmd_sell(near_csr, n_shards, dtype=dtype, mesh=mesh,
                           axis=axis, sell_kwargs=sell_kwargs)
    gb = near.group_bounds
    if gb is None or (gb[:, 0] == gb[:, 1]).any():
        raise ValueError(
            f"split SPMD needs every shard non-empty: {n_shards} shards "
            f"over {-(-csr.nrows // GROUP_ROWS)} groups")
    ng_max = near.local_rows // GROUP_ROWS

    # shared Beneš row count: per shard, source rows = sum ceil(slab
    # count / 128) over its columns; dest rows = the FORCED ladder's
    # ng_max groups x 8
    d_rows = ng_max * SUBLANES
    need = d_rows
    col = pr_csr.col_idx.astype(np.int64)
    for gs, ge in gb:
        r0, r1 = int(gs) * GROUP_ROWS, min(int(ge) * GROUP_ROWS, csr.nrows)
        cnt = np.bincount(col[r0:r1] >> 7)
        need = max(need, int((-(-cnt[cnt > 0] // LANES)).sum()))
    n_rows = 1
    while n_rows < max(need, 2):
        n_rows <<= 1

    panels = []
    for gs, ge in gb:
        r0, r1 = int(gs) * GROUP_ROWS, min(int(ge) * GROUP_ROWS, csr.nrows)
        sub = CSRMatrix(r1 - r0, csr.ncols,
                        np.arange(r1 - r0 + 1, dtype=np.int64),
                        pr_csr.col_idx[r0:r1], pr_csr.values[r0:r1])
        p = PRMatrix.from_csr(sub, k_bins=(1,),
                              force_ladder=((1, ng_max),), min_rows=n_rows,
                              max_rows=max(n_rows, MAX_PR_ROWS))
        # single-K forced ladder + uniform one-entry rows: kernel y is the
        # natural row order prefix (the composite's whole premise)
        assert p.y_pos is None or (
            p.y_pos == np.arange(r1 - r0)).all()
        panels.append(p)

    p0 = panels[0]
    assert all((p.bins, p.n_rows, p.y_rows, p.win)
               == (p0.bins, p0.n_rows, p0.y_rows, p0.win) for p in panels)
    assert p0.y_rows * LANES == near.local_rows, \
        "far kernel y length must equal the near side's padded local rows"

    def stack(get, dt):
        return np.stack([np.asarray(get(p), dt) for p in panels])

    far = DevicePR(
        nrows=p0.y_rows * LANES,  # crop=False path: length of the full y
        ncols=csr.ncols, nnz=csr.nnz,
        n_rows=p0.n_rows, win=p0.win, y_rows=p0.y_rows, bins=tuple(p0.bins),
        val=stack(lambda p: p.val, jnp.dtype(dtype)),
        md=stack(lambda p: p.md, np.int32),
        masks=stack(lambda p: p.masks, np.int32),
        final_lane=stack(lambda p: p.final_lane, np.int32),
        tile_base=stack(lambda p: p.tile_base, np.int32),
        tile_far=stack(lambda p: p.tile_far, np.int32),
        row_slab=stack(lambda p: p.row_slab, np.int32),
    )
    if mesh is not None:
        def put(leaf):
            spec = P(axis, *([None] * (leaf.ndim - 1)))
            return jax.device_put(jnp.asarray(leaf), NamedSharding(mesh, spec))
        far = jax.tree_util.tree_map(put, far)
    else:
        far = jax.tree_util.tree_map(jnp.asarray, far)

    return SpmdSplit(near=near, far=far, nrows=csr.nrows, ncols=csr.ncols,
                     nnz=csr.nnz, axis=axis)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "interpret"))
def _spmd_run_split(near_stacked, far_stacked, x_tab, *, mesh, axis,
                    interpret):
    def local_fn(ns, fs, xt):
        dsell = jax.tree_util.tree_map(lambda a: a[0], ns)
        dpr = jax.tree_util.tree_map(lambda a: a[0], fs)
        y_near = sell_spmv_pallas(dsell, xt, interpret=interpret)
        y_far = pr_spmv_pallas(dpr, xt, interpret=interpret, crop=False)
        return y_near + y_far

    run = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return run(near_stacked, far_stacked, x_tab)


def split_spmv_spmd(spmd: SpmdSplit, x, mesh: Mesh, *,
                    interpret: bool = False):
    """``y = A @ x`` with the locality-split composite SPMD over ``mesh``.

    Returns y in natural row order (host-side shard reassembly)."""
    dt = spmd.far.val.dtype
    Rp = slab_table_rows(spmd.ncols)
    xp = np.zeros(Rp * LANES, np.dtype(dt))
    xp[: spmd.ncols] = np.asarray(x, np.dtype(dt))[: spmd.ncols]
    Xr = jax.device_put(xp.reshape(Rp, LANES), NamedSharding(mesh, P()))

    y = np.asarray(_spmd_run_split(spmd.near.stacked, spmd.far, Xr,
                                   mesh=mesh, axis=spmd.axis,
                                   interpret=interpret))
    L = spmd.near.local_rows
    parts = [y[i * L : i * L + int(r)]
             for i, r in enumerate(spmd.near.shard_rows)]
    return np.concatenate(parts) if parts else y[:0]
