"""SPMD PR SpMV — the zero-locality kernel under ``shard_map``.

Multi-chip coverage for the scattered-regime headline kernel
(ops/pallas_pr.py). PR panels are independent Beneš problems, so the
natural multi-chip decomposition is panel-parallel: shard the panel list
over a mesh axis, replicate the x table, and run the SAME Pallas program
on every chip — zero collectives in the hot loop (y assembly is the
host-side unpermute that every PR call already does).

``shard_map`` needs one program, so panels must share their STATIC
geometry (Beneš row count, K-bin ladder, y length). That is built by
construction: ``build_spmd_pr`` computes every chunk's natural K ladder,
unions them (per-K max group count), and converts each chunk with
``PRMatrix.from_csr(force_ladder=union, min_rows=union_pow2)`` —
padding groups dummy-fill exactly like natural group tails, and real
rows' kernel positions ride in each panel's ``y_pos``.

Same leading-shard-axis idiom as spmd_bsr.py: every DevicePR leaf gains
a ``(n_shards, panels_per_shard, ...)`` prefix, ``device_put`` with
``P(axis)`` lays shards onto chips, the body peels ``leaf[0, i]``.

≙ the reference's one-GPU-per-row-slice decomposition of its scattered
kernels (cuda_src/csr_matrix_cuda.cu:122-148), but as one SPMD program.
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
from ..formats.pr import MAX_PR_ROWS, PRMatrix, _sub_csr
from ..formats.sell import DEFAULT_K_BINS, GROUP_ROWS, LANES, SUBLANES
from ..ops.pallas_pr import DevicePR, pr_spmv_pallas

__all__ = ["SpmdPR", "build_spmd_pr", "pr_spmv_spmd"]


@dataclass
class SpmdPR:
    stacked: DevicePR        # leaves carry (n_shards, pps, ...) prefixes
    chunk_rows: tuple        # natural row ids per chunk (chunk-local order)
    y_pos: tuple             # kernel y position per chunk row
    pps: int                 # panels per shard
    y_len: int               # kernel y length per panel
    nrows: int
    ncols: int
    axis: str


def _chunk_ladders(csr: CSRMatrix, order: np.ndarray, bounds: list,
                   k_bins: tuple):
    """Per-chunk (ladder dict K->groups, s_rows) — the cheap dest/src
    geometry pass of PRMatrix.from_csr, without any routing."""
    edges = np.asarray(sorted({int(k) for k in k_bins}), dtype=np.int64)
    nnz_per_row = np.diff(csr.row_ptr).astype(np.int64)
    R = -(-csr.ncols // LANES)
    out = []
    for lo, hi in bounds:
        rows = order[lo:hi]
        glen = nnz_per_row[rows]
        ladder = {}
        for g0 in range(0, rows.size, GROUP_ROWS):
            gmax = int(glen[g0:g0 + GROUP_ROWS].max())
            bigger = edges[edges >= max(gmax, 1)]
            K = int(bigger[0]) if bigger.size else -(-gmax // 8) * 8
            ladder[K] = ladder.get(K, 0) + 1
        idx = np.concatenate(
            [csr.col_idx[csr.row_ptr[r]:csr.row_ptr[r + 1]] for r in rows]
        ) if rows.size else np.empty(0, np.int64)
        cnt = np.bincount(np.asarray(idx, np.int64) >> 7, minlength=R)
        s_rows = int((-(-cnt[cnt > 0] // LANES)).sum())
        out.append((ladder, s_rows))
    return out


def build_spmd_pr(csr: CSRMatrix, n_shards: int, *, mesh: Mesh | None = None,
                  axis: str = "rows", k_bins: tuple = DEFAULT_K_BINS,
                  target_rows: int = 1 << 14, dtype=jnp.float32,
                  native: bool = True) -> SpmdPR:
    """Convert ``csr`` (heavy-rows pre-split, as for any PR conversion)
    into ``n_shards * pps`` geometry-identical PR panels.

    ``target_rows`` defaults to the dd cap (2^14): the worker's compile
    helper is proven on that panel size (sweep_r3 Aug 19)."""
    if csr.nnz == 0:
        raise ValueError("SPMD PR needs at least one entry")
    nnz_per_row = np.diff(csr.row_ptr).astype(np.int64)
    order = np.argsort(-nnz_per_row, kind="stable").astype(np.int64)
    centry = np.cumsum(nnz_per_row[order])

    pps = 1
    best_rows, stale = None, 0
    while True:
        C = n_shards * pps
        # equal-entry chunk bounds at row granularity (sigma order)
        targets = (np.arange(1, C + 1) * csr.nnz) // C
        cut = np.searchsorted(centry, targets, side="left") + 1
        cut = np.minimum(cut, csr.nrows)
        bounds, lo = [], 0
        for hi in cut:
            hi = max(int(hi), lo + 1) if lo < csr.nrows else lo
            bounds.append((lo, hi))
            lo = hi
        bounds[-1] = (bounds[-1][0], csr.nrows)
        geom = _chunk_ladders(csr, order, bounds, k_bins)
        union = {}
        for ladder, _ in geom:
            for K, c in ladder.items():
                union[K] = max(union.get(K, 0), c)
        d_rows = sum(K * SUBLANES * c for K, c in union.items())
        need = max(d_rows, max(s for _, s in geom), 2)
        n_rows = 1
        while n_rows < need:
            n_rows <<= 1
        if n_rows <= min(target_rows, MAX_PR_ROWS):
            break
        # the union ladder has a floor (one group per K level): stop as
        # soon as growing the panel count stops shrinking the geometry
        if best_rows is not None and n_rows >= best_rows:
            stale += 1
        else:
            best_rows, stale = n_rows, 0
        if stale >= 3 or n_shards * (pps + 1) > 4096:
            raise ValueError(
                f"SPMD PR: target_rows={target_rows} is below this "
                f"matrix's union-ladder floor (~{best_rows or n_rows} "
                "Beneš rows); raise target_rows")
        pps += 1

    force_ladder = tuple(sorted(union.items(), key=lambda t: -t[0]))
    panels, chunk_rows = [], []
    for lo, hi in bounds:
        rows = order[lo:hi]
        sub = _sub_csr(csr, rows)
        panels.append(PRMatrix.from_csr(
            sub, k_bins=k_bins, native=native, force_ladder=force_ladder,
            min_rows=n_rows, max_rows=max(n_rows, MAX_PR_ROWS)))
        chunk_rows.append(rows)

    p0 = panels[0]
    assert all((p.bins, p.n_rows, p.y_rows, p.win)
               == (p0.bins, p0.n_rows, p0.y_rows, p0.win) for p in panels), \
        "force_ladder harmonization must make panels geometry-identical"

    def stack(get, dt):
        a = np.stack([np.asarray(get(p), dt) for p in panels])
        return a.reshape((n_shards, pps) + a.shape[1:])

    stacked = DevicePR(
        # aux nrows/nnz are never read on the crop=False SPMD path; nrows
        # is set to the full kernel y length so an accidental crop is
        # harmless rather than wrong
        nrows=p0.y_rows * LANES, ncols=csr.ncols, nnz=csr.nnz,
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
        stacked = jax.tree_util.tree_map(put, stacked)
    else:
        stacked = jax.tree_util.tree_map(jnp.asarray, stacked)

    return SpmdPR(stacked=stacked, chunk_rows=tuple(chunk_rows),
                  y_pos=tuple(p.y_pos for p in panels), pps=pps,
                  y_len=p0.y_rows * LANES, nrows=csr.nrows, ncols=csr.ncols,
                  axis=axis)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "pps",
                                             "interpret"))
def _spmd_run(stacked, x_tab, *, mesh, axis, pps, interpret):
    def local_fn(st, xl):
        outs = []
        for i in range(pps):
            d = jax.tree_util.tree_map(lambda a: a[0, i], st)
            outs.append(pr_spmv_pallas(d, xl, interpret=interpret,
                                       crop=False))
        return jnp.stack(outs)[None]        # (1, pps, y_len)

    run = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return run(stacked, x_tab)


def pr_spmv_spmd(spmd: SpmdPR, x, mesh: Mesh, *, interpret: bool = False):
    """``y = A @ x`` with the PR kernel running SPMD over ``mesh``.

    ``x`` is the dense vector (replicated); packed to the (Rp, 128) slab
    table HOST-side (in-jit reshapes of device arrays are HBM relayouts,
    docs/DESIGN.md). Returns y in natural row order (host assembly —
    the same unpermute every PR call does)."""
    from ..ops.pallas_sell import slab_table_rows

    dt = spmd.stacked.val.dtype
    Rp = slab_table_rows(spmd.ncols)
    xp = np.zeros(Rp * LANES, np.dtype(dt))
    xp[:spmd.ncols] = np.asarray(x, np.dtype(dt))[:spmd.ncols]
    Xr = jax.device_put(xp.reshape(Rp, LANES), NamedSharding(mesh, P()))

    Y = np.asarray(_spmd_run(spmd.stacked, Xr, mesh=mesh, axis=spmd.axis,
                             pps=spmd.pps, interpret=interpret))
    Y = Y.reshape(-1, spmd.y_len)
    out = np.zeros(spmd.nrows, Y.dtype)
    for c, (rows, ypos) in enumerate(zip(spmd.chunk_rows, spmd.y_pos)):
        out[rows] = Y[c][ypos]
    return out
