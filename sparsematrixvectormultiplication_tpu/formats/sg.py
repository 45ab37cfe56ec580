"""SG layout — the scattered/short-row SpMV layout (host-side profile/emit).

TPU-native answer to the reference's CUDA *thread-per-row* kernel
(cuda_src/csr_matrix_cuda.cu:122-148), which wins on scattered short-row
matrices (webbase-1M 15.08 GF, roadNet-PA 31.55 GF — result/result_cuda.csv).
The SELL k-major kernel serves those regimes by looping over a group's
distinct x-slabs — ~1,000-8,000 masked passes per 1024-row group for rows
with 1-8 entries, so work scales with the *slab count*, not the entry count.
SG makes work scale with entries:

Layout (per 1024-row group, rows at (sigma, lane) = (row%1024)//128, row%128):

* Entries of each 128-row block (``sigma``) are sorted by column and packed
  greedily into ``T`` tiles of (8, 128): an entry destined for row
  (sigma, lane) sits at position (tile, sigma, lane) — **the scatter is
  free**: each tile's masked-gather products add straight onto the group's
  (8,128) y tile. The only constraint is one entry per (tile, lane) within
  a block, resolved by a vectorized greedy fixpoint (same-lane entries spill
  to later tiles, staying nearly column-sorted).
* Each (tile, sigma) cell's 128 entries are column-adjacent, so they fit a
  small x-slab *window*: the kernel broadcasts rows ``w0[cell] + v`` of the
  VMEM x-table for ``v < passes(tile)`` and lane-gathers under a
  ``doff == v`` mask (doff = entry slab - w0, packed with the lane index m
  into one int32 plane: ``md = doff*128 + m`` — 8 B/entry total).
* Entries too isolated for any window (graph long-links, power-law tails:
  fewer than _FAR_DENSITY neighbors within +-_FAR_RADIUS slabs in their
  block) are split into a *far* sub-matrix emitted as k-major bins that
  ACCUMULATE onto the same groups' y tiles (SellBin.add_into).

The kernel (ops/pallas_sell.py _kernel_sg) unrolls passes statically for
bins whose max window fits _MAX_STATIC_SPAN, and otherwise rolls a chunked
fori (8 passes per iteration, per-tile pass counts scalar-prefetched) — the
same rolled-chunk pattern as the k-major kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["SgProfile", "sg_profile", "SG_DYNAMIC"]

LANES = 128
SUBLANES = 8
GROUP_ROWS = LANES * SUBLANES

# far-split rule: an entry is "far" when fewer than _FAR_DENSITY of its
# block's entries (incl. itself) lie within +-_FAR_RADIUS slabs — such
# entries cannot share a gather window with 127 neighbors and would inflate
# every cell they touch (road_like: 5% long links poison 60% of cells).
_FAR_RADIUS = 24
_FAR_DENSITY = 12
_MAX_FIXPOINT_ITERS = 64
# refinement (ONE shed round): entries of over-wide cells go far when they
# are either genuine outliers (beyond cap/2 of the cell median) or sit in
# collision-spill tiles past the block's column-ideal tile count — the tiles
# that hold deep-rank leftovers with diffuse columns (uniform-random rows).
# A single round avoids the shed->repack->new-wide-cells cascade; leftover
# wide cells land in dynamic-pass bins instead.
_SPAN_CAP = 40
_REFINE_ROUNDS = 2

SG_DYNAMIC = 0  # SellBin.span value marking the dynamic-pass-count kernel


@dataclass
class SgProfile:
    """Global SG assignment for all groups of one matrix (core entries) plus
    the far remainder. All per-entry arrays are aligned and ordered by
    (block, column)."""

    # core entries (ordered by block, col)
    e_group: np.ndarray      # (nc,) group id
    e_flatrow: np.ndarray    # (nc,) t*8 + sigma within the group's (T*8,128)
    e_lane: np.ndarray       # (nc,) dest lane
    e_md: np.ndarray         # (nc,) int32 packed doff*128 + m
    e_val: np.ndarray        # (nc,) values (host dtype)
    # per-group / per-cell geometry
    T_g: np.ndarray          # (num_groups,) tiles per group (>=1)
    w0: np.ndarray           # (num_groups, T_max, 8) int32 window bases
    passes: np.ndarray       # (num_groups, T_max) int32 per-tile pass counts
    V_g: np.ndarray          # (num_groups,) max pass count per group
    vregs_g: np.ndarray      # (num_groups,) modeled core vector-op cost
    core_frac_g: np.ndarray  # (num_groups,) core entry fraction
    core_count_g: np.ndarray  # (num_groups,) core entries per group
    # far remainder (CSR-order triplets)
    far_rows: np.ndarray
    far_cols: np.ndarray
    far_vals: np.ndarray

    @property
    def t_max(self) -> int:
        return int(self.w0.shape[1])


def _assign_tiles(lane_key: np.ndarray, grank: np.ndarray,
                  ideal_e: np.ndarray):
    """Greedy tile assignment, vectorized fixpoint.

    ``lane_key`` is a composite (block*128 + lane) so all blocks resolve in
    one pass; ``grank`` is the entry's within-block column rank; ``ideal_e``
    the block's column-ideal tile count (ceil(entries/128)) per entry.

    Seed: the column-ideal tile ``grank // 128``, lower-bounded by a
    QUANTILE-ALIGNED row rank ``krank * idealT / c_row`` — a fat row's k-th
    entry sits at column quantile k/c_row, so rescaling its rank to the tile
    scale keeps its seed aligned with the columns resident in that tile
    (plain krank systematically over-jumps for rows denser than average,
    mixing column quantiles and blowing cell windows — measured on
    uniform-random). Rows much denser than the block average (heavy-row
    segments) keep plain krank: they need that many tiles anyway and the
    rescaled seed would cascade through the collision fixpoint. Collisions
    then bump by occurrence until none remain — monotone, hence terminating;
    the iteration cap only guards pathologies, falling back to the
    always-valid within-lane rank."""
    n = lane_key.size
    if n == 0:
        return np.zeros(0, np.int64)
    sidx = np.lexsort((np.arange(n), lane_key))
    ls = lane_key[sidx]
    new = np.ones(n, bool)
    new[1:] = ls[1:] != ls[:-1]
    starts = np.flatnonzero(new)
    run_id = np.cumsum(new) - 1
    run_len = np.diff(np.concatenate([starts, [n]]))
    krank = np.empty(n, np.int64)
    krank[sidx] = np.arange(n) - starts[run_id]
    c_row = np.empty(n, np.int64)
    c_row[sidx] = run_len[run_id]
    kq = krank * ideal_e // np.maximum(c_row, 1)
    rank_seed = np.where(c_row > 2 * ideal_e, krank, kq)
    t = np.maximum(rank_seed, grank // LANES)
    for _ in range(_MAX_FIXPOINT_ITERS):
        key = lane_key * np.int64(t.max() + 2) + t
        sidx = np.lexsort((np.arange(n), key))
        ks = key[sidx]
        new = np.ones(n, bool)
        new[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        bump = np.arange(n) - starts[run_id]
        if not bump.any():
            return t
        tb = t.copy()
        tb[sidx] = t[sidx] + bump
        t = tb
    return krank  # guaranteed collision-free fallback


def sg_profile(
    rows_of_entries: np.ndarray,
    col_idx: np.ndarray,
    values: np.ndarray,
    num_groups: int,
    Rp: int,
    *,
    far_radius: int = _FAR_RADIUS,
    far_density: int = _FAR_DENSITY,
) -> SgProfile:
    """Compute the global SG assignment (one pass over all groups).

    Entries must be in CSR order. ``Rp`` is the padded x-table row count
    (window bases are clamped so ``w0 + passes <= Rp``)."""
    nnz = rows_of_entries.size
    rows = rows_of_entries.astype(np.int64)
    cols = col_idx.astype(np.int64)
    slab = cols >> 7
    blk = rows >> 7

    # ---- far split: per-block slab-density test ----
    order = np.lexsort((slab, blk))
    blk_o = blk[order]
    slab_o = slab[order]
    # neighbors within +-far_radius slabs inside the OWN block: search on a
    # block-strided composite key (globally sorted by construction); the
    # stride leaves a gap wider than the radius so searches never bleed into
    # neighboring blocks
    stride = np.int64(Rp + 2 * far_radius + 2)
    key = blk_o * stride + slab_o
    left = np.searchsorted(key, blk_o * stride + slab_o - far_radius,
                           side="left")
    right = np.searchsorted(key, blk_o * stride + slab_o + far_radius,
                            side="right")
    dens = right - left
    far_o = dens < far_density

    # ---- core assignment (per block, column order), with span refinement:
    # cells wider than the static-unroll budget shed outliers to `far` and
    # the packing is redone (the far set only grows -> terminates) ----
    keep = ~far_o
    for _round in range(_REFINE_ROUNDS):
        blk_c = blk_o[keep]
        slab_c = slab_o[keep]
        src_c = order[keep]          # CSR position of each core entry
        nc = blk_c.size
        new = np.ones(nc, bool) if nc else np.zeros(0, bool)
        if nc:
            new[1:] = blk_c[1:] != blk_c[:-1]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1 if nc else new.astype(np.int64)
        within = np.arange(nc) - starts[run_id] if nc else np.zeros(0, np.int64)
        lane_c = rows[src_c] & (LANES - 1)
        blk_len = np.diff(np.concatenate([starts, [nc]])) if nc else starts
        ideal_e = -(-blk_len[run_id] // LANES) if nc else within
        t_c = _assign_tiles(blk_c * LANES + lane_c, within, ideal_e)

        g_c = blk_c >> 3
        sig_c = blk_c & 7

        T_g = np.ones(num_groups, np.int64)
        if nc:
            np.maximum.at(T_g, g_c, t_c + 1)
        t_max = int(T_g.max()) if num_groups else 1

        # per-cell windows: w0[g, t, sigma], passes[g, t]
        w0 = np.full((num_groups, t_max, SUBLANES), Rp - 1, np.int64)
        cmax = np.zeros((num_groups, t_max, SUBLANES), np.int64)
        cell = np.zeros(0, np.int64)
        if nc:
            cell = (g_c * t_max + t_c) * SUBLANES + sig_c
            w0_flat = np.full(num_groups * t_max * SUBLANES, np.int64(Rp - 1))
            np.minimum.at(w0_flat, cell, slab_c)
            cm_flat = np.zeros(num_groups * t_max * SUBLANES, np.int64)
            np.maximum.at(cm_flat, cell, slab_c)
            w0 = w0_flat.reshape(num_groups, t_max, SUBLANES)
            cmax = cm_flat.reshape(num_groups, t_max, SUBLANES)

        if _round == _REFINE_ROUNDS - 1 or nc == 0:
            break
        span_c = (cmax - w0 + 1).reshape(-1)[cell]  # per-entry cell span
        if span_c.max(initial=0) <= _SPAN_CAP:
            break
        # per-cell median slab (outlier threshold anchor)
        o2 = np.lexsort((slab_c, cell))
        cs = cell[o2]
        newc = np.ones(nc, bool)
        newc[1:] = cs[1:] != cs[:-1]
        cstart = np.flatnonzero(newc)
        crun = np.cumsum(newc) - 1
        ccnt = np.diff(np.concatenate([cstart, [nc]]))
        med_sorted = slab_c[o2][cstart + ccnt // 2]
        med_c = np.empty(nc, np.int64)
        med_c[o2] = med_sorted[crun]
        # block's column-ideal tile count (entries/128): tiles past it + a
        # margin exist only from rank/collision spill
        cnt_blk = np.bincount(blk_c, minlength=num_groups * SUBLANES)
        ideal_blk = -(-cnt_blk // LANES)
        offender = (span_c > _SPAN_CAP) & (
            (np.abs(slab_c - med_c) > _SPAN_CAP // 2)
            | (t_c >= ideal_blk[blk_c] + 2)
        )
        if not offender.any():
            break
        keep_idx = np.flatnonzero(keep)
        keep[keep_idx[offender]] = False

    far_o = ~keep
    inv_order = np.empty(nnz, np.int64)
    inv_order[order] = np.arange(nnz)
    far = far_o[inv_order]  # CSR-order mask

    far_rows = rows_of_entries[far]
    far_cols = col_idx[far]
    far_vals = values[far]
    # pass count per tile = max over its cells of (cmax - w0 + 1); empty
    # cells (w0 = Rp-1, cmax = 0) contribute <= 0 -> at least 1
    span_cell = np.maximum(cmax - w0 + 1, 0)
    passes = np.maximum(span_cell.max(axis=2), 1).astype(np.int32)
    # clamp w0 so every scanned row stays inside the x table
    w0 = np.minimum(w0, np.maximum(Rp - passes[:, :, None], 0)).astype(np.int32)

    e_md = np.zeros(nc, np.int32)
    if nc:
        doff = slab_c - w0[g_c, t_c, sig_c]
        m = cols[src_c] & (LANES - 1)
        e_md = (doff * LANES + m).astype(np.int32)

    V_g = passes.max(axis=1).astype(np.int64) if t_max else np.ones(num_groups, np.int64)
    # modeled vector-op cost per group: per real tile, 13 vregs per pass
    # (8 scalar-driven W rows + stack + gather + mask-acc) + 10 fixed
    pass_sum = np.zeros(num_groups, np.int64)
    if t_max:
        # count only tiles t < T_g (padding tiles cost ~1 pass each)
        tidx = np.broadcast_to(np.arange(t_max)[None, :], passes.shape)
        real = tidx < T_g[:, None]
        pass_sum = np.where(real, -(-passes.astype(np.int64) // 8) * 8, 0).sum(axis=1)
    vregs_g = 13 * pass_sum + 10 * T_g

    group_nnz = np.bincount(rows >> 10, minlength=num_groups) if nnz else np.zeros(num_groups, np.int64)
    core_per_g = np.bincount(g_c, minlength=num_groups) if nc else np.zeros(num_groups, np.int64)
    core_frac_g = core_per_g / np.maximum(group_nnz, 1)

    return SgProfile(
        e_group=g_c,
        e_flatrow=(t_c * SUBLANES + sig_c),
        e_lane=lane_c,
        e_md=e_md,
        e_val=values[src_c],
        T_g=T_g,
        w0=w0,
        passes=passes,
        V_g=V_g,
        vregs_g=vregs_g,
        core_frac_g=core_frac_g,
        core_count_g=core_per_g,
        far_rows=far_rows,
        far_cols=far_cols,
        far_vals=far_vals,
    )


# quantization ladders for bin-static kernel shapes
_T_LADDER = tuple(range(1, 9)) + (10, 12, 14, 16, 20, 24, 32, 40, 48, 64,
                                  96, 128, 192, 256, 384, 512, 768, 1024)
_V_LADDER = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 40)


def quantize_T(T: np.ndarray) -> np.ndarray:
    edges = np.asarray(_T_LADDER, np.int64)
    idx = np.searchsorted(edges, T, side="left")
    idx = np.minimum(idx, edges.size - 1)
    return np.where(T <= edges[-1], edges[idx], T)


def quantize_V(V: np.ndarray, max_static: int) -> np.ndarray:
    """Quantize pass counts to the static ladder; beyond ``max_static``
    returns SG_DYNAMIC (0) marking the dynamic-pass kernel."""
    edges = np.asarray([v for v in _V_LADDER if v <= max_static], np.int64)
    idx = np.minimum(np.searchsorted(edges, V, side="left"), edges.size - 1)
    return np.where(V <= edges[-1], edges[idx], SG_DYNAMIC)


def emit_sg_core(prof: SgProfile, gsub: np.ndarray, Tq: int, Vq: int,
                 Rp: int, value_dtype) -> dict:
    """Build one SG core bin's arrays for groups ``gsub`` padded to ``Tq``
    tiles. Returns SellBin kwargs (the caller wraps — avoids a circular
    import with formats.sell).

    ``Vq > 0``: static kernel; slab_list = (ng, Tq*8) w0 bases, scan = Vq.
    ``Vq == SG_DYNAMIC``: dynamic kernel; slab_list = (ng, Tq*9) with
    per-tile layout [8 x w0, pass count rounded up to 8]."""
    gsub = np.asarray(gsub)
    ng = gsub.size
    ginv_arr = np.full(int(prof.T_g.size), -1, np.int64)
    ginv_arr[gsub] = np.arange(ng)

    t_max = prof.t_max
    assert Tq >= int(prof.T_g[gsub].max()), "cluster Tq below a group's T"
    dyn = Vq == SG_DYNAMIC
    stride = 9 if dyn else 8

    # per-cell scan length & clamped bases for THIS bin's static shape
    Tb = min(Tq, t_max)
    w0b = prof.w0[gsub][:, :Tb]  # (ng, Tb, 8)
    passes = prof.passes[gsub][:, :Tb].astype(np.int64)    # (ng, Tb)
    if dyn:
        scan = -(-passes // 8) * 8
    else:
        scan = np.full_like(passes, Vq)
    w0c = np.minimum(w0b.astype(np.int64),
                     np.maximum(Rp - scan[:, :, None], 0))
    delta = w0b.astype(np.int64) - w0c                      # (ng, Tb, 8) >= 0

    ja = np.zeros((ng, Tq, SUBLANES, LANES), np.int32)
    as_ = np.zeros((ng, Tq, SUBLANES, LANES), value_dtype)

    sel = ginv_arr[prof.e_group] >= 0
    if np.any(sel):
        gl = ginv_arr[prof.e_group[sel]]
        fr = prof.e_flatrow[sel]
        t = fr // SUBLANES
        sig = fr - t * SUBLANES
        md = prof.e_md[sel].astype(np.int64) + delta[gl, t, sig] * LANES
        ja[gl, t, sig, prof.e_lane[sel]] = md.astype(np.int32)
        as_[gl, t, sig, prof.e_lane[sel]] = prof.e_val[sel].astype(value_dtype)

    # slab table
    w0_full = np.full((ng, Tq, SUBLANES), Rp - (Vq if not dyn else 8), np.int32)
    w0_full = np.maximum(w0_full, 0)
    w0_full[:, :Tb] = w0c.astype(np.int32)
    if dyn:
        tab = np.zeros((ng, Tq, stride), np.int32)
        tab[:, :, :8] = w0_full
        tab[:, :Tb, 8] = scan.astype(np.int32)
        tab[:, Tb:, 8] = 0  # padding tiles: zero passes (loop bound 0)
    else:
        tab = w0_full

    real = int(prof.core_count_g[gsub].sum())
    vregs = int(prof.vregs_g[gsub].sum())
    return dict(
        k=int(Tq),
        layout="sg",
        group_ids=gsub.astype(np.int32),
        ja=ja.reshape(-1, LANES),
        as_=as_.reshape(-1, LANES),
        slab_list=np.ascontiguousarray(tab.reshape(ng, -1)),
        slab_count=prof.V_g[gsub].astype(np.int32),
        real_nnz=real,
        span=int(Vq),
        cost_passes=vregs,
    )

