"""SG layout — the scattered/short-row SpMV layout (host-side profile/emit).

TPU-native answer to the reference's CUDA *thread-per-row* kernel
(cuda_src/csr_matrix_cuda.cu:122-148), which wins on scattered short-row
matrices (webbase-1M 15.08 GF, roadNet-PA 31.55 GF — result/result_cuda.csv).
The SELL k-major kernel serves those regimes by looping over a group's
distinct x-slabs — ~1,000-8,000 masked passes per 1024-row group for rows
with 1-8 entries, so work scales with the *slab count*, not the entry count.
SG makes work scale with entries, via **shared-window tiles**:

Layout (per 1024-row group; rows at (sigma, lane) = ((row%1024)//128, row%128)):

* The group's entries are sorted by column and cut into **windows** of
  ~768 entries by global column rank — a deterministic quantile cut, so
  hot column regions get narrow windows and diffuse regions wide ones
  with no order-statistics variance. An entry lands at position
  (tile, sigma, lane) of the (T*8, 128) entry planes — **the scatter is
  free**: each tile's masked-gather products add straight onto the
  group's (8,128) y tile. The one constraint (≤ 1 entry per (row, tile))
  is kept by **layers**: a window's k-th same-row conflict opens layer
  tile k over the SAME window (tile = window offset + occurrence rank
  within (row, window)), so a tile's slab span is always bounded by its
  window's span. (Forward spill instead of layering is a critical queue
  at ~1 entry/row/window and poisons later windows — measured V inflation
  23 -> 378 slabs on uniform-random.) Heavy rows must be pre-split with
  ``CSRMatrix.split_heavy_rows(cap, strided=True)`` so no row is locally
  denser than ~1 entry per window.
* Each tile has ONE shared x-slab window ``[w0, w0+V)`` (w0 = min slab of
  its entries). The kernel loads the window in (8,128) chunks and, per
  pass ``v``, broadcasts one row and lane-gathers under a ``doff == v``
  mask (``ja`` packs ``md = doff*128 + m`` — 8 B/entry total). Work is
  ~4 vector ops per pass shared by up to 1024 entries.
* **Profit-rule shed**: a tile whose span exceeds ``_SPAN_CAP`` finds its
  best cap-wide window (vectorized searchsorted) and sheds the entries
  outside it to a *far* sub-matrix — but only when the pass savings beat
  the far cost (``4*(V-cap) > 5*n_out``), so road's 5% long links shed
  while a full uniform tile spanning 60 slabs stays whole. Far entries
  are emitted as k-major bins that ACCUMULATE onto the same groups' y
  tiles (SellBin.add_into).

The kernel (ops/pallas_sell.py _kernel_sg) unrolls passes statically for
bins whose max window fits the static ladder, and otherwise rolls a chunked
fori (8 passes per iteration, per-tile pass counts scalar-prefetched) — so
empty or narrow tiles cost ~nothing in dynamic bins.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["SgProfile", "sg_profile", "SG_DYNAMIC"]

LANES = 128
SUBLANES = 8
GROUP_ROWS = LANES * SUBLANES

# shared-window tile geometry. 768 (not 1024): the window cut must leave
# slack below tile capacity so same-row conflicts resolve in shallow layers
# (~λ=0.75 occupancy per row per window on uniform-random)
_TILE_ENTRIES = 768
# shed target: best cap-wide window per wide tile. MUST be <= the static
# ladder's top (_V_LADDER[-1] == sell._MAX_STATIC_SPAN): shed output one
# slab past the static max lands the whole group in the 6x-slower rolled
# dynamic kernel (measured: road bin span=0 1.39 ms vs span=4 0.22 ms for
# the same entry count)
_SPAN_CAP = 40
_SHED_ROUNDS = 2         # shed -> repack rounds (far set only grows)
# profit rule: shed when 4*(V-cap) > _FAR_COST_PER_ENTRY*n_out + margin.
# The far remainder is served by K-binned k-major add_into bins: most far
# rows hold 1-2 entries, so the slab scan costs ~5-6 ops per far entry
# (TPU-measured after the K-binned far emission; an unbinned K=max far bin
# multiplied every slab pass by the worst row and cost 12-24/entry).
_FAR_COST_PER_ENTRY = 6
_SHED_MARGIN = 16

SG_DYNAMIC = 0  # SellBin.span value marking the dynamic-pass-count kernel

_BIG = np.int64(1) << 21  # per-row offset stride for the segmented cummax


@dataclass
class SgProfile:
    """Global SG assignment for all groups of one matrix (core entries) plus
    the far remainder. Per-entry arrays are ordered by (group, col)."""

    # core entries
    e_group: np.ndarray      # (nc,) group id
    e_flatrow: np.ndarray    # (nc,) t*8 + sigma within the group's (T*8,128)
    e_lane: np.ndarray       # (nc,) dest lane
    e_md: np.ndarray         # (nc,) int32 packed doff*128 + m
    e_val: np.ndarray        # (nc,) values (host dtype)
    # per-group / per-tile geometry
    T_g: np.ndarray          # (num_groups,) tiles per group (>=1)
    w0: np.ndarray           # (num_groups, T_max) int32 shared window bases
    passes: np.ndarray       # (num_groups, T_max) int32 per-tile pass counts
    V_g: np.ndarray          # (num_groups,) max pass count per group
    vregs_g: np.ndarray      # (num_groups,) modeled core vector-op cost
    core_frac_g: np.ndarray  # (num_groups,) core entry fraction
    core_count_g: np.ndarray  # (num_groups,) core entries per group
    # far remainder (CSR-order triplets)
    far_rows: np.ndarray
    far_cols: np.ndarray
    far_vals: np.ndarray
    slots: bool = True  # free-slot positions (f32) vs row-unique (dd)

    @property
    def t_max(self) -> int:
        return int(self.w0.shape[1])


def _pack_round(rows, cols, num_groups, slots=True):
    """One packing round over the kept entries (CSR-order arrays): returns
    ``(t, pos)`` — tile id and sublane position per entry (CSR-order).

    Windows cut by global column quantile per group
    (``window = colrank // _TILE_ENTRIES``), so hot column regions get
    narrow windows and diffuse regions wide ones with no variance; a tile's
    slab span is always bounded by its window's span. (Forward conflict
    spill instead is a critical queue at ~1 entry/row/window and poisons
    later windows; measured V inflation 23 -> 378 slabs on uniform-random.)

    ``slots=True`` (f32 kernels): position = (slot, lane) with the sublane
    slot FREE — slot = occurrence rank within (window, lane), overflow past
    8 opens layer tiles. Same-row repeats and all 8 sigma-rows of a lane
    share one tile; the kernel recovers the destination row by a per-tile
    sigma-reduction over ``md``'s sigma bits.

    ``slots=False`` (dd kernels, whose error-free transforms need ≤ 1
    product per output position — selection stays exact): position =
    (sigma, lane) = the destination row; layer = occurrence rank within
    (row, window)."""
    n = rows.size
    if not n:
        z = np.zeros(0, np.int64)
        return z, z
    g = rows >> 10
    # global column rank within each group (single composite key; stable
    # sort keeps CSR row order within (group, col) ties)
    ncols_key = cols.max() + 2
    order = np.argsort(g * ncols_key + cols, kind="stable")
    colrank = np.empty(n, np.int64)
    go = g[order]
    new = np.ones(n, bool)
    new[1:] = go[1:] != go[:-1]
    starts = np.flatnonzero(new)
    run_id = np.cumsum(new) - 1
    colrank[order] = np.arange(n) - starts[run_id]
    b = colrank // _TILE_ENTRIES
    B_max = int(b.max()) + 1
    gb = g * B_max + b
    if slots:
        # slot = occurrence rank within (window, lane); layer = slot // 8
        lane = rows & (LANES - 1)
        key = gb * LANES + lane
        o2 = np.argsort(key, kind="stable")
        ks = key[o2]
        newk = np.ones(n, bool)
        newk[1:] = ks[1:] != ks[:-1]
        kstarts = np.flatnonzero(newk)
        krun = np.cumsum(newk) - 1
        slot = np.empty(n, np.int64)
        slot[o2] = np.arange(n) - kstarts[krun]
        layer = slot // SUBLANES
        pos = slot - layer * SUBLANES
    else:
        # layer = occurrence rank within (row, window): within a row (CSR
        # order) columns ascend, so windows are non-decreasing: run ranks
        key_rb = rows * _BIG + b
        newk = np.ones(n, bool)
        newk[1:] = key_rb[1:] != key_rb[:-1]
        kstarts = np.flatnonzero(newk)
        krun = np.cumsum(newk) - 1
        layer = np.arange(n) - kstarts[krun]
        pos = (rows >> 7) & 7
    # tile index within group = windows-so-far offset + layer
    L = np.zeros(num_groups * B_max, np.int64)
    np.maximum.at(L, gb, layer + 1)
    L = L.reshape(num_groups, B_max)
    off = np.zeros((num_groups, B_max), np.int64)
    np.cumsum(L[:, :-1], axis=1, out=off[:, 1:])
    return off.reshape(-1)[gb] + layer, pos


def sg_profile(
    rows_of_entries: np.ndarray,
    col_idx: np.ndarray,
    values: np.ndarray,
    num_groups: int,
    Rp: int,
    *,
    span_cap: int = _SPAN_CAP,
    slots: bool = True,
) -> SgProfile:
    """Compute the global SG assignment (shared-window tiles).

    Entries must be in CSR order. ``Rp`` is the padded x-table row count
    (window bases are clamped so every 8-row chunk read stays inside).
    ``slots``: free sublane-slot packing (f32 kernels; see _pack_round) vs
    row-unique positions (dd kernels)."""
    nnz = rows_of_entries.size
    rows_all = rows_of_entries.astype(np.int64)
    cols_all = col_idx.astype(np.int64)
    slab_all = cols_all >> 7

    keep = np.ones(nnz, bool)
    t = pos = np.zeros(0, np.int64)
    w0 = np.full((num_groups, 1), Rp - 1, np.int64)
    cmax = np.zeros((num_groups, 1), np.int64)
    t_max = 1
    g_k = np.zeros(0, np.int64)
    for _round in range(_SHED_ROUNDS):
        idx = np.flatnonzero(keep)
        rows = rows_all[idx]
        cols = cols_all[idx]
        slab = slab_all[idx]
        t, pos = _pack_round(rows, cols, num_groups, slots=slots)
        g_k = rows >> 10
        nc = rows.size

        T_g = np.ones(num_groups, np.int64)
        if nc:
            np.maximum.at(T_g, g_k, t + 1)
        t_max = int(T_g.max()) if num_groups else 1

        cell = g_k * t_max + t
        w0_flat = np.full(num_groups * t_max, np.int64(Rp - 1))
        cm_flat = np.zeros(num_groups * t_max, np.int64)
        if nc:
            np.minimum.at(w0_flat, cell, slab)
            np.maximum.at(cm_flat, cell, slab)
        w0 = w0_flat.reshape(num_groups, t_max)
        cmax = cm_flat.reshape(num_groups, t_max)

        if _round == _SHED_ROUNDS - 1 or nc == 0:
            break

        # ---- profit-rule shed on over-wide tiles ----
        span_t = np.maximum(cmax - w0 + 1, 1).reshape(-1)   # per cell
        wide = span_t > span_cap
        if not wide[cell].any():
            break
        # best span_cap-wide window per tile: sort entries by (cell, slab),
        # count entries in [slab_i, slab_i + span_cap) via searchsorted on a
        # cell-strided composite key (the stride gap stops bleed-over)
        stride = np.int64(Rp + span_cap + 2)
        o2 = np.argsort(cell * stride + slab, kind="stable")
        cell_o = cell[o2]
        slab_o = slab[o2]
        key = cell_o * stride + slab_o
        right = np.searchsorted(key, key + span_cap)
        count = right - np.arange(nc)
        best = np.zeros(num_groups * t_max, np.int64)
        np.maximum.at(best, cell_o, count)
        # winning start slab per tile: first entry achieving the max
        is_best = count == best[cell_o]
        bstart = np.full(num_groups * t_max, -1, np.int64)
        bi = np.flatnonzero(is_best)
        if bi.size:
            # reverse scatter keeps the FIRST (lowest-slab) best start
            bstart[cell_o[bi[::-1]]] = slab_o[bi[::-1]]
        size_t = np.bincount(cell_o, minlength=num_groups * t_max)
        n_out = size_t - best
        # two shed moves per wide tile, both priced against the K-binned
        # k-major far cost (~_FAR_COST_PER_ENTRY ops/entry):
        #   trim:  keep the best cap-window, shed the n_out outside it
        #   whole: shed the entire tile (predominantly diffuse tiles —
        #          power-law tails — where the window scan would pay
        #          4*span for few entries; the far slab scan is cheaper)
        # prefer the move with the larger net saving: whole beats trim iff
        # 4*cap > far_cost*best_count, i.e. the best cap-window itself holds
        # too few entries to be worth scanning (mixed band+link windows keep
        # their band; pure-diffuse windows leave wholesale)
        # ...and only for sparsely-filled tiles: a FULL diffuse tile (768
        # entries over thousands of slabs — power-law tails) is served
        # better by the sg dynamic window scan than by the k-major far
        # path, whose per-(group,plane) SMEM slab lists fragment into
        # dozens of pallas calls at that volume
        whole_tile = wide & (
            4 * span_t > _FAR_COST_PER_ENTRY * size_t + _SHED_MARGIN
        ) & (_FAR_COST_PER_ENTRY * best < 4 * span_cap) \
            & (size_t < _TILE_ENTRIES // 2)
        trim_tile = wide & ~whole_tile & (
            4 * (span_t - span_cap)
            > _FAR_COST_PER_ENTRY * n_out + _SHED_MARGIN
        )
        if not (trim_tile | whole_tile).any():
            break
        lo = bstart[cell_o]
        offender = whole_tile[cell_o] | (
            trim_tile[cell_o]
            & ((slab_o < lo) | (slab_o >= lo + span_cap))
        )
        if not offender.any():
            break
        keep[idx[o2[offender]]] = False

    far = ~keep
    far_rows = rows_of_entries[far]
    far_cols = col_idx[far]
    far_vals = values[far]

    idx = np.flatnonzero(keep)
    rows = rows_all[idx]
    cols = cols_all[idx]
    slab = slab_all[idx]
    nc = rows.size
    g_k = rows >> 10
    cell = g_k * t_max + t

    # per-tile pass counts; empty tiles (w0=Rp-1, cmax=0) -> 0 passes.
    # w0 is kept 8-ALIGNED (the kernel loads the window in aligned 8-row
    # chunks — unaligned VMEM multi-row reads split) and clamped so every
    # chunk read stays inside the x table.
    occupied = np.zeros(num_groups * t_max, bool)
    if nc:
        occupied[cell] = True
    occ = occupied.reshape(num_groups, t_max)
    w0 = w0 & ~np.int64(7)
    passes = np.where(occ, np.maximum(cmax - w0 + 1, 1), 0).astype(np.int64)
    scan8 = -(-passes // 8) * 8
    w0 = np.minimum(w0, np.maximum(Rp - scan8, 0) & ~np.int64(7))
    passes = np.where(occ, cmax - w0 + 1, 0)

    e_md = np.zeros(nc, np.int32)
    lane = rows & (LANES - 1)
    sig = (rows >> 7) & 7
    if nc:
        doff = slab - w0[g_k, t]
        m = cols & (LANES - 1)
        # md packs (doff, sigma, m): the kernel recovers the lane index, the
        # destination sigma-row (slots mode), and the window offset
        e_md = (doff * (SUBLANES * LANES) + sig * LANES + m).astype(np.int32)

    T_g = np.ones(num_groups, np.int64)
    if nc:
        np.maximum.at(T_g, g_k, t + 1)
    V_g = passes.max(axis=1) if t_max else np.ones(num_groups, np.int64)
    V_g = np.maximum(V_g, 1)

    # modeled vector-op cost per group: per occupied tile, ~4.5 vregs per
    # rounded-up pass (broadcast + gather + mask-acc + chunk loads), plus
    # the per-tile fixed cost (slots mode pays the 8-way sigma-reduction)
    tidx = np.broadcast_to(np.arange(t_max)[None, :], passes.shape)
    real = tidx < T_g[:, None]
    pass8 = np.where(real, -(-passes // 8) * 8, 0)
    vregs_g = (9 * pass8.sum(axis=1)) // 2 + (38 if slots else 8) * T_g

    group_nnz = np.bincount(rows_all >> 10, minlength=num_groups) \
        if nnz else np.zeros(num_groups, np.int64)
    core_per_g = np.bincount(g_k, minlength=num_groups) \
        if nc else np.zeros(num_groups, np.int64)
    core_frac_g = core_per_g / np.maximum(group_nnz, 1)

    return SgProfile(
        e_group=g_k,
        e_flatrow=(t * SUBLANES + pos),
        e_lane=lane,
        e_md=e_md,
        e_val=values[idx],
        T_g=T_g,
        w0=w0.astype(np.int32),
        passes=passes.astype(np.int32),
        V_g=V_g,
        vregs_g=vregs_g,
        core_frac_g=core_frac_g,
        core_count_g=core_per_g,
        far_rows=far_rows,
        far_cols=far_cols,
        far_vals=far_vals,
        slots=slots,
    )


# quantization ladders for bin-static kernel shapes. COARSE on purpose:
# every distinct (Tq, Vq) pair is a separate bin = a separate pallas call
# (~0.1 ms inside one jit, TPU-measured probes/sg_bins_road2.out); padding
# a tile to the next rung costs far less than another launch.
_T_LADDER = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)
# static spans are MULTIPLES OF 8 (plus the 1-slab special case): the
# kernel reads the window in aligned 8-row chunks — one dynamic VMEM load
# per 8 passes instead of one per pass (per-pass dynamic row reads stall
# ~20 cycles and dominated the kernel; TPU-measured, road 7.7 -> ~2 ms)
_V_LADDER = (1, 8, 16, 24, 32, 40, 48)


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

    ``Vq > 0``: static kernel; slab_list = (ng, Tq) shared w0 bases, the
    kernel runs Vq passes per tile. ``Vq == SG_DYNAMIC``: dynamic kernel;
    slab_list = (ng, Tq*2) per-tile [w0, passes rounded up to 8]."""
    gsub = np.asarray(gsub)
    ng = gsub.size
    ginv_arr = np.full(int(prof.T_g.size), -1, np.int64)
    ginv_arr[gsub] = np.arange(ng)

    t_max = prof.t_max
    assert Tq >= int(prof.T_g[gsub].max()), "cluster Tq below a group's T"
    dyn = Vq == SG_DYNAMIC
    stride = 2 if dyn else 1

    # per-tile scan length & clamped bases for THIS bin's static shape
    Tb = min(Tq, t_max)
    w0b = prof.w0[gsub][:, :Tb].astype(np.int64)           # (ng, Tb)
    passes = prof.passes[gsub][:, :Tb].astype(np.int64)    # (ng, Tb)
    if dyn:
        # dynamic: per-tile counts rounded to 8 (chunked rolled loop)
        scan = -(-passes // 8) * 8
    else:
        # static: every tile runs exactly Vq single-row passes — the clamp
        # must keep every shifted doff < Vq or entries silently drop
        scan = np.full_like(passes, Vq)
    w0c = np.minimum(w0b, np.maximum(Rp - scan, 0))
    delta = w0b - w0c                                      # (ng, Tb) >= 0

    ja = np.zeros((ng, Tq, SUBLANES, LANES), np.int32)
    as_ = np.zeros((ng, Tq, SUBLANES, LANES), value_dtype)

    sel = ginv_arr[prof.e_group] >= 0
    if np.any(sel):
        gl = ginv_arr[prof.e_group[sel]]
        fr = prof.e_flatrow[sel]
        t = fr // SUBLANES
        p = fr - t * SUBLANES
        md = prof.e_md[sel].astype(np.int64) \
            + delta[gl, t] * (SUBLANES * LANES)
        ja[gl, t, p, prof.e_lane[sel]] = md.astype(np.int32)
        as_[gl, t, p, prof.e_lane[sel]] = prof.e_val[sel].astype(value_dtype)

    # slab table: padding tiles read safely at the table tail (zero passes
    # in dynamic bins; zero values make static reads harmless)
    pad_w0 = max(Rp - (max(Vq, 1) if not dyn else 8), 0)
    w0_full = np.full((ng, Tq), pad_w0, np.int32)
    w0_full[:, :Tb] = w0c.astype(np.int32)
    if dyn:
        tab = np.zeros((ng, Tq, stride), np.int32)
        tab[:, :, 0] = w0_full
        tab[:, :Tb, 1] = scan.astype(np.int32)
        # padding tiles: zero passes (loop bound 0)
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
        # per-group REAL tile count: the kernel bounds its tile loop by it
        # when Tq >> T_g (pow2 Tq quantization would otherwise scan every
        # padding tile at the full static pass count)
        slab_count=np.minimum(prof.T_g[gsub], Tq).astype(np.int32),
        real_nnz=real,
        span=int(Vq),
        cost_passes=vregs,
        sg_slots=bool(prof.slots),
    )
