"""PR (permutation-routed) SpMV layout — the zero-locality kernel.

The scattered-regime kernels (formats/sg.py, k-major) pay >=1 broadcast
vector-op per (row-group, distinct column-slab) pair — on matrices with no
column locality (~1 distinct slab per entry) that is a ~0.5 GFLOPS VPU
ceiling (docs/DESIGN.md round-3 "diffuse floor"). The reference GPU serves
this regime with its native per-lane gather unit
(cuda_src/csr_matrix_cuda.cu:122-196). PR is the TPU-native replacement:

1. **Gather in column order.** Entries are sorted by column slab and each
   slab's count padded to a multiple of 128, so every row of the
   ``(n_rows, 128)`` source array reads exactly ONE x-slab. Each x-slab is
   visited once GLOBALLY (not once per row-group): the gather costs
   ~R + n_tiles broadcast passes total instead of ~nnz.
2. **Route to row order.** Products move from column order to a k-major
   row layout by a host-precomputed permutation executed as 128
   independent Beneš networks (one per lane) + one final lane gather —
   all TPU-fast primitives (pr_route.py). ~2*log2(n_rows)-1 roll+select
   stages over a VMEM-resident array.
3. **Reduce.** The destination IS a k-major SELL slot array (sigma-sorted
   rows, K-binned groups), so the reduction is the standard masked
   sublane k-sum into y.

Capacity: one PR problem routes ``n_rows <= 2**16`` Beneš rows (≈8.4M
padded entries) — enough for the whole scattered suite; larger matrices
would panel by destination row-slices (independent sub-problems).

Reference parity: replaces the CUDA thread-per-row / warp CSR kernels on
scattered matrices (cuda_src/csr_matrix_cuda.cu:122-148, BASELINE.md
webbase-1M / roadNet-PA rows).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .coo import COOMatrix
from .csr import CSRMatrix
from .sell import DEFAULT_K_BINS, GROUP_ROWS, LANES, SUBLANES

__all__ = ["PRMatrix", "PanelPRMatrix", "pr_from_csr", "MAX_PR_ROWS",
           "PANEL_TARGET_ROWS", "estimate_pr_vmem_bytes", "max_pr_rows"]

MAX_PR_ROWS = 1 << 16          # mask bit-packing holds <= 31 stages
PANEL_TARGET_ROWS = 1 << 15    # per-panel Beneš rows (VMEM residency)
_NEAR_WIN = 16                  # x rows per near-tile window read

# --- Predictive VMEM guard (VERDICT r4 item 5) ------------------------------
# The tunneled compile helper's "HTTP 500" is a DETERMINISTIC VMEM OOM at
# AOT compile (docs/DESIGN.md "The compile-helper HTTP 500 decoded"):
# f32 kernel at 2^15 Beneš rows = "Used 152.59M of 128.00M"; the 2^14
# control compiles at ~76M. Model the footprint host-side and size panels
# so no shape ever discovers the limit by crashing the helper.
#
# Empirical per-row cost, linear fit through the two measured f32 anchors
# (152.59M@2^15, ~76M@2^14 -> 4674 B/row; naive plane accounting gives
# 5*512 B/row, i.e. Mosaic's effective overhead is ~1.83x the declared
# whole-array planes). dd holds 8 per-row planes vs f32's 5 (4 scratch +
# 2 outputs, ops/pallas_pr_dd.py:246-250) but is calibrated slightly
# below the 8/5 ratio so the MEASURED-working dd 2^14 @ 1M-col config
# stays admissible: per_row_dd = 7000 -> 114.7M + x-table.
_PR_VMEM_PER_ROW_F32 = 4674
_PR_VMEM_PER_ROW_DD = 7000
PR_VMEM_BUDGET = 126 * 1024 * 1024   # reject just under the 128M chip limit


def estimate_pr_vmem_bytes(n_rows: int, ncols: int, dd: bool = False) -> int:
    """Host-side VMEM model of one PR pallas_call at ``n_rows`` Beneš rows.

    Includes the packed whole-x table (1 f32 plane, 2 for dd hi/lo); the
    per-row coefficient covers masks/final_lane/scratch/outputs and
    Mosaic's measured overhead."""
    per_row = _PR_VMEM_PER_ROW_DD if dd else _PR_VMEM_PER_ROW_F32
    x_planes = 2 if dd else 1
    x_bytes = -(-int(ncols) // LANES) * LANES * 4 * x_planes
    return int(n_rows) * per_row + x_bytes


def max_pr_rows(ncols: int, dd: bool = False,
                budget: int = PR_VMEM_BUDGET) -> int:
    """Largest power-of-two Beneš row count whose modeled VMEM footprint
    fits ``budget``. Floor 2^10 (smaller problems are never VMEM-bound)."""
    rows = MAX_PR_ROWS
    while rows > (1 << 10) and estimate_pr_vmem_bytes(rows, ncols, dd) > budget:
        rows >>= 1
    return rows


@dataclass(frozen=True)
class PRMatrix:
    """Host-side PR conversion product (see module docstring)."""

    nrows: int
    ncols: int
    nnz: int
    n_rows: int                 # Beneš array rows (power of two)
    win: int                    # static x-window rows for near tiles (8/16)
    val: np.ndarray             # (n_rows, 128) float64 — element values
    md: np.ndarray              # (n_rows, 128) int32 — dslab*128 + lane
    tile_base: np.ndarray       # (n_rows//8,) int32 — 8-aligned x base row
    tile_far: np.ndarray        # (n_rows//8,) int32 — 1 = per-row x loads
    row_slab: np.ndarray        # (n_rows,) int32 — absolute x slab per row
    masks: np.ndarray           # (n_rows, 128) int32 — Beneš swap bitplanes
    final_lane: np.ndarray      # (n_rows, 128) int32 — dest lane gather idx
    bins: tuple                 # ((K, n_groups, dest_row_off, group_off), ...)
    y_rows: int                 # output rows = total_groups * 8
    row_perm: np.ndarray        # (nrows,) sigma: y_natural[row_perm] = y_kernel
    padding_ratio: float
    # force_ladder panels only: kernel-y position of each natural row
    # (real sigma positions are non-contiguous once padding groups are
    # inserted mid-ladder; see from_csr force_ladder). None = positions
    # 0..nrows-1, the default contiguous case.
    y_pos: np.ndarray | None = None

    @property
    def shape(self):
        return (self.nrows, self.ncols)

    @property
    def n_stages(self) -> int:
        p = int(self.n_rows).bit_length() - 1
        return max(2 * p - 1, 0)

    def unpermute(self, y: np.ndarray) -> np.ndarray:
        """Kernel output (sigma row order) -> natural row order.

        ``force_ladder`` panels carry ``y_pos`` (real rows sit at
        non-contiguous kernel positions) and need the FULL kernel y."""
        if self.y_pos is not None:
            return y[self.y_pos]
        out = np.empty(self.nrows, dtype=y.dtype)
        out[self.row_perm] = y[: self.nrows]
        return out

    def memory_stats(self) -> dict:
        dev = (self.val.size * 4 + self.md.size * 4 + self.masks.size * 4
               + self.final_lane.size * 4 + self.row_slab.size * 4
               + self.tile_base.size * 8)
        return {"bytes": int(dev), "padded_nnz": int(self.n_rows * 128),
                "padding_ratio": float(self.padding_ratio)}

    # ------------------------------------------------------------------
    @classmethod
    def from_csr(cls, csr: CSRMatrix, k_bins: tuple = DEFAULT_K_BINS,
                 native: bool = True, max_rows: int = MAX_PR_ROWS,
                 force_ladder: tuple | None = None,
                 min_rows: int = 0) -> "PRMatrix":
        """``force_ladder`` / ``min_rows`` harmonize panels for SPMD
        stacking (parallel/spmd_pr.py): ``force_ladder`` is a
        ``((K, group_count), ...)`` ladder (K strictly decreasing) that
        every panel's natural ladder must fit inside — extra groups are
        pure padding (their slots are dummy-filled like group tails);
        ``min_rows`` lower-bounds the Beneš row count so all panels share
        one power of two. The result carries ``y_pos`` because real rows
        sit at non-contiguous kernel positions."""
        nr, nc, nnz = csr.nrows, csr.ncols, csr.nnz
        if nnz == 0:
            raise ValueError("PR layout needs at least one entry")
        nnz_per_row = np.diff(csr.row_ptr).astype(np.int64)

        # ----- destination: sigma-sorted rows, K-binned k-major groups
        row_perm = np.argsort(-nnz_per_row, kind="stable").astype(np.int64)
        inv_perm = np.empty(nr, dtype=np.int64)
        inv_perm[row_perm] = np.arange(nr)
        n_groups = -(-nr // GROUP_ROWS)
        glen = nnz_per_row[row_perm]
        # per-group max nnz -> ladder edge
        gmax = np.zeros(n_groups, dtype=np.int64)
        for g in range(n_groups):
            seg = glen[g * GROUP_ROWS:(g + 1) * GROUP_ROWS]
            gmax[g] = seg.max() if seg.size else 0
        edges = np.asarray(sorted(set(int(k) for k in k_bins)), dtype=np.int64)
        kg = np.empty(n_groups, dtype=np.int64)
        for g in range(n_groups):
            bigger = edges[edges >= max(gmax[g], 1)]
            kg[g] = bigger[0] if bigger.size else -(-gmax[g] // 8) * 8
        # optional SPMD harmonization: embed the natural (non-increasing)
        # ladder into a forced one; extra groups are pure padding and their
        # slots dummy-fill exactly like natural group tails below.
        remap = None
        y_pos = None
        if force_ladder is not None:
            runs = []
            i0 = 0
            while i0 < n_groups:
                i1 = i0
                while i1 < n_groups and kg[i1] == kg[i0]:
                    i1 += 1
                runs.append((int(kg[i0]), i0, i1 - i0))
                i0 = i1
            forced = [(int(K), int(c)) for K, c in force_ladder]
            if any(forced[i][0] <= forced[i + 1][0]
                   for i in range(len(forced) - 1)):
                raise ValueError("force_ladder K values must be strictly "
                                 "decreasing")
            off_of, cnt_of = {}, {}
            pos = 0
            for K, c in forced:
                off_of[K] = pos
                cnt_of[K] = c
                pos += c
            remap = np.empty(n_groups, dtype=np.int64)
            for K, i0, c in runs:
                if K not in off_of or c > cnt_of[K]:
                    raise ValueError(
                        f"force_ladder cannot host {c} groups of K={K}")
                remap[i0:i0 + c] = off_of[K] + np.arange(c)
            n_groups = pos
            kg = np.concatenate([np.full(c, K, dtype=np.int64)
                                 for K, c in forced])

        # groups are sigma-ordered (nnz desc) so kg is non-increasing:
        # contiguous bins
        bins = []
        dest_off = 0
        g0 = 0
        while g0 < n_groups:
            g1 = g0
            while g1 < n_groups and kg[g1] == kg[g0]:
                g1 += 1
            bins.append((int(kg[g0]), g1 - g0, dest_off, g0))
            dest_off += int(kg[g0]) * SUBLANES * (g1 - g0)
            g0 = g1
        d_rows = dest_off

        # per-entry destination (row, lane) in the flat dest array
        rows_of_entries = np.repeat(np.arange(nr, dtype=np.int64), nnz_per_row)
        # k = rank within row (CSR order)
        k_rank = np.arange(nnz, dtype=np.int64) - np.repeat(
            csr.row_ptr[:-1].astype(np.int64), nnz_per_row)
        sp = inv_perm[rows_of_entries]              # sigma position
        g_of = sp // GROUP_ROWS
        if remap is not None:
            g_of = remap[g_of]                      # forced group position
        loc = sp % GROUP_ROWS
        sub_i = loc // LANES
        dst_lane_real = (loc % LANES).astype(np.int64)
        kg_of = kg[g_of]
        # dest row offset of the entry's group
        goff = np.zeros(n_groups + 1, dtype=np.int64)
        np.cumsum(kg * SUBLANES, out=goff[1:])
        dst_row_real = goff[g_of] + k_rank * SUBLANES + sub_i
        assert (k_rank < kg_of).all()

        # ----- source: slab-sorted, slab counts padded to x128
        col = csr.col_idx.astype(np.int64)
        slab = col >> 7
        lane_m = col & 127
        order = np.argsort(slab, kind="stable")
        R = -(-nc // LANES)
        Rp = (R // SUBLANES + 1) * SUBLANES
        cnt = np.bincount(slab, minlength=R)
        occ = np.flatnonzero(cnt)                   # populated slabs
        rows_per_slab = -(-cnt[occ] // LANES)
        s_rows = int(rows_per_slab.sum())
        n_rows = 1
        while n_rows < max(s_rows, d_rows, min_rows, 2):
            n_rows <<= 1
        if n_rows > min(max_rows, MAX_PR_ROWS):
            # raised BEFORE the expensive routing so pr_from_csr's panel
            # fallback doesn't pay for a doomed single-problem attempt
            raise ValueError(
                f"PR problem needs {n_rows} Beneš rows "
                f"(> {min(max_rows, MAX_PR_ROWS)})")
        n_total = n_rows * LANES

        # source row of each real entry: sequential within its slab's rows
        slab_row_off = np.zeros(occ.size + 1, dtype=np.int64)
        np.cumsum(rows_per_slab, out=slab_row_off[1:])
        slab_to_occ = np.full(R, -1, dtype=np.int64)
        slab_to_occ[occ] = np.arange(occ.size)
        rank_in_slab = np.empty(nnz, dtype=np.int64)
        # rank within equal-slab runs: slabs appear sorted, so run starts
        # are the cumulative present-slab counts
        occ_counts = cnt[occ]
        run_starts = np.cumsum(occ_counts) - occ_counts
        rank_in_slab[order] = (np.arange(nnz, dtype=np.int64)
                               - np.repeat(run_starts, occ_counts))
        src_row_real = (slab_row_off[slab_to_occ[slab]]
                        + rank_in_slab // LANES)

        # per-row absolute slab
        row_slab = np.zeros(n_rows, dtype=np.int64)
        row_slab[:s_rows] = np.repeat(occ, rows_per_slab)
        if s_rows and s_rows < n_rows:
            row_slab[s_rows:] = row_slab[s_rows - 1]  # dummy rows: keep near

        # ----- dummies fill both sides exactly
        src_fill = np.bincount(src_row_real, minlength=n_rows)
        n_dummy = n_total - nnz
        # dummy source rows: repeat each row id for its free slots
        src_row_dummy = np.repeat(np.arange(n_rows, dtype=np.int64),
                                  LANES - src_fill)
        # dummy dest slots, constructed analytically (no occupancy scan):
        # (a) per sigma position, k-slots [len, K_g) are padding; positions
        # beyond nr (group tail) pad all K_g slots
        sp_all = np.arange(n_groups * GROUP_ROWS, dtype=np.int64)
        len_all = np.zeros(n_groups * GROUP_ROWS, dtype=np.int64)
        if remap is not None:
            newflat = (remap[np.arange(nr) // GROUP_ROWS] * GROUP_ROWS
                       + np.arange(nr) % GROUP_ROWS)
            len_all[newflat] = glen
            y_pos = np.empty(nr, dtype=np.int64)
            y_pos[row_perm] = newflat
        else:
            len_all[:nr] = glen
        kg_all = kg[sp_all // GROUP_ROWS]
        pads = kg_all - len_all
        tot = int(pads.sum())
        start_of = np.cumsum(pads) - pads
        sp_pad = np.repeat(sp_all, pads)
        k_pad = (np.arange(tot, dtype=np.int64) - np.repeat(start_of, pads)
                 + np.repeat(len_all, pads))
        dst_row_pad = (goff[sp_pad // GROUP_ROWS] + k_pad * SUBLANES
                       + (sp_pad % GROUP_ROWS) // LANES)
        dst_lane_pad = sp_pad % LANES
        # (b) whole dummy rows beyond the dest area
        tail_rows = np.repeat(np.arange(d_rows, n_rows, dtype=np.int64), LANES)
        tail_lanes = np.tile(np.arange(LANES, dtype=np.int64),
                             n_rows - d_rows)
        dst_row_dummy = np.concatenate([dst_row_pad, tail_rows])
        dst_lane_dummy = np.concatenate([dst_lane_pad, tail_lanes])
        assert dst_row_dummy.size == n_dummy == src_row_dummy.size

        src_row_all = np.concatenate([src_row_real, src_row_dummy])
        dst_row_all = np.concatenate([dst_row_real, dst_row_dummy])
        dst_lane_all = np.concatenate([dst_lane_real, dst_lane_dummy])

        # ----- routing (coloring + Beneš masks + final lane gather)
        src_lane, masks, final_lane = _route(
            src_row_all, dst_row_all, dst_lane_all, n_rows, native=native)

        # ----- place values / column metadata at (src_row, src_lane)
        val = np.zeros((n_rows, LANES), dtype=np.float64)
        val[src_row_real, src_lane[:nnz]] = csr.values
        md_lane = np.zeros((n_rows, LANES), dtype=np.int64)
        md_lane[src_row_real, src_lane[:nnz]] = lane_m

        # ----- near/far tiles + window bases
        win = _NEAR_WIN if Rp >= _NEAR_WIN else SUBLANES
        n_tiles = n_rows // SUBLANES
        t_first = row_slab[0::SUBLANES]
        t_last = row_slab[SUBLANES - 1::SUBLANES]
        base = (t_first // SUBLANES) * SUBLANES
        base = np.minimum(base, Rp - win)
        np.maximum(base, 0, out=base)
        # tile class: 0 = 8-row window (most tiles: consecutive populated
        # slabs), 1 = win-row window, 2 = far (per-row dynamic reads)
        spread = t_last - base
        far = np.where(spread < SUBLANES, 0,
                       np.where(spread < win, 1, 2)).astype(np.int64)
        # md delta: near tiles encode slab - base; far tiles read per row
        d_of_row = row_slab - np.repeat(base, SUBLANES)
        far_rows = np.repeat(far == 2, SUBLANES)
        d_of_row[far_rows] = 0
        assert (d_of_row >= 0).all() and (d_of_row < win).all()
        md = md_lane + (d_of_row[:, None]) * 128

        padding = n_total / max(nnz, 1)
        return cls(
            nrows=nr, ncols=nc, nnz=nnz, n_rows=n_rows, win=int(win),
            val=val, md=md.astype(np.int32),
            tile_base=base.astype(np.int32), tile_far=far.astype(np.int32),
            row_slab=row_slab.astype(np.int32),
            masks=masks.astype(np.int32), final_lane=final_lane.astype(np.int32),
            bins=tuple(bins), y_rows=n_groups * SUBLANES,
            row_perm=row_perm, padding_ratio=float(padding),
            y_pos=y_pos,
        )

    @classmethod
    def from_coo(cls, coo: COOMatrix, **kw) -> "PRMatrix":
        return cls.from_csr(CSRMatrix.from_coo(coo), **kw)

    # ------------------------------------------------------------------
    def spmv(self, x: np.ndarray) -> np.ndarray:
        """Host oracle twin of the device kernel (float64, same routing)."""
        return self.unpermute(self.spmv_kernel_order(x))

    def spmv_kernel_order(self, x: np.ndarray) -> np.ndarray:
        """Oracle output in KERNEL (sigma) order — what the device kernel
        returns (callers unpermute; the panel oracle concatenates these
        directly, avoiding an unpermute + re-permute roundtrip per panel)."""
        from .pr_route import benes_stage_distances

        xpad = np.zeros(((self.ncols + 127) // 128 + 1) * 128, dtype=np.float64)
        xpad[: self.ncols] = x
        xtab = xpad.reshape(-1, 128)
        # gather phase: every source row reads its single slab
        gathered = xtab[np.minimum(self.row_slab, xtab.shape[0] - 1)]
        prod = self.val * np.take_along_axis(
            gathered, (self.md & 127).astype(np.int64), axis=1)
        # route
        a = prod
        for s, d in enumerate(benes_stage_distances(self.n_rows)):
            idx = np.arange(self.n_rows)
            partner = a[idx ^ d]
            swap = ((self.masks >> s) & 1).astype(bool)
            a = np.where(swap, partner, a)
        a = np.take_along_axis(a, self.final_lane.astype(np.int64), axis=1)
        # reduce
        y = np.zeros(self.y_rows * LANES, dtype=np.float64)
        for (K, G, off, g0) in self.bins:
            blk = a[off:off + G * K * SUBLANES].reshape(G, K, SUBLANES, LANES)
            ysub = blk.sum(axis=1)                       # (G, 8, 128)
            y[g0 * GROUP_ROWS:(g0 + G) * GROUP_ROWS] = ysub.reshape(-1)
        # force_ladder panels: callers index with y_pos — return FULL y
        return y if self.y_pos is not None else y[: self.nrows]


@dataclass(frozen=True)
class PanelPRMatrix:
    """Destination-sliced PR decomposition for matrices beyond one PR
    problem's Beneš capacity (row-slice panels; each panel is an
    independent PRMatrix over a contiguous chunk of globally sigma-sorted
    rows, all sharing the x table). ≙ the reference's unbounded-N CSR
    kernels (src/csr_matrix.c:130-139) on the row axis."""

    nrows: int
    ncols: int
    nnz: int
    panels: tuple               # (PRMatrix, ...)
    row_perm: np.ndarray        # kernel concat order -> original row
    padding_ratio: float

    @property
    def shape(self):
        return (self.nrows, self.ncols)

    def unpermute(self, y: np.ndarray) -> np.ndarray:
        # zeros + row_perm.size: all-zero sigma-tail rows carry no panel
        # (PanelPRMatrix.from_csr skips empty chunks), so row_perm may cover
        # only the paneled rows — the rest are exactly 0
        out = np.zeros(self.nrows, dtype=y.dtype)
        out[self.row_perm] = y[: self.row_perm.size]
        return out

    def memory_stats(self) -> dict:
        stats = [p.memory_stats() for p in self.panels]
        return {"bytes": int(sum(s["bytes"] for s in stats)),
                "padded_nnz": int(sum(s["padded_nnz"] for s in stats)),
                "padding_ratio": float(self.padding_ratio),
                "panels": len(self.panels)}

    @classmethod
    def from_csr(cls, csr: CSRMatrix, k_bins: tuple = DEFAULT_K_BINS,
                 native: bool = True,
                 target_rows: int = PANEL_TARGET_ROWS) -> "PanelPRMatrix":
        nnz_per_row = np.diff(csr.row_ptr).astype(np.int64)
        order = np.argsort(-nnz_per_row, kind="stable")
        # greedy contiguous chunks of sigma rows, sized so the panel's
        # Beneš rows stay near target_rows: both sides are bounded by
        # entries/128 plus padding, so budget entries ~ 0.7 * capacity
        cap_entries = int(target_rows * LANES * 0.7)
        chunks = []
        start = 0
        acc = 0
        for i, r in enumerate(order):
            acc += int(nnz_per_row[r])
            # chunk boundaries on group multiples keep sigma groups intact
            if acc >= cap_entries and (i + 1 - start) % GROUP_ROWS == 0:
                chunks.append(order[start:i + 1])
                start, acc = i + 1, 0
        if start < order.size:
            chunks.append(order[start:])

        panels = []
        perms = []

        def build(rows):
            """Build one panel, splitting further when the Beneš row count
            exceeds the cap: s_rows is slab-count dominated on zero-locality
            matrices, so an entry-budgeted chunk can still overflow
            ``target_rows`` (from_csr's capacity check fires BEFORE the
            expensive routing, so retries cost only the layout analysis)."""
            sub = _sub_csr(csr, rows)
            if sub.nnz == 0:
                return  # all-zero sigma tail: unpermute zero-fills those rows
            try:
                p = PRMatrix.from_csr(sub, k_bins=k_bins,
                                      native=native, max_rows=target_rows)
            except ValueError:
                if rows.size < 16:
                    # a minimal chunk that still needs more Beneš rows than
                    # the target (e.g. one long row): build it best-effort —
                    # upstream heavy-row splitting keeps this far below the
                    # dd VMEM cap in practice
                    try:
                        p = PRMatrix.from_csr(sub, k_bins=k_bins,
                                              native=native)
                    except ValueError as e:
                        # a dense row of k entries forces k*SUBLANES dest
                        # rows (k-major depth) — no panel split can fix
                        # that; the caller must split the row's ENTRIES
                        # first (csr.split_heavy_rows, as bench/harness.py
                        # does before every PR conversion)
                        kmax = int(np.diff(sub.row_ptr).max())
                        raise ValueError(
                            f"PR cannot host a {kmax}-entry row ({e}); "
                            "split heavy rows first "
                            "(CSRMatrix.split_heavy_rows)") from e
                else:
                    half = (rows.size // 2 // GROUP_ROWS) * GROUP_ROWS \
                        or rows.size // 2
                    build(rows[:half])
                    build(rows[half:])
                    return
            panels.append(p)
            perms.append(np.asarray(rows)[p.row_perm])

        for rows in chunks:
            build(rows)
        total_pad = sum(p.n_rows * LANES for p in panels)
        return cls(nrows=csr.nrows, ncols=csr.ncols, nnz=csr.nnz,
                   panels=tuple(panels),
                   row_perm=np.concatenate(perms),
                   padding_ratio=float(total_pad / max(csr.nnz, 1)))

    def spmv(self, x: np.ndarray) -> np.ndarray:
        parts = [_panel_kernel_order(p, x) for p in self.panels]
        return self.unpermute(np.concatenate(parts))


def _panel_kernel_order(p: PRMatrix, x: np.ndarray) -> np.ndarray:
    """Panel oracle output in KERNEL (sigma) order, length p.nrows."""
    return p.spmv_kernel_order(x)


def _sub_csr(csr: CSRMatrix, rows: np.ndarray) -> CSRMatrix:
    """Row-subset CSR (rows appear in the given order)."""
    rows = np.asarray(rows, dtype=np.int64)
    lens = (csr.row_ptr[rows + 1] - csr.row_ptr[rows]).astype(np.int64)
    ptr = np.zeros(rows.size + 1, dtype=csr.row_ptr.dtype)
    np.cumsum(lens, out=ptr[1:])
    idx = np.repeat(csr.row_ptr[rows].astype(np.int64), lens) + (
        np.arange(int(lens.sum()), dtype=np.int64)
        - np.repeat(ptr[:-1].astype(np.int64), lens))
    return CSRMatrix(rows.size, csr.ncols, ptr, csr.col_idx[idx],
                     csr.values[idx])


def pr_from_csr(csr: CSRMatrix, k_bins: tuple = DEFAULT_K_BINS,
                native: bool = True, target_rows: int = PANEL_TARGET_ROWS,
                dd: bool = False):
    """PRMatrix when one Beneš problem suffices, PanelPRMatrix beyond.
    ``target_rows`` caps a problem's Beneš rows; it is further clamped by
    the predictive VMEM model (:func:`max_pr_rows`) so no panel shape can
    reach the compile helper's deterministic VMEM OOM (``dd=True`` prices
    the dd kernel's extra scratch/output planes)."""
    target_rows = min(int(target_rows), max_pr_rows(csr.ncols, dd=dd))
    # quick bound: padded entries ~ nnz * 1.6 is the common case; try the
    # single problem first and fall back on the capacity guard. A single
    # problem above target_rows would hold (with its scratches, masks and
    # gather table) more VMEM than the chip has.
    if csr.nnz <= target_rows * LANES * 0.7:
        try:
            return PRMatrix.from_csr(csr, k_bins=k_bins, native=native,
                                     max_rows=target_rows)
        except ValueError:
            pass
    return PanelPRMatrix.from_csr(csr, k_bins=k_bins, native=native,
                                  target_rows=target_rows)


def _route(src_row, dst_row, dst_lane, n_rows, native=True):
    """Dispatch to the native router when available; numpy reference
    otherwise (slow — O(n log n) python, fine for tests)."""
    if native:
        try:
            from ..native.build import load_fast_route
            lib = load_fast_route()
        except Exception:  # noqa: BLE001
            lib = None
        if lib is not None:
            from ..native.build import run_fast_route
            return run_fast_route(lib, src_row, dst_row, dst_lane, n_rows)
    from .pr_route import route_elements
    return route_elements(src_row, dst_row, dst_lane, n_rows)
