"""SELL-C-128 — the TPU-native performance layout for SpMV.

This is the framework's re-design of the reference's GPU kernels' data layout
for TPU hardware. The reference's CUDA warp-per-row kernels
(cuda_src/csr_matrix_cuda.cu:151-196, cuda_src/hll_matrix.cu:379-426) assign a
32-lane warp per row and stride the row's entries across lanes; the TPU
analogue inverts the mapping: **lane = row, sublane = entry index**
(a sliced-ELLPACK / SELL-C-sigma layout with C = 1024 rows = 8 sublanes x 128
lanes — the VPU register shape).

Layout
------
Rows are grouped into *groups* of ``1024`` (8 superblocks x 128 lanes).
Groups are *binned* by padded width ``K`` so each bin is one rectangular
buffer = one ``pallas_call`` grid (the TPU equivalent of the reference's
nnz-balanced thread scheduling, src/csr_matrix.c:167-266 — binning replaces
per-thread row ranges as the load-balancing mechanism; BASELINE.json names
row-binning explicitly). Within a bin each group stores a ``(K*8, 128)``
tile in one of two interleaves, chosen per bin by a cost model:

* ``k-major`` — entry ``k`` of local row ``i*128+j`` at ``[k*8+i, j]``.
  Served by the *slab-list* kernel: loop over the group's distinct x-slabs.
  Wins on scattered matrices (power-law) where per-chunk column ranges are
  wide but the distinct-slab count is moderate.
* ``sb-major`` — entry ``k`` of local row ``sb*128+j`` at ``[sb*K+k, j]``.
  Each ``(8,128)`` chunk then covers 8 *consecutive* entries of 128
  *consecutive* rows, so its slab range ``[qmin, qmax]`` is tiny on
  banded/local matrices; the kernel range-scans it with no side tables.
  Requires ``K`` to be a multiple of 8.

x-gather decomposition
----------------------
TPU has no fast arbitrary gather. Column index ``c`` decomposes as
``c = 128*q + m``: ``q`` selects a *slab* (one 128-wide row of the
``(ceil(N/128), 128)`` x-table), ``m`` selects the lane within the slab.
Mosaic supports lane-gather (``take_along_axis`` axis=1), so both kernels
broadcast a slab row, lane-gather by ``m``, and accumulate under a ``q``
equality mask — they differ only in how candidate slabs are enumerated.

Padding follows the reference HLL semantics (hll_matrix.c:241-246): padded
entries replicate the row's last valid column with value 0.0. Fully empty
rows pad with their superblock's minimum real column (not 0) so sb-major
range scans stay tight; contributions are 0 either way.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .coo import COOMatrix
from .csr import CSRMatrix

__all__ = ["SellBin", "SellMatrix", "PanelSellMatrix", "GROUP_ROWS", "LANES", "SUBLANES"]

LANES = 128
SUBLANES = 8
GROUP_ROWS = LANES * SUBLANES  # 1024
CHUNK_K = 8  # default entries per (chunk_k,128) chunk in sb-major layout


def slab_table_rows(ncols: int) -> int:
    """Slab-table row count Rp for N columns: sublane-aligned PLUS at least
    one spare all-zero slab row (bins pad their slab lists with Rp-1,
    guaranteed unused, letting kernels drop the per-pass index clamp).
    THE geometry invariant shared by the slab-list padding below,
    pack_x_table / device_put_x (ops/pallas_sell.py), and the SpMM stacked
    tables (ops/pallas_sell_spmm.py)."""
    return (-(-ncols // LANES) // SUBLANES + 1) * SUBLANES

# Default K bin edges; a group with max row nnz K_g is padded to the smallest
# edge >= K_g. Autotunable (tune/autotune.py).
DEFAULT_K_BINS = (1, 2, 4, 8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024)

# Measured runtime model for call-count minimization (probes/kernel_probe*,
# TPU v5e via the axon tunnel): aggregate streaming BW through a Pallas grid,
# fixed overhead per pallas_call, and the cost of one (8,128) vector op.
# Every bin is one pallas_call, so the converter merges bins while the extra
# padding/span work streams cheaper than a launch.
_PALLAS_BW = 300e9
# Within one jit, an extra pallas_call costs only ~20-30 us (the ~0.15 ms
# measured in probes/kernel_probe4 is per chained-timer ITERATION, not per
# call — r2 bench A/B: merging the 3-bin bench config into one span-24 bin
# LOST 46 us to span inflation). Merge only near-free bins.
_LAUNCH_S = 3e-5
_VREG_OP_S = 2.6e-10  # recalibrated against the r2 bench sb-list regression
_SG_OP_S = 2.0e-9     # sg pass-ops: ~2 cycles/op measured (r3 road prefix)
_LAUNCH_BYTES = int(_LAUNCH_S * _PALLAS_BW)  # padding bytes worth one launch
_SMEM_LIST_BYTES = 512 * 1024  # scalar-prefetch table budget per bin
_MAX_STATIC_SPAN = 40  # widest unrolled gather-pass count for sb kernels
_SG_MAX_STATIC = 48    # sg static rung cap (8-aligned w0 widens cap-40 + 7)
_MAX_STATIC_BODIES = 320  # nchunks*span cap: the Mosaic compile helper
                          # crashed at ~408 unrolled bodies (sigma-fem3d
                          # sb-list); 288-body kernels (K=96, span 24)
                          # compile fine and run ~6x faster than the
                          # k-major fallback (ml_laplace 5.3 -> ~30 GF)
_WL_WIN_VREGS = 28     # modeled cost of building one 8-row W table (wl layout)
# wl streams its (padded) slots at ~431 GB/s effective (fem3d-40 A/B: 241 MB
# in 0.559 ms, ABOVE the two-stream floor — single-take tiles pipeline
# better), so its bytes are priced against a higher BW than the masked-pass
# kernels
_PALLAS_BW_WL = 600e9
_WL_MAX_NW = 16        # wl guards: windows per row-block / layers / unroll
_WL_MAX_L = 16
_WL_MAX_TILES = 48


@dataclass(frozen=True)
class SellBin:
    """One rectangular bin: all groups padded to the same entry width ``k``,
    served by the same kernel shape (layout + static span)."""

    k: int                   # padded entries per row
    layout: str              # "k-major" | "sb-major"
    group_ids: np.ndarray    # (n_groups,) int32 — global group indices
    ja: np.ndarray           # (n_groups * k * 8, 128) int32 column indices
    as_: np.ndarray          # (n_groups * k * 8, 128) values (0.0 padding)
    slab_list: np.ndarray    # k-major: (n_groups, s_max) distinct col//128
                             # sb-major: (n_groups, 8 * k/CHUNK_K) per-chunk qbase
    slab_count: np.ndarray   # (n_groups,) int32 distinct-slab counts (k-major loop bound)
    real_nnz: int            # un-padded nnz covered by this bin
    span: int = 0            # sb-major: static slabs scanned per chunk
    chunk_k: int = CHUNK_K   # sb-major: entries per chunk (sublane tile height)
    cost_passes: int = 0     # modeled vreg-ops per element for the chosen kernel
    add_into: bool = False   # bin ACCUMULATES onto tiles another bin wrote
                             # (sg far-remainder bins share groups with their
                             # sg core bin; all other bins partition groups)
    sg_slots: bool = False   # sg only: free sublane-slot positions (kernel
                             # does a per-tile sigma-reduction) vs row-unique

    @property
    def n_groups(self) -> int:
        return int(self.group_ids.size)

    @property
    def s_max(self) -> int:
        return int(self.slab_list.shape[1]) if self.slab_list.size else 0

    @property
    def padded_nnz(self) -> int:
        return self.n_groups * self.k * GROUP_ROWS


@dataclass(frozen=True)
class SellMatrix:
    """SELL-C-128 matrix: bins + the x-table geometry.

    With ``sigma_sort`` (SELL-C-sigma, Kreutzer et al.) rows are ordered by
    descending nnz before grouping, collapsing padding on power-law matrices
    (the reference's HLL degrades to 0.21 GFLOPS on webbase-1M, BASELINE.md).
    ``row_perm`` maps kernel-output position -> original row:
    ``y_natural[row_perm] = y_kernel``; see :meth:`unpermute`.
    """

    nrows: int
    ncols: int
    nnz: int
    bins: list
    num_groups: int
    row_perm: np.ndarray | None = None  # (nrows,) original row of each output slot

    @property
    def shape(self) -> tuple:
        return (self.nrows, self.ncols)

    @property
    def num_slabs(self) -> int:
        return -(-self.ncols // LANES)

    @property
    def padded_rows(self) -> int:
        return self.num_groups * GROUP_ROWS

    @property
    def padded_nnz(self) -> int:
        return sum(b.padded_nnz for b in self.bins)

    @property
    def padding_ratio(self) -> float:
        return self.padded_nnz / max(self.nnz, 1)

    def memory_stats(self) -> dict:
        byt = sum(b.ja.nbytes + b.as_.nbytes + b.slab_list.nbytes for b in self.bins)
        return {
            "rows": self.nrows,
            "cols": self.ncols,
            "nnz": self.nnz,
            "padded_nnz": self.padded_nnz,
            "padding_ratio": self.padding_ratio,
            "num_bins": len(self.bins),
            "bin_ks": [b.k for b in self.bins],
            "bin_layouts": [b.layout for b in self.bins],
            "bins": [
                # chosen launch geometry per bin (≙ the reference's logged
                # CUDA block dims, cuda_src/utility.cu:236-261)
                {
                    "k": b.k,
                    "layout": b.layout,
                    "n_groups": b.n_groups,
                    "span": b.span,
                    "s_max": b.s_max,
                    "chunk_k": b.chunk_k,
                    "real_nnz": b.real_nnz,
                    "padding_ratio": b.padded_nnz / max(b.real_nnz, 1),
                }
                for b in self.bins
            ],
            "bytes_total": byt,
        }

    def unpermute(self, y: np.ndarray) -> np.ndarray:
        """Map kernel-order y back to natural row order (host-side)."""
        if self.row_perm is None:
            return y
        out = np.empty_like(y)
        out[self.row_perm] = y
        return out

    @classmethod
    def from_csr(
        cls,
        csr: CSRMatrix,
        *,
        k_bins=DEFAULT_K_BINS,
        value_dtype=None,
        layout: str = "auto",
        sigma_sort: bool = False,
        chunk_k: int = CHUNK_K,
        chunk_k_forced: bool = False,
        skip_empty: bool = False,
        merge_bins: bool = True,
        sg_slots: bool = True,
    ) -> "SellMatrix":
        """Convert CSR (column-sorted rows) to binned SELL-C-128.

        ``value_dtype`` defaults to the CSR value dtype (fp64 host-exact);
        :func:`..ops.pallas_sell.device_put_sell` casts on upload.
        ``layout``: "auto" picks per bin by cost model; "k-major"/"sb-major"
        force one. ``sigma_sort`` orders rows by descending nnz first
        (SELL-C-sigma); the kernel output is then in sorted order — use
        :meth:`unpermute` / :attr:`row_perm`. ``skip_empty`` drops groups
        with zero entries from all bins (their y tiles are never written —
        used by the column-panel decomposition where most panels touch only
        a row subset).
        """
        if value_dtype is None:
            value_dtype = csr.values.dtype
        if layout == "wl-shed":
            # window-layered with pile shedding: see _from_csr_wl_shed
            return cls._from_csr_wl_shed(
                csr, k_bins=k_bins, value_dtype=value_dtype, chunk_k=chunk_k,
                merge_bins=merge_bins, sg_slots=sg_slots,
                skip_empty=skip_empty)
        row_perm = None
        if sigma_sort and csr.nrows:
            nnz_per_row = csr.row_nnz()
            row_perm = np.argsort(-nnz_per_row, kind="stable").astype(np.int64)
            starts = csr.row_ptr[:-1][row_perm]
            lens = nnz_per_row[row_perm].astype(np.int64)
            new_ptr = np.zeros(csr.nrows + 1, dtype=np.int64)
            np.cumsum(lens, out=new_ptr[1:])
            within = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(new_ptr[:-1], lens)
            src = np.repeat(starts, lens) + within
            csr = CSRMatrix(
                nrows=csr.nrows,
                ncols=csr.ncols,
                row_ptr=new_ptr,
                col_idx=csr.col_idx[src],
                values=csr.values[src],
            )
        M, N = csr.nrows, csr.ncols
        num_groups = -(-M // GROUP_ROWS) if M else 0
        padded_rows = num_groups * GROUP_ROWS
        row_nnz = np.zeros(padded_rows, dtype=np.int64)
        row_nnz[:M] = csr.row_nnz()

        # per-group K and bin assignment
        kg = row_nnz.reshape(num_groups, GROUP_ROWS).max(axis=1) if num_groups else np.zeros(0, np.int64)
        kg = np.maximum(kg, 1)
        edges = np.asarray(sorted(set(int(e) for e in k_bins)), dtype=np.int64)
        kmax_needed = int(kg.max()) if num_groups else 1
        if kmax_needed > edges[-1]:
            extra = [edges[-1]]
            while extra[-1] < kmax_needed:
                extra.append(extra[-1] * 2)
            edges = np.unique(np.concatenate([edges, np.asarray(extra[1:], np.int64)]))
        bin_of_group = np.searchsorted(edges, kg, side="left")
        if skip_empty and num_groups:
            group_nnz_all = row_nnz.reshape(num_groups, GROUP_ROWS).sum(axis=1)
            bin_of_group = np.where(group_nnz_all > 0, bin_of_group, -1)

        # ---- ladder coarsening (stage A of call-count minimization) ----
        # Every bin is (at least) one pallas_call, and a call costs ~LAUNCH_S
        # of fixed overhead on this runtime (measured: probes/kernel_probe4 —
        # the r1 bench kernel spent ~50% of its wall time on 3 launches).
        # Greedily merge a K-bin into the next one while the extra padding
        # bytes stream cheaper than the saved launch.
        used = np.unique(bin_of_group[bin_of_group >= 0]) if num_groups else []
        if merge_bins and len(used) > 1:
            counts = {int(b): int((bin_of_group == b).sum()) for b in used}
            merged_into = {}
            blist = sorted(counts)
            i = 0
            while i < len(blist) - 1:
                b_lo, b_hi = blist[i], blist[i + 1]
                extra_bytes = counts[b_lo] * (int(edges[b_hi]) - int(edges[b_lo])) \
                    * GROUP_ROWS * 8
                lo_bytes = counts[b_lo] * int(edges[b_lo]) * GROUP_ROWS * 8
                # only absorb SMALL bins (few groups or sub-launch-cost
                # bytes): merging populous tiny-K bins upward (power-law
                # ladders) cascades K inflation that re-prices every kernel
                # choice downstream, not just the stream volume
                if extra_bytes < _LAUNCH_BYTES and (
                    counts[b_lo] <= 4 or extra_bytes < max(2 << 20, lo_bytes // 2)
                ):
                    bin_of_group = np.where(bin_of_group == b_lo, b_hi, bin_of_group)
                    counts[b_hi] += counts.pop(b_lo)
                    blist.pop(i)
                else:
                    i += 1

        # pad-column per padded row (reference hll_matrix.c:241-246 semantics;
        # empty rows use the superblock's min real column to keep sb-major
        # range scans tight — value is 0.0 so semantics are unchanged)
        last_col = np.full(padded_rows, -1, dtype=np.int64)
        rows_idx = np.flatnonzero(row_nnz[:M] > 0) if M else np.zeros(0, np.int64)
        if rows_idx.size:
            last_col[rows_idx] = csr.col_idx[csr.row_ptr[1:][rows_idx].astype(np.int64) - 1]
        first_col = np.full(padded_rows, np.iinfo(np.int64).max, dtype=np.int64)
        if rows_idx.size:
            first_col[rows_idx] = csr.col_idx[csr.row_ptr[:-1][rows_idx].astype(np.int64)]
        sb_min = first_col.reshape(-1, LANES).min(axis=1)  # per 128-row superblock
        sb_min = np.where(sb_min == np.iinfo(np.int64).max, 0, sb_min)
        fill = np.repeat(sb_min, LANES)
        last_col = np.where(last_col < 0, fill, last_col).astype(np.int32)

        rows_of_entries = csr.row_ids().astype(np.int64)
        within = np.arange(csr.nnz, dtype=np.int64) - csr.row_ptr[:-1].astype(np.int64)[rows_of_entries]

        # x-table row count exactly as pack_x_table builds it (sublane-aligned);
        # qbase clamping keeps every scanned slab index inside the table.
        Rp = slab_table_rows(N)

        # global slab lists, computed ONCE over all groups (a per-bin rebuild
        # re-sorts the full entry array per bin — measured 54 s at 32M nnz)
        g_slab_list, g_slab_count = _build_slab_lists_global(
            rows_of_entries, csr.col_idx, num_groups
        )

        # window-layered (wl) profile, also computed once (clustered-matrix
        # layout: one gather per layer tile; see _wl_profile). Forced
        # non-wl layouts skip it (r5 profile: 6-13 s at 22.7M nnz, output
        # discarded): zero NW keeps wl_ok False everywhere.
        if layout in ("auto", "wl"):
            wl_rb, wl_w, wl_s, wl_layer, wl_nwin_g, wl_L_g = _wl_profile(
                rows_of_entries, csr.col_idx, num_groups, Rp
            )
        else:
            wl_rb = wl_w = wl_s = wl_layer = np.zeros(0, np.int64)
            wl_nwin_g = np.zeros(max(num_groups, 1), np.int64)[:num_groups]
            wl_L_g = np.ones(max(num_groups, 1), np.int64)[:num_groups]
        wl_kw_g = 8 * wl_nwin_g * wl_L_g          # wl slots per row
        group_nnz_all = row_nnz.reshape(num_groups, GROUP_ROWS).sum(axis=1) \
            if num_groups else np.zeros(0, np.int64)

        # SG profile (scattered/short-row layout, formats/sg.py) — computed
        # only when some group looks scattered (distinct-slab count well past
        # its K: the regime where k-major's per-slab passes dwarf the entry
        # count — the reference serves it with the thread-per-row CUDA
        # kernel, csr_matrix_cuda.cu:122-148)
        sg_prof = None
        sg_far_vregs_g = None
        far_slab_list = far_slab_count = far_kg = None
        scattered = (
            g_slab_count.astype(np.int64) > np.maximum(48, 2 * kg)
            if num_groups else np.zeros(0, bool)
        )
        if layout == "sg" or (layout == "auto" and bool(np.any(scattered))):
            from .sg import sg_profile

            sg_prof = sg_profile(rows_of_entries, csr.col_idx, csr.values,
                                 num_groups, Rp, slots=sg_slots)
            # far remainder served by accumulate k-major bins: model + lists
            far_slab_list, far_slab_count = _build_slab_lists_global(
                sg_prof.far_rows.astype(np.int64), sg_prof.far_cols, num_groups
            )
            far_per_row = np.bincount(sg_prof.far_rows,
                                      minlength=padded_rows).astype(np.int64) \
                if sg_prof.far_rows.size else np.zeros(padded_rows, np.int64)
            far_kg = far_per_row.reshape(num_groups, GROUP_ROWS).max(axis=1)
            # modeled far cost matches the K-binned emission: per group, one
            # slab scan per PRESENT row-rung (K in {1,2,4,...}), so a single
            # worst row no longer multiplies the whole group's scan
            sg_far_vregs_g = np.zeros(num_groups, np.int64)
            if sg_prof.far_rows.size:
                fr = sg_prof.far_rows.astype(np.int64)
                newr = np.ones(fr.size, bool)
                newr[1:] = fr[1:] != fr[:-1]
                rstart = np.flatnonzero(newr)
                rcnt = np.diff(np.concatenate([rstart, [fr.size]]))
                rrows = fr[rstart]
                rung = np.maximum(
                    1, 1 << np.ceil(np.log2(rcnt)).astype(np.int64))
                gr = rrows // GROUP_ROWS
                pair = gr * 64 + np.minimum(
                    np.log2(rung).astype(np.int64), 63)
                upair = np.unique(pair)
                ug = upair // 64
                uk = np.int64(1) << (upair % 64)
                np.add.at(sg_far_vregs_g, ug,
                          5 * far_slab_count[ug].astype(np.int64) * uk)

        bins = []
        sg_far_groups: list = []  # union of sg-routed groups (far emitted
                                  # ONCE globally after all bins)

        def _emit_sg_far(gsub):
            """Far-remainder k-major bins for ``gsub`` (accumulate onto
            the sg core bin's y tiles; see formats/sg.py far split).

            Rows are K-BINNED by their far-entry count ({1,2,4,...}):
            the k-major kernel's cost is 5 ops x slabs x K, and one
            unbinned K=max bin multiplied every group's slab scan by
            its worst row (TPU-measured 12-24 ops per far entry on
            road links; K-binned ~5-6)."""
            fg = (sg_prof.far_rows.astype(np.int64) // GROUP_ROWS)
            ginv_f = np.full(num_groups, -1, np.int64)
            ginv_f[gsub] = 0
            fsel = np.flatnonzero(ginv_f[fg] >= 0)
            if fsel.size == 0:
                return
            rows_f = sg_prof.far_rows[fsel].astype(np.int64)
            cols_f = sg_prof.far_cols[fsel].astype(np.int64)
            vals_f = sg_prof.far_vals[fsel]
            # within-row occurrence + row far-count (CSR order)
            newr = np.ones(rows_f.size, bool)
            newr[1:] = rows_f[1:] != rows_f[:-1]
            rstart = np.flatnonzero(newr)
            rid = np.cumsum(newr) - 1
            occ = np.arange(rows_f.size) - rstart[rid]
            rcnt_run = np.diff(np.concatenate(
                [rstart, [rows_f.size]]))
            rcnt = rcnt_run[rid]          # per-entry row far-count
            # K ladder rung per entry's row
            rung = np.maximum(
                1, 1 << np.ceil(np.log2(rcnt)).astype(np.int64))
            for Kf64 in np.unique(rung):
                Kf = int(Kf64)
                esel = rung == Kf64
                fgk = fg[fsel][esel]
                gsub_far = np.unique(fgk).astype(np.int32)
                ginv_c = np.full(num_groups, -1, np.int64)
                ginv_c[gsub_far] = np.arange(gsub_far.size)
                ngf = gsub_far.size
                ja_f = np.full((ngf, Kf, SUBLANES, LANES),
                               np.int32((Rp - 1) * LANES))
                as_f = np.zeros((ngf, Kf, SUBLANES, LANES), value_dtype)
                gl = ginv_c[fgk]
                lr = rows_f[esel] - fgk * GROUP_ROWS
                i = lr // LANES
                j = lr - i * LANES
                ja_f[gl, occ[esel], i, j] = cols_f[esel].astype(np.int32)
                as_f[gl, occ[esel], i, j] = vals_f[esel].astype(value_dtype)
                # per-RUNG slab lists (this rung's entries only): the shared
                # per-group far list made every higher rung re-scan slabs
                # that only rung-1 rows touch (road: the K=2 bin re-scanned
                # ~164 slabs/group to serve ~17 entries/group)
                lst_r, cnt_r = _build_slab_lists_global(
                    rows_f[esel], cols_f[esel], num_groups)
                cnt_f = cnt_r[gsub_far]
                wv = max(int(cnt_f.max()), 1)
                wv = -(-wv // 8) * 8
                lst = lst_r[gsub_far]
                if lst.shape[1] < wv:
                    lst = np.concatenate(
                        [lst, np.full((ngf, wv - lst.shape[1]), Rp - 1,
                                      np.int32)], axis=1)
                else:
                    lst = lst[:, :wv]
                lst = np.where(lst >= Rp, np.int32(Rp - 1), lst)
                far_nnz_g = np.bincount(gl, minlength=ngf).astype(np.int64)
                per_call = max(1, _SMEM_LIST_BYTES // (wv * 4))
                for c0 in range(0, ngf, per_call):
                    sc = slice(c0, c0 + per_call)
                    bins.append(
                        SellBin(
                            k=Kf,
                            layout="k-major",
                            group_ids=gsub_far[sc],
                            ja=np.ascontiguousarray(
                                ja_f[sc]).reshape(-1, LANES),
                            as_=np.ascontiguousarray(
                                as_f[sc]).reshape(-1, LANES),
                            slab_list=np.ascontiguousarray(lst[sc]),
                            slab_count=cnt_f[sc].astype(np.int32),
                            real_nnz=int(far_nnz_g[sc].sum()),
                            cost_passes=int(
                                (5 * cnt_f[sc].astype(np.int64)
                                 * Kf).sum()),
                            add_into=True,
                        )
                    )

        for b_id in np.unique(bin_of_group) if num_groups else []:
            if b_id < 0:
                continue  # skip_empty: groups with no entries get no bin
            K = int(edges[b_id])
            gids_all = np.flatnonzero(bin_of_group == b_id).astype(np.int32)
            ginv = np.full(num_groups, -1, dtype=np.int64)
            ginv[gids_all] = np.arange(gids_all.size)
            ng = gids_all.size

            # build in k-major logical form (ng, K, 8, 128) first
            ja = np.empty((ng, K, SUBLANES, LANES), dtype=np.int32)
            as_ = np.zeros((ng, K, SUBLANES, LANES), dtype=value_dtype)
            pad_cols = last_col.reshape(num_groups, SUBLANES, LANES)[gids_all]
            ja[:] = pad_cols[:, None, :, :]

            g_all = rows_of_entries // GROUP_ROWS
            sel = ginv[g_all] >= 0
            if np.any(sel):
                r = rows_of_entries[sel]
                gl = ginv[g_all[sel]]
                lr = r - g_all[sel] * GROUP_ROWS
                i = lr // LANES
                j = lr - i * LANES
                k = within[sel]
                ja[gl, k, i, j] = csr.col_idx[sel]
                as_[gl, k, i, j] = csr.values[sel].astype(value_dtype)

            slab_list = g_slab_list[gids_all]
            slab_count = g_slab_count[gids_all]
            # trim the bin's list width to its own max count
            w = max(int(slab_count.max()) if slab_count.size else 1, 1)
            slab_list = np.ascontiguousarray(slab_list[:, :w])

            # ---- per-group layout + span decision ----
            def _chunk_view(ck_c):
                """(jat, q, qc, qmin, spans) for chunk height ck_c."""
                Kp_c = -(-K // ck_c) * ck_c
                jat_c = np.transpose(ja, (0, 2, 1, 3))
                if Kp_c != K:
                    jat_c = np.concatenate(
                        [jat_c, np.broadcast_to(
                            pad_cols[:, :, None, :],
                            (ng, SUBLANES, Kp_c - K, LANES))],
                        axis=2,
                    )
                q_c = jat_c >> 7  # col // 128, int32 (no upcast copy)
                qc_c = q_c.reshape(ng, SUBLANES, Kp_c // ck_c, ck_c, LANES)
                qmin_c = qc_c.min(axis=(3, 4))          # (ng, 8, nchunks)
                spans_c = qc_c.max(axis=(3, 4)) - qmin_c + 1
                return jat_c, q_c, qc_c, qmin_c, spans_c

            # Chunk height for K>64 bins is SPAN-RESOLVED (round 4): the r3
            # blanket "K>64 -> ck16" rule regressed ml_laplace 2x — on
            # span-scan shapes a (16,128) chunk's pass costs ~3x an (8,128)
            # pass while its span only shrinks ~17% (TPU-measured Aug 20:
            # ck8 1.69 ms / 32.8 GF vs ck16 3.01 ms / 18.4 GF, no-merge,
            # result_tpu_r4_mlck8 vs _mlab). Taller chunks exist to fit the
            # static-unroll caps on wide-random bins (banded_fem_large):
            # use them ONLY when the base chunk's typical (median) group
            # span would overflow those caps. Explicit chunk_k
            # (chunk_k_forced, --chunk-k) always wins.
            base_ck = int(chunk_k)
            if K <= 64 or chunk_k_forced:
                ck = base_ck
            else:
                ck = max(base_ck, 16)
                if base_ck < 16:
                    _, _, _, _, spans_b = _chunk_view(base_ck)
                    gs_b = spans_b.max(axis=(1, 2))
                    med_b = int(np.median(gs_b)) if gs_b.size else 1
                    nch_b = -(-K // base_ck)
                    if (med_b <= _MAX_STATIC_SPAN
                            and nch_b * med_b <= _MAX_STATIC_BODIES):
                        ck = base_ck
            Kp = -(-K // ck) * ck  # sb-major padded width
            nchunks = Kp // ck
            jat, q, qc, qmin, spans = _chunk_view(ck)
            g_span = spans.max(axis=(1, 2))                 # (ng,) max span per group
            # quantize spans: multiples of 4 up to 64 (tight), pow2 beyond
            # (bounds sub-bin count without the ~60% pow2 over-scan waste)
            s_q = np.where(
                g_span <= 64,
                -(-g_span // 4) * 4,
                1 << np.ceil(np.log2(np.maximum(g_span, 1))).astype(np.int64),
            )
            s_q = np.minimum(np.maximum(s_q, 1), max(Rp, 1))

            # per-chunk DISTINCT slab lists ("sb-list" hybrid): robust when a
            # chunk's slab *range* is wide but its distinct count is small
            # (boundary rows in stencil matrices shift k-alignment: fem3d
            # chunks span ~85 slabs while touching ~4 distinct ones).
            # Skipped for forced non-sb-list layouts: the distinct pass is
            # the conversion's hottest host op (r5 profile: ~9-13 s at 22.7M
            # nnz) and its output would be discarded.
            if layout in ("auto", "sb-list"):
                chunk_lists, chunk_distinct = _per_chunk_distinct(
                    qc.reshape(ng * SUBLANES * nchunks, ck * LANES)
                )
                g_distinct = chunk_distinct.reshape(ng, -1).max(axis=1)
                d_q = np.minimum(-(-g_distinct // 2) * 2, np.maximum(s_q, 2))
            else:
                chunk_lists = None
                d_q = np.maximum(s_q, 2)

            # modeled vreg-op-equivalents per group (ops on (8,128) registers):
            #   sb-major: per chunk, span gather passes (~5 ops) + 2
            #   sb-list : per chunk, distinct gather passes (~6 ops —
            #             probe5: ≈ a sb-major pass when chunk loops unroll;
            #             the earlier 2x penalty was SMEM-table pressure from
            #             an over-merged 1.4 MB prefetch list, now guarded)
            #   k-major : per distinct slab, K tile-vregs x ~5 ops
            # a (16,128) chunk's pass costs ~3x an (8,128) pass (2 vregs +
            # non-dual-issued mask/select; TPU-measured ml_laplace Aug 20:
            # 3.01 ms at 6x24 ck16 passes vs 1.69 ms at 12x20 ck8 passes)
            ck_vf = 1 if ck <= SUBLANES else 3
            cost_sb_g = SUBLANES * nchunks * (5 * s_q + 2) * ck_vf
            cost_sl_g = SUBLANES * nchunks * (6 * d_q + 2) * ck_vf
            cost_km_g = 5 * slab_count.astype(np.int64) * K + K
            #   wl      : per row-block, NW windows x (W build + L gathers)
            nw_b = wl_nwin_g[gids_all]
            L_b = wl_L_g[gids_all]
            cost_wl_g = SUBLANES * nw_b * (_WL_WIN_VREGS + 4 * L_b)
            # fill guard: wl slots within 3x the group's real entries —
            # scattered/uniform-random groups would stream mostly padding
            # even at wl's higher effective BW (uniform-random 41/row
            # chose wl at 4.7x padding under a 6x guard). A FORCED wl
            # (layout="wl" — the autotuner's measured candidate) relaxes
            # the cap to 8x: padding only wastes measurable bandwidth,
            # while the NW/L/tile guards (Mosaic compile safety) stay.
            fill_cap = 8 if layout == "wl" else 3
            wl_ok = (
                (nw_b <= _WL_MAX_NW) & (L_b <= _WL_MAX_L)
                & (nw_b * L_b <= _WL_MAX_TILES) & (nw_b > 0)
                & (wl_kw_g[gids_all] * GROUP_ROWS
                   <= fill_cap * np.maximum(group_nnz_all[gids_all], 1))
            )
            # compare as SECONDS: layouts stream different volumes (wl slots
            # per row = 8*NW*L, independent of K)
            bpr = GROUP_ROWS * 8  # bytes per padded entry-row of 1024 slots
            big = np.float64(1e30)
            sec_km = np.maximum(K * bpr / _PALLAS_BW, cost_km_g * _VREG_OP_S)
            sec_sb = np.maximum(Kp * bpr / _PALLAS_BW, cost_sb_g * _VREG_OP_S)
            sec_sl = np.maximum(Kp * bpr / _PALLAS_BW, cost_sl_g * _VREG_OP_S)
            sec_wl = np.maximum(wl_kw_g[gids_all] * bpr / _PALLAS_BW_WL,
                                cost_wl_g * _VREG_OP_S)
            # sg: core tiles stream T_g rows/group; far remainder adds its
            # own k-major cost (it becomes an accumulate bin on the same
            # groups). Inadmissible when most entries are far (power-law
            # tails: sg degenerates to k-major with extra launches).
            if sg_prof is not None:
                T_b = sg_prof.T_g[gids_all]
                cost_sg_g = sg_prof.vregs_g[gids_all] + sg_far_vregs_g[gids_all]
                sec_sg = np.maximum(
                    (T_b + np.maximum(far_kg[gids_all], 0)) * bpr / _PALLAS_BW,
                    cost_sg_g * _VREG_OP_S,
                )
                # admissible at ANY core fraction: a mostly-far group still
                # beats plain k-major, whose cost multiplies every slab pass
                # by the group's worst row while the K-binned far rungs pay
                # only the rungs present (sec_sg prices both parts)
                sg_ok = np.ones(ng, bool)
                sec_sg_c = sec_sg
            else:
                sec_sg_c = np.full(ng, big)
                sg_ok = np.zeros(ng, bool)
            if layout == "sb-major":
                choice = np.full(ng, 1)
            elif layout == "k-major":
                choice = np.full(ng, 0)
            elif layout == "sb-list":
                choice = np.full(ng, 2)
            elif layout == "wl":
                choice = np.where(wl_ok, 3, 0)
            elif layout == "sg":
                choice = np.where(sg_ok, 4, 0)
            else:
                # static-span kernels unroll `span` gather passes per chunk:
                # beyond _MAX_STATIC_SPAN the bodies blow up compile time and
                # execute mostly-masked passes — the rolled dynamic k-major
                # loop (actual distinct count only) is the scattered-matrix
                # tool (webbase/road regimes)
                sec_sb_c = np.where(
                    (s_q > _MAX_STATIC_SPAN)
                    | (nchunks * s_q > _MAX_STATIC_BODIES), big, sec_sb)
                sec_sl_c = np.where(
                    (d_q > _MAX_STATIC_SPAN)
                    | (nchunks * d_q > _MAX_STATIC_BODIES), big, sec_sl)
                sec_wl_c = np.where(wl_ok, sec_wl, big)
                costs = np.stack([sec_km, sec_sb_c, sec_sl_c, sec_wl_c,
                                  sec_sg_c])
                choice = np.argmin(costs, axis=0)
            forced = layout != "auto"

            group_nnz = row_nnz.reshape(num_groups, GROUP_ROWS).sum(axis=1)

            def _sb_arrays(sub):
                ast = np.transpose(as_[sub], (0, 2, 1, 3))
                if Kp != K:
                    ast = np.concatenate(
                        [ast, np.zeros((sub.size, SUBLANES, Kp - K, LANES),
                                       dtype=value_dtype)],
                        axis=2,
                    )
                return (
                    np.ascontiguousarray(jat[sub]).reshape(-1, LANES),
                    np.ascontiguousarray(ast).reshape(-1, LANES),
                )

            def emit(mask, lay, span_val, nw_val=0):
                sub = np.flatnonzero(mask)
                if sub.size == 0:
                    return
                gsub = gids_all[sub]
                real = int(group_nnz[gsub].sum())
                if lay == "sg":
                    from .sg import emit_sg_core

                    Tq, Vq = int(nw_val), int(span_val)
                    stride = 2 if Vq == 0 else 1
                    per_call = max(1, _SMEM_LIST_BYTES // (Tq * stride * 4))
                    for c0 in range(0, gsub.size, per_call):
                        gsc = gsub[c0 : c0 + per_call]
                        kw = emit_sg_core(sg_prof, gsc, Tq, Vq, Rp, value_dtype)
                        bins.append(SellBin(**kw))
                    # far remainder deferred: emitted ONCE globally after
                    # every bin (each far bin is a pallas call)
                    sg_far_groups.append(gsub)
                elif lay == "wl":
                    ginv_c = np.full(num_groups, -1, dtype=np.int64)
                    ginv_c[gsub] = np.arange(gsub.size)
                    ja_b, as_b, slabs = _emit_wl_bin(
                        csr, rows_of_entries, csr.col_idx, gsub, ginv_c,
                        wl_rb, wl_w, wl_s, wl_layer,
                        int(nw_val), int(span_val), Rp, value_dtype, Rp,
                    )
                    bins.append(
                        SellBin(
                            k=8 * int(nw_val) * int(span_val),
                            layout="wl",
                            group_ids=gsub,
                            ja=ja_b,
                            as_=as_b,
                            slab_list=slabs,
                            slab_count=(wl_nwin_g[gsub] * wl_L_g[gsub] * 8
                                        ).astype(np.int32),
                            real_nnz=real,
                            span=int(span_val),   # wl: layers per window
                            chunk_k=int(nw_val),  # wl: windows per row-block
                            cost_passes=int(cost_wl_g[sub].sum()),
                        )
                    )
                elif lay == "sb-major":
                    qb = np.clip(qmin[sub], 0, max(Rp - span_val, 0)).astype(np.int32)
                    ja_b, as_b = _sb_arrays(sub)
                    bins.append(
                        SellBin(
                            k=Kp,
                            layout="sb-major",
                            group_ids=gsub,
                            ja=ja_b,
                            as_=as_b,
                            slab_list=qb.reshape(sub.size, SUBLANES * nchunks),
                            slab_count=np.full(sub.size, span_val, np.int32),
                            real_nnz=real,
                            span=int(span_val),
                            chunk_k=ck,
                            cost_passes=int(cost_sb_g[sub].sum()),
                        )
                    )
                elif lay == "sb-list":
                    # per-chunk distinct slab lists padded with -1 (never
                    # matches; the kernel clamps the x read); the table is
                    # padded/truncated to exactly span_val per chunk — the
                    # kernel strides by it
                    lists = chunk_lists.reshape(ng, SUBLANES * nchunks, -1)[sub]
                    lists = np.where(lists < 0, np.int32(Rp - 1), lists)
                    w = lists.shape[2]
                    if w < span_val:
                        lists = np.concatenate(
                            [lists, np.full((lists.shape[0], lists.shape[1],
                                             span_val - w), Rp - 1, np.int32)],
                            axis=2,
                        )
                    else:
                        lists = lists[:, :, :span_val]
                    lists2 = lists.reshape(sub.size, -1)
                    per_call = max(1, _SMEM_LIST_BYTES // (lists2.shape[1] * 4))
                    for c0 in range(0, sub.size, per_call):
                        sc = slice(c0, c0 + per_call)
                        gsc = gsub[sc]
                        ja_b, as_b = _sb_arrays(sub[sc])
                        bins.append(
                            SellBin(
                                k=Kp,
                                layout="sb-list",
                                group_ids=gsc,
                                ja=ja_b,
                                as_=as_b,
                                slab_list=np.ascontiguousarray(lists2[sc]),
                                slab_count=np.full(gsc.size, span_val, np.int32),
                                real_nnz=int(group_nnz[gsc].sum()),
                                span=int(span_val),
                                chunk_k=ck,
                                cost_passes=int(cost_sl_g[sub[sc]].sum()),
                            )
                        )
                else:
                    # scalar-prefetch tables live in SMEM: multi-MB k-major
                    # slab lists (power-law: s_max ~8000 x hundreds of
                    # groups) crash the Mosaic compile helper — chunk the
                    # bin so each call's table fits the budget
                    per_call = max(1, _SMEM_LIST_BYTES
                                   // (max(slab_list.shape[1], 1) * 4))
                    for c0 in range(0, sub.size, per_call):
                        sc = sub[c0 : c0 + per_call]
                        gsc = gids_all[sc]
                        # width to a multiple of 8 (the kernel scans the
                        # list in chunks of 8); pad with the spare zero slab
                        # Rp-1 — in range, referenced by no entry
                        wv = max(int(slab_count[sc].max()), 1)
                        wv = -(-wv // 8) * 8
                        lst = slab_list[sc]
                        if lst.shape[1] < wv:
                            lst = np.concatenate(
                                [lst, np.full((lst.shape[0], wv - lst.shape[1]),
                                              Rp - 1, np.int32)], axis=1)
                        lst = np.where(lst >= Rp, np.int32(Rp - 1), lst)
                        bins.append(
                            SellBin(
                                k=K,
                                layout="k-major",
                                group_ids=gsc,
                                ja=np.ascontiguousarray(ja[sc]).reshape(-1, LANES),
                                as_=np.ascontiguousarray(as_[sc]).reshape(-1, LANES),
                                slab_list=np.ascontiguousarray(lst[:, :wv]),  # Rp-1 padded
                                slab_count=slab_count[sc],
                                real_nnz=int(group_nnz[gsc].sum()),
                                cost_passes=int(cost_km_g[sc].sum()),
                            )
                        )

            # ---- cluster merging (stage B/C of call-count minimization) ----
            # Each emitted bin is one pallas_call (~_LAUNCH_S fixed). Greedily
            # merge span sub-bins / layout classes while the modeled cost
            # (max of DMA and vector-op time, which overlap) of the merged
            # call beats the two separate launches. Mixed-layout merges land
            # on sb-list (the most general layout: per-chunk distinct lists
            # are valid for any group, and distinct <= range always).
            clusters = []  # (lay, span, nw, local-idx array)
            if np.any(choice == 0):
                clusters.append(("k-major", 0, 0, np.flatnonzero(choice == 0)))
            for sv in np.unique(s_q[choice == 1]) if np.any(choice == 1) else []:
                clusters.append(
                    ("sb-major", int(sv), 0,
                     np.flatnonzero((choice == 1) & (s_q == sv))))
            for dv in np.unique(d_q[choice == 2]) if np.any(choice == 2) else []:
                clusters.append(
                    ("sb-list", int(dv), 0,
                     np.flatnonzero((choice == 2) & (d_q == dv))))
            if np.any(choice == 3):
                wsel = choice == 3
                for nwv in np.unique(nw_b[wsel]):
                    for lv in np.unique(L_b[wsel & (nw_b == nwv)]):
                        clusters.append(
                            ("wl", int(lv), int(nwv),
                             np.flatnonzero(wsel & (nw_b == nwv) & (L_b == lv))))
            if np.any(choice == 4):
                from .sg import quantize_T, quantize_V

                sgsel = choice == 4
                Tq_g = quantize_T(sg_prof.T_g[gids_all])
                # sg statics go one rung past the sb cap: the 8-aligned w0
                # can widen a span_cap(40)-trimmed window to at most 47
                Vq_g = quantize_V(sg_prof.V_g[gids_all], _SG_MAX_STATIC)
                for tqv in np.unique(Tq_g[sgsel]):
                    tsel = sgsel & (Tq_g == tqv)
                    for vqv in np.unique(Vq_g[tsel]):
                        clusters.append(
                            ("sg", int(vqv), int(tqv),
                             np.flatnonzero(tsel & (Vq_g == vqv))))

            def _vregs(lay, span, nw, idx):
                if lay == "k-major":
                    return float(cost_km_g[idx].sum())
                if lay == "wl":
                    return float(SUBLANES * nw * (_WL_WIN_VREGS + 4 * span)
                                 * idx.size)
                if lay == "sg":
                    if span > 0:
                        # static candidate: every tile runs `span` passes —
                        # merged clusters must price the widened rung, or
                        # the merger collapses everything to one V=48 bin
                        core = float(
                            (sg_prof.T_g[gids_all[idx]]
                             * (9 * span // 2 + 38)).sum())
                    else:
                        core = float(sg_prof.vregs_g[gids_all[idx]].sum())
                    return core + float(sg_far_vregs_g[gids_all[idx]].sum())
                per_chunk = (5 if lay == "sb-major" else 6) * span + 2
                return float(SUBLANES * nchunks * per_chunk * idx.size)

            def _cost(lay, span, nw, idx):
                if lay == "k-major":
                    width = K
                elif lay == "wl":
                    width = 8 * nw * span
                elif lay == "sg":
                    width = nw  # tiles per group (+far, priced in _vregs)
                else:
                    width = Kp
                bw = _PALLAS_BW_WL if lay == "wl" else _PALLAS_BW
                dma = width * GROUP_ROWS * 8 * idx.size / bw
                # sg clusters each cost a core call plus a share of the far
                # rung calls; measured in-jit per-call cost is ~3x the bare
                # launch constant (probes/sg_bins_road2.out) — price it so
                # the merger collapses near-identical (Tq, Vq) clusters
                launches = 4 * _LAUNCH_S if lay == "sg" else _LAUNCH_S
                # sg pass-ops measure ~2 cycles/op (road prefix probe) —
                # ~8x the sb calibration; pricing them at the global
                # constant made the merger collapse every static cluster
                # into one max-V bin that runs 48 passes on 8-pass tiles
                op_s = _SG_OP_S if lay == "sg" else _VREG_OP_S
                return max(dma, _vregs(lay, span, nw, idx) * op_s) \
                    + launches

            def _valid(lay, span, nw, idx):
                if lay == "sg":
                    return span == 0 or span <= _SG_MAX_STATIC
                if lay == "wl":
                    return (nw <= _WL_MAX_NW and span <= _WL_MAX_L
                            and nw * span <= _WL_MAX_TILES
                            and idx.size * SUBLANES * nw * 8 * 4
                            <= _SMEM_LIST_BYTES)
                if span > _MAX_STATIC_SPAN or nchunks * span > _MAX_STATIC_BODIES:
                    return False
                # scalar-prefetch list table must stay SMEM-resident
                if lay == "sb-list" and idx.size * SUBLANES * nchunks * span * 4 \
                        > _SMEM_LIST_BYTES:
                    return False
                return True

            def _merged(c1, c2):
                """Cheapest valid merge candidate of two clusters, or None."""
                (l1, s1, n1, i1), (l2, s2, n2, i2) = c1, c2
                idx = np.concatenate([i1, i2])
                cands = []
                if l1 == "wl" or l2 == "wl":
                    # wl merges only with wl (different data interleave)
                    if l1 == "wl" and l2 == "wl":
                        cand = ("wl", max(s1, s2), max(n1, n2), idx)
                        if _valid(*cand):
                            cands.append(cand)
                    return min(cands, key=lambda c: _cost(*c)) if cands else None
                if l1 == "sg" or l2 == "sg":
                    # sg merges only with sg, and static only with static:
                    # one dynamic member would put every merged group on the
                    # rolled dynamic kernel (measured 6x slower than static)
                    if l1 == "sg" and l2 == "sg" and (s1 == 0) == (s2 == 0):
                        sv = 0 if s1 == 0 else max(s1, s2)
                        cand = ("sg", sv, max(n1, n2), idx)
                        if _valid(*cand):
                            cands.append(cand)
                    return min(cands, key=lambda c: _cost(*c)) if cands else None
                # sb-major covers any group via its slab RANGE (s_q);
                # sb-list covers any group via its DISTINCT count (d_q).
                # Under a forced layout, only same-layout merges are legal.
                span_sb = int(s_q[idx].max())
                if (not forced or layout == "sb-major") \
                        and _valid("sb-major", span_sb, 0, idx):
                    cands.append(("sb-major", span_sb, 0, idx))
                span_sl = int(d_q[idx].max())
                if (not forced or layout == "sb-list") \
                        and _valid("sb-list", span_sl, 0, idx):
                    cands.append(("sb-list", span_sl, 0, idx))
                if not cands:
                    return None
                return min(cands, key=lambda c: _cost(*c))

            # merging applies under forced layouts too (it only ever merges
            # same-layout clusters, so the forced choice is preserved; the
            # r2 guard left forced-sg sweeps fragmented into ~10 calls)
            improved = merge_bins and len(clusters) > 1
            while improved:
                improved = False
                best = None
                for a in range(len(clusters)):
                    for b in range(a + 1, len(clusters)):
                        cand = _merged(clusters[a], clusters[b])
                        if cand is None:
                            continue
                        delta = _cost(*cand) - _cost(*clusters[a]) - _cost(*clusters[b])
                        if delta < 0 and (best is None or delta < best[0]):
                            best = (delta, a, b, cand)
                if best is not None:
                    _, a, b, cand = best
                    clusters = [c for i, c in enumerate(clusters) if i not in (a, b)]
                    clusters.append(cand)
                    improved = len(clusters) > 1

            for lay, span, nw, idx in clusters:
                mask = np.zeros(ng, dtype=bool)
                mask[idx] = True
                emit(mask, lay, int(span), nw)

        if sg_far_groups:
            _emit_sg_far(np.unique(np.concatenate(sg_far_groups)))

        return cls(nrows=M, ncols=N, nnz=csr.nnz, bins=bins,
                   num_groups=num_groups, row_perm=row_perm)

    @classmethod
    def from_coo(cls, coo: COOMatrix, **kw) -> "SellMatrix":
        return cls.from_csr(CSRMatrix.from_coo(coo), **kw)

    @classmethod
    def _from_csr_wl_shed(cls, csr: CSRMatrix, *, k_bins, value_dtype,
                          chunk_k, merge_bins, sg_slots,
                          skip_empty: bool = False) -> "SellMatrix":
        """WL with pile shedding (the "slot-packing" pass of RESULTS.md).

        Forced-wl padding on random-in-band matrices is pile-depth driven:
        a slab's slots are sized by the DEEPEST (row, slab) pile in its
        128-row block (max over lanes), and every slot carries all L layers
        — banded_adversarial measures 4.4x padding where the typical pile
        is 1-2 deep. Here each (row, slab) pile keeps only its first D
        occurrences for the wl part (one slot per slab at L = D) and sheds
        the overflow to an auto-layout remainder converted separately, whose
        bins ACCUMULATE onto the wl part's tiles (``add_into=True`` — the
        same private-buffer assembly the sg far remainders use,
        ops/pallas_sell.py assembly="auto"). D is chosen per group by the
        bytes-vs-launch cost model. An autotune candidate measures this
        against plain wl/sb-major (tune/autotune.py "default-wlshed")."""
        import dataclasses

        M, N = csr.nrows, csr.ncols
        num_groups = -(-M // GROUP_ROWS) if M else 0
        nnz = csr.nnz
        base_kw = dict(k_bins=k_bins, value_dtype=value_dtype,
                       chunk_k=chunk_k, merge_bins=merge_bins,
                       sg_slots=sg_slots, skip_empty=skip_empty)
        if nnz == 0 or num_groups == 0:
            return cls.from_csr(csr, layout="wl", **base_kw)

        rows = csr.row_ids().astype(np.int64)
        q = csr.col_idx.astype(np.int64) >> 7
        # (row, slab) pile runs — consecutive in CSR order (row-major,
        # columns sorted within rows)
        change = np.ones(nnz, dtype=bool)
        change[1:] = (rows[1:] != rows[:-1]) | (q[1:] != q[:-1])
        run_id = np.cumsum(change) - 1
        run_start = np.flatnonzero(change)
        occ = np.arange(nnz, dtype=np.int64) - run_start[run_id]
        run_len = np.diff(np.append(run_start, nnz))
        run_g = (rows[run_start] // GROUP_ROWS).astype(np.int64)

        # one slot per (row-block, slab): NW per group is D-independent
        rb_of_run = rows[run_start] >> 7
        rb_slab = np.unique(rb_of_run * np.int64(-(-N // LANES) + 1)
                            + q[run_start])
        s_rb = np.bincount(
            (rb_slab // np.int64(-(-N // LANES) + 1)).astype(np.int64),
            minlength=num_groups * SUBLANES)
        nw_g = np.maximum(
            (-(-s_rb // 8)).reshape(num_groups, SUBLANES).max(axis=1), 1)

        # choose D per group: main wl bytes/vregs at L=D vs shed volume
        bpr = GROUP_ROWS * 8
        nnz_g = np.bincount(run_g, weights=run_len.astype(np.float64),
                            minlength=num_groups)
        best_sec = np.full(num_groups, np.inf)
        D_g = np.full(num_groups, 8, dtype=np.int64)  # fallback: shed >8 piles
        for D in (1, 2, 4, 8):
            kept_g = np.bincount(
                run_g, weights=np.minimum(run_len, D).astype(np.float64),
                minlength=num_groups)
            sec_main = np.maximum(
                8 * nw_g * D * bpr / _PALLAS_BW_WL,
                SUBLANES * nw_g * (_WL_WIN_VREGS + 4 * D) * _VREG_OP_S)
            sec = sec_main + (nnz_g - kept_g) * 12.0 / _PALLAS_BW
            sec = np.where((nw_g > _WL_MAX_NW) | (nw_g * D > _WL_MAX_TILES),
                           np.inf, sec)
            better = sec < best_sec
            best_sec = np.where(better, sec, best_sec)
            D_g = np.where(better, D, D_g)

        keep = occ < D_g[(rows // GROUP_ROWS).astype(np.int64)]
        if keep.all():
            return cls.from_csr(csr, layout="wl", **base_kw)

        def _mask_csr(mask):
            cnt = np.bincount(rows[mask], minlength=M)
            ptr = np.zeros(M + 1, dtype=np.int64)
            np.cumsum(cnt, out=ptr[1:])
            return CSRMatrix(M, N, ptr, csr.col_idx[mask], csr.values[mask])

        main = cls.from_csr(_mask_csr(keep), layout="wl", **base_kw)
        resid = cls.from_csr(_mask_csr(~keep), layout="auto",
                             **{**base_kw, "skip_empty": True})
        bins = list(main.bins) + [dataclasses.replace(b, add_into=True)
                                  for b in resid.bins]
        return cls(nrows=M, ncols=N, nnz=nnz, bins=bins,
                   num_groups=num_groups, row_perm=None)

    def spmv(self, x: np.ndarray) -> np.ndarray:
        """Host oracle over the SELL layout (fp64) — differential-test anchor."""
        x = np.asarray(x, dtype=np.float64)
        y = np.zeros(self.padded_rows, dtype=np.float64)
        for bin_ in self.bins:
            ng, K = bin_.n_groups, bin_.k
            if bin_.layout == "k-major":
                ja = bin_.ja.reshape(ng, K, SUBLANES, LANES)
                as_ = bin_.as_.reshape(ng, K, SUBLANES, LANES)
                xp = np.concatenate([x, np.zeros(
                    max(0, int(ja.max()) + 1 - x.size))])
                contrib = (as_.astype(np.float64) * xp[ja]).sum(axis=1)  # (ng,8,128)
            elif bin_.layout == "sg":
                # decode md = (doff*8 + sigma)*128 + m against the shared
                # per-tile window base (slab_list: [w0(, passes)] per tile);
                # the destination sigma-row comes from md's sigma bits (in
                # slots mode the position sublane is a free slot)
                T = K
                tab = bin_.slab_list.reshape(ng, T, -1).astype(np.int64)
                w0 = tab[:, :, 0]                       # (ng, T)
                md = bin_.ja.reshape(ng, T, SUBLANES, LANES).astype(np.int64)
                as_ = bin_.as_.reshape(ng, T, SUBLANES, LANES)
                cols = (w0[:, :, None, None] + (md >> 10)) * LANES + (md & 127)
                xp = np.concatenate([x, np.zeros(
                    max(0, int(cols.max()) + 1 - x.size))])
                prod = as_.astype(np.float64) * xp[cols]  # (ng, T, 8, 128)
                sig = (md >> 7) & (SUBLANES - 1)
                rows_sg = (
                    bin_.group_ids.astype(np.int64)[:, None, None, None]
                    * GROUP_ROWS + sig * LANES
                    + np.arange(LANES)[None, None, None, :]
                )
                np.add.at(y, rows_sg.reshape(-1), prod.reshape(-1))
                continue
            elif bin_.layout == "wl":
                # ja holds lane offsets m; columns reconstruct from the
                # per-(row-block, window, slot) slab table
                NW, L = bin_.chunk_k, bin_.span
                m = bin_.ja.reshape(ng, SUBLANES, NW, L, 8, LANES)
                as_ = bin_.as_.reshape(ng, SUBLANES, NW, L, 8, LANES)
                slabs = bin_.slab_list.reshape(ng, SUBLANES, NW, 8)
                xp = np.concatenate([x, np.zeros(
                    max(0, (int(slabs.max()) + 1) * LANES - x.size))])
                cols = slabs[:, :, :, None, :, None].astype(np.int64) * LANES \
                    + m
                contrib = (as_.astype(np.float64) * xp[cols]).sum(axis=(2, 3, 4))
                # contrib: (ng, 8 row-blocks, 128 lanes) — matches the row
                # mapping (row = group*1024 + rb*128 + lane)
            else:
                ja = bin_.ja.reshape(ng, SUBLANES, K, LANES)
                as_ = bin_.as_.reshape(ng, SUBLANES, K, LANES)
                contrib = (as_.astype(np.float64) * x[ja]).sum(axis=2)  # (ng,8,128)
            rows = (
                bin_.group_ids.astype(np.int64)[:, None, None] * GROUP_ROWS
                + np.arange(SUBLANES)[None, :, None] * LANES
                + np.arange(LANES)[None, None, :]
            )
            # += (not =): add_into bins (sg far remainders) share groups with
            # their core bin; rows within one bin are unique, so fancy-index
            # accumulation is exact
            y[rows.reshape(-1)] += contrib.reshape(-1)
        return y[: self.nrows]


@dataclass(frozen=True)
class PanelSellMatrix:
    """Column-panel decomposition of SELL-C-128 for x beyond the VMEM budget.

    The reference's kernels read x straight from global memory at any N
    (src/csr_matrix.c:130-139; the CUDA shared-memory variant caches only a
    1024-entry prefix, cuda_src/csr_matrix_cuda.cu:228-232). On TPU the
    x-table must live in VMEM, so large N is handled by splitting columns
    into slab-aligned panels: each panel is an independent SELL conversion
    over the column range (entries stay row-major, column indices rebased),
    empty groups skipped, and the kernels accumulate y across panels.
    """

    nrows: int
    ncols: int
    nnz: int
    num_groups: int
    bounds: tuple            # (P+1,) column panel edges, multiples of 128
    panels: list             # list[SellMatrix], one per panel
    row_perm: np.ndarray | None = None

    @property
    def shape(self) -> tuple:
        return (self.nrows, self.ncols)

    @property
    def padded_nnz(self) -> int:
        return sum(p.padded_nnz for p in self.panels)

    @property
    def padding_ratio(self) -> float:
        return self.padded_nnz / max(self.nnz, 1)

    def memory_stats(self) -> dict:
        per = [p.memory_stats() for p in self.panels]
        return {
            "rows": self.nrows,
            "cols": self.ncols,
            "nnz": self.nnz,
            "padded_nnz": self.padded_nnz,
            "padding_ratio": self.padding_ratio,
            "num_panels": len(self.panels),
            "num_bins": sum(s["num_bins"] for s in per),
            "bin_ks": [k for s in per for k in s["bin_ks"]],
            "bin_layouts": [l for s in per for l in s["bin_layouts"]],
            "bins": [b for s in per for b in s["bins"]],
            "bytes_total": sum(s["bytes_total"] for s in per),
        }

    def unpermute(self, y: np.ndarray) -> np.ndarray:
        if self.row_perm is None:
            return y
        out = np.empty_like(y)
        out[self.row_perm] = y
        return out

    @classmethod
    def from_csr(
        cls,
        csr: CSRMatrix,
        max_panel_cols: int,
        *,
        sigma_sort: bool = False,
        **sell_kw,
    ) -> "PanelSellMatrix":
        """Split ``csr`` into ceil(N / max_panel_cols) column panels and
        convert each to SELL independently. ``max_panel_cols`` is rounded
        down to a multiple of 128 (slab alignment)."""
        W = max(LANES, (int(max_panel_cols) // LANES) * LANES)
        M, N = csr.nrows, csr.ncols
        n_panels = max(1, -(-N // W))
        bounds = tuple(min(p * W, N) for p in range(n_panels + 1))

        row_perm = None
        if sigma_sort and M:
            # apply the sigma permutation once, globally, then panel-split
            nnz_per_row = csr.row_nnz()
            row_perm = np.argsort(-nnz_per_row, kind="stable").astype(np.int64)
            perm = row_perm
            starts = csr.row_ptr[:-1][perm]
            lens = nnz_per_row[perm].astype(np.int64)
            new_ptr = np.zeros(M + 1, dtype=np.int64)
            np.cumsum(lens, out=new_ptr[1:])
            within = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
                new_ptr[:-1], lens
            )
            src = np.repeat(starts, lens) + within
            csr = CSRMatrix(
                nrows=M, ncols=N, row_ptr=new_ptr,
                col_idx=csr.col_idx[src], values=csr.values[src],
            )

        rows = csr.row_ids().astype(np.int64)
        panels = []
        for p in range(n_panels):
            c0, c1 = bounds[p], bounds[p + 1]
            mask = (csr.col_idx >= c0) & (csr.col_idx < c1)
            sub_rows = rows[mask]
            counts = np.bincount(sub_rows, minlength=M).astype(np.int64)
            ptr = np.zeros(M + 1, dtype=np.int64)
            np.cumsum(counts, out=ptr[1:])
            sub = CSRMatrix(
                nrows=M,
                ncols=c1 - c0,
                row_ptr=ptr,
                col_idx=(csr.col_idx[mask] - c0).astype(csr.col_idx.dtype),
                values=csr.values[mask],
            )
            panels.append(SellMatrix.from_csr(sub, skip_empty=True, **sell_kw))

        return cls(
            nrows=M, ncols=N, nnz=csr.nnz,
            num_groups=-(-M // GROUP_ROWS) if M else 0,
            bounds=bounds, panels=panels, row_perm=row_perm,
        )

    def spmv(self, x: np.ndarray) -> np.ndarray:
        """Host fp64 oracle: sum of per-panel oracle SpMVs."""
        x = np.asarray(x, dtype=np.float64)
        y = np.zeros(self.nrows, dtype=np.float64)
        for p, panel in enumerate(self.panels):
            y += panel.spmv(x[self.bounds[p] : self.bounds[p + 1]])
        return y


def _wl_profile(rows_of_entries, col_idx, num_groups, nslab_bound,
                cand_L=(1, 2, 3, 4, 6, 8)):
    """Per-entry window-layered coordinates + per-group (NW, L) profile.

    WL layout ("window-layered"): per 128-row block, the block's slabs are
    expanded into SLOTS — a slab occupies ``ceil(max_per_row_count / L)``
    consecutive slots, so deep (row, slab) piles (FEM dof-blocks put many
    entries of a row in the near-diagonal slab) spread across slots instead
    of inflating the layer depth. Slots are grouped into windows of 8; an
    entry sits at sublane = its slot within the window, lane = row, in the
    ``occ % L``-th layer tile of the window. The kernel builds one 8-row W
    table per window (8 scalar-driven x reads) and needs a single
    ``take_along_axis`` per layer tile — no masked span passes. Wins on
    clustered matrices (FEM stencils: few distinct slabs, wide ranges).

    ``L`` is chosen per group from ``cand_L`` by the converter's cost model
    (bytes vs vector ops). Returns (rb, w, s, layer, nwin_g, L_g); entries
    must be in CSR order (row-major, column-sorted).
    """
    nnz = rows_of_entries.size
    rb = rows_of_entries >> 7                     # 128-row block id
    n_rb = num_groups * SUBLANES
    if nnz == 0 or num_groups == 0:
        z = np.zeros(0, np.int64)
        ones = np.ones(num_groups, np.int64)
        return z, z, z, z, ones, ones
    q = (col_idx >> 7).astype(np.int64)

    key = rb * np.int64(nslab_bound) + q
    uniq, inv = np.unique(key, return_inverse=True)
    u_rb = uniq // nslab_bound

    # occurrence index within (row, slab) runs (consecutive in CSR order)
    change = np.ones(nnz, dtype=bool)
    change[1:] = (rows_of_entries[1:] != rows_of_entries[:-1]) | (q[1:] != q[:-1])
    run_start = np.maximum.accumulate(np.where(change, np.arange(nnz), 0))
    occ = np.arange(nnz) - run_start

    # deepest per-row pile for each (rb, slab)
    maxocc_u = np.zeros(uniq.size, np.int64)
    np.maximum.at(maxocc_u, inv, occ + 1)
    grp_u = u_rb >> 3

    # choose L per group: minimize max(DMA of 8*NW*L slots, window vreg work)
    best_sec = np.full(num_groups, np.inf)
    L_g = np.ones(num_groups, np.int64)
    NW_g = np.ones(num_groups, np.int64)
    bpr = GROUP_ROWS * 8
    for L in cand_L:
        slots_u = -(-maxocc_u // L)
        nslots_rb = np.bincount(u_rb, weights=slots_u.astype(np.float64),
                                minlength=n_rb).astype(np.int64)
        nw_rb = -(-nslots_rb // 8)
        nw_g = np.maximum(
            nw_rb.reshape(num_groups, SUBLANES).max(axis=1), 1)
        sec = np.maximum(
            8 * nw_g * L * bpr / _PALLAS_BW_WL,
            SUBLANES * nw_g * (_WL_WIN_VREGS + 4 * L) * _VREG_OP_S,
        )
        # only legal (NW, L) combinations compete (kernel unroll guards)
        sec = np.where(
            (nw_g > _WL_MAX_NW) | (nw_g * L > _WL_MAX_TILES), np.inf, sec)
        better = sec < best_sec
        best_sec = np.where(better, sec, best_sec)
        L_g = np.where(better, L, L_g)
        NW_g = np.where(better, nw_g, NW_g)

    # slot bases at each (rb, slab) under the chosen L of its group
    Lu = L_g[grp_u]
    slots_u = -(-maxocc_u // Lu)
    cs = np.cumsum(slots_u)
    base_u = cs - slots_u
    # rebase to each rb's first slot
    first = np.searchsorted(u_rb, np.arange(n_rb + 1))
    rb_base = np.zeros(n_rb, np.int64)
    has = first[:-1] < first[1:]
    rb_base[has] = base_u[first[:-1][has]]
    base_u = base_u - rb_base[u_rb]

    Le = L_g[rb >> 3]
    slot = base_u[inv] + occ // Le
    w = slot >> 3
    s = slot & 7
    layer = occ % Le

    # NW from the FINAL mapping (always consistent with w, even for groups
    # where no candidate L was legal — downstream guards then reject them)
    nslots_rb = np.bincount(u_rb, weights=slots_u.astype(np.float64),
                            minlength=n_rb).astype(np.int64)
    NW_g = np.maximum(
        (-(-nslots_rb // 8)).reshape(num_groups, SUBLANES).max(axis=1), 1)
    return rb, w, s, layer, NW_g, L_g


def _emit_wl_bin(csr, rows_of_entries, col_idx, gids, ginv, rb, w, s, layer,
                 NW, L, Rp, value_dtype, nslab_bound):
    """Build one WL bin's (ja_m, as_, slabs) arrays for the groups ``gids``.

    Array shape matches the SellBin convention with k = 8*NW*L: data rows =
    ng * k * SUBLANES, entry at flat row ((rb8*NW + w)*L + layer)*8 + s.
    ``slabs`` is the scalar-prefetch table (ng, SUBLANES*NW*8) of window slab
    ids (pad = Rp-1, the spare zero slab)."""
    k = 8 * NW * L
    ng = gids.size
    ja_m = np.zeros((ng, k * SUBLANES, LANES), dtype=np.int32)
    as_ = np.zeros((ng, k * SUBLANES, LANES), dtype=value_dtype)
    slabs = np.full((ng, SUBLANES * NW * 8), Rp - 1, dtype=np.int32)

    g_all = (rows_of_entries >> 7) >> 3
    sel = ginv[g_all] >= 0
    if np.any(sel):
        gl = ginv[g_all[sel]]
        rb8 = (rows_of_entries[sel] >> 7) & 7
        lane = rows_of_entries[sel] & 127
        ww, ss, ll = w[sel], s[sel], layer[sel]
        flat_row = (((rb8 * NW + ww) * L + ll) * 8 + ss).astype(np.int64)
        ja_m[gl, flat_row, lane] = (col_idx[sel] & (LANES - 1)).astype(np.int32)
        as_[gl, flat_row, lane] = csr.values[sel].astype(value_dtype)
        # window slab table (dedup via direct assignment — all entries of a
        # (rb, w, s) cell share one slab)
        slabs[gl, (rb8 * NW + ww) * 8 + ss] = (col_idx[sel] >> 7).astype(np.int32)

    return ja_m.reshape(-1, LANES), as_.reshape(-1, LANES), slabs


def _per_chunk_distinct(q2d: np.ndarray):
    """Distinct values per row of ``q2d`` (one row per chunk), returned as a
    (-1)-padded list table plus counts. One vectorized sort, no Python loops."""
    s = np.sort(q2d, axis=1)
    new = np.ones(s.shape, dtype=bool)
    new[:, 1:] = s[:, 1:] != s[:, :-1]
    counts = new.sum(axis=1)
    width = max(int(counts.max()) if counts.size else 1, 1)
    # int32 accumulator: the default int64 cumsum over the padded entry
    # plane was the conversion's single hottest op (r5 profile: 13 s at
    # 22.7M nnz); row width is <= ck*LANES so int32 can't overflow
    pos = np.cumsum(new, axis=1, dtype=np.int32) - 1  # index in distinct list
    lists = np.full((q2d.shape[0], width), -1, dtype=np.int32)
    ridx = np.broadcast_to(
        np.arange(q2d.shape[0])[:, None], q2d.shape
    )
    lists[ridx[new], pos[new]] = s[new]
    return lists, counts.astype(np.int64)


def _build_slab_lists_global(rows_of_entries, col_idx, num_groups):
    """Distinct ``col // 128`` values per group (all groups at once),
    padded with a sentinel. One O(nnz log nnz) pass total.

    Entries arrive in CSR order (row-major, columns sorted within rows), so
    per (group, slab) keys are *almost* sorted; np.unique handles the rest.
    """
    SENTINEL = np.int32(2**30)
    if rows_of_entries.size == 0 or num_groups == 0:
        return (
            np.full((max(num_groups, 1), 1), SENTINEL, dtype=np.int32),
            np.zeros(max(num_groups, 1), dtype=np.int32),
        )
    g_all = rows_of_entries // GROUP_ROWS
    slabs = col_idx.astype(np.int64) >> 7
    nslab = int(slabs.max()) + 1
    key = g_all * nslab + slabs
    uniq = np.unique(key)
    u_g = uniq // nslab
    u_s = uniq % nslab
    counts = np.bincount(u_g, minlength=num_groups).astype(np.int64)
    s_max = max(int(counts.max()) if counts.size else 1, 1)
    slab_list = np.full((num_groups, s_max), SENTINEL, dtype=np.int32)
    pos = np.arange(u_g.size, dtype=np.int64) - np.concatenate(
        [[0], np.cumsum(counts)[:-1]]
    )[u_g]
    slab_list[u_g, pos] = u_s.astype(np.int32)
    return slab_list, counts.astype(np.int32)
