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
Rows are grouped into *groups* of ``1024`` (8x128). Group ``g`` stores its
entries in a ``(K_g * 8, 128)`` tile where entry ``k`` of local row
``r = i*128 + j`` lives at ``[k*8 + i, j]``. A whole-group row-sum is then
8-way sublane-strided adds plus one native sublane reduction, and the result
tile ``(8, 128)`` is exactly rows ``g*1024 .. g*1024+1023`` in natural order —
no permutation of ``y`` (unlike SELL-sigma row sorting).

Groups are *binned* by padded width ``K`` so each bin is one rectangular
buffer = one ``pallas_call`` grid (the TPU equivalent of the reference's
nnz-balanced thread scheduling, src/csr_matrix.c:167-266: binning replaces
per-thread row ranges as the load-balancing mechanism — BASELINE.json names
row-binning explicitly).

x-gather decomposition
----------------------
TPU has no fast arbitrary gather. Column index ``c`` decomposes as
``c = 128*q + m``: ``q`` selects a *slab* (one 128-wide row of the
``(ceil(N/128), 128)`` x-table), ``m`` selects the lane within the slab.
Mosaic supports lane-gather (``take_along_axis`` axis=1), so the kernel loops
over the group's *distinct slabs* (precomputed here as ``slab_list``),
broadcasts each slab row, lane-gathers, and accumulates under an equality
mask. Per-group slab counts are the kernel's work measure for irregular
matrices (≙ the x-prefix shared-memory caching idea of
cuda_src/csr_matrix_cuda.cu:198-241, generalized).

Padding follows the reference HLL semantics (hll_matrix.c:241-246): padded
entries replicate the row's last valid column with value 0.0, so they never
add slabs beyond those already touched by real entries.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .coo import COOMatrix
from .csr import CSRMatrix

__all__ = ["SellBin", "SellMatrix", "GROUP_ROWS", "LANES", "SUBLANES"]

LANES = 128
SUBLANES = 8
GROUP_ROWS = LANES * SUBLANES  # 1024

# Default K bin edges: powers of two-ish ladder; a group with max row nnz K_g
# is padded to the smallest edge >= K_g. Autotunable (tune/autotune.py).
DEFAULT_K_BINS = (1, 2, 4, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024)


@dataclass(frozen=True)
class SellBin:
    """One rectangular bin: all groups padded to the same entry width ``k``."""

    k: int                   # padded entries per row
    group_ids: np.ndarray    # (n_groups,) int32 — global group indices
    ja: np.ndarray           # (n_groups * k * 8, 128) int32 column indices
    as_: np.ndarray          # (n_groups * k * 8, 128) values (0.0 padding)
    slab_list: np.ndarray    # (n_groups, s_max) int32 distinct col//128 per group
    slab_count: np.ndarray   # (n_groups,) int32
    real_nnz: int            # un-padded nnz covered by this bin

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
    """SELL-C-128 matrix: bins + the x-table geometry."""

    nrows: int
    ncols: int
    nnz: int
    bins: list
    num_groups: int

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
            "bytes_total": byt,
        }

    @classmethod
    def from_csr(
        cls,
        csr: CSRMatrix,
        *,
        k_bins=DEFAULT_K_BINS,
        value_dtype=None,
    ) -> "SellMatrix":
        """Convert CSR (column-sorted rows) to binned SELL-C-128.

        ``value_dtype`` defaults to the CSR value dtype (fp64 host-exact);
        :func:`..ops.pallas_sell.device_put_sell` casts on upload.
        """
        if value_dtype is None:
            value_dtype = csr.values.dtype
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

        # pad-column per padded row (reference hll_matrix.c:241-246 semantics)
        last_col = np.zeros(padded_rows, dtype=np.int32)
        rows_idx = np.flatnonzero(row_nnz[:M] > 0) if M else np.zeros(0, np.int64)
        if rows_idx.size:
            last_col[rows_idx] = csr.col_idx[csr.row_ptr[1:][rows_idx].astype(np.int64) - 1]

        rows_of_entries = csr.row_ids().astype(np.int64)
        within = np.arange(csr.nnz, dtype=np.int64) - csr.row_ptr[:-1].astype(np.int64)[rows_of_entries]

        bins = []
        for b_id in np.unique(bin_of_group) if num_groups else []:
            K = int(edges[b_id])
            gids = np.flatnonzero(bin_of_group == b_id).astype(np.int32)
            ng = gids.size
            # local (within-bin) dense index of each group
            ginv = np.full(num_groups, -1, dtype=np.int64)
            ginv[gids] = np.arange(ng)

            # build (ng * K * 8, 128) tiles
            ja = np.empty((ng, K, SUBLANES, LANES), dtype=np.int32)
            as_ = np.zeros((ng, K, SUBLANES, LANES), dtype=value_dtype)
            # initialize JA with per-row pad columns:
            # padded row r (global) -> (g, i, j): g=r//1024, i=(r%1024)//128, j=r%128
            pad_cols = last_col.reshape(num_groups, SUBLANES, LANES)[gids]  # (ng,8,128)
            ja[:] = pad_cols[:, None, :, :]

            # scatter real entries belonging to this bin's groups
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
            real_nnz = int(np.count_nonzero(sel))

            # distinct slabs per group, from REAL entries only
            slab_list, slab_count = _build_slab_lists(
                rows_of_entries, csr.col_idx, gids, ginv, ng
            )

            bins.append(
                SellBin(
                    k=K,
                    group_ids=gids,
                    ja=ja.reshape(ng * K * SUBLANES, LANES),
                    as_=as_.reshape(ng * K * SUBLANES, LANES),
                    slab_list=slab_list,
                    slab_count=slab_count,
                    real_nnz=real_nnz,
                )
            )

        return cls(nrows=M, ncols=N, nnz=csr.nnz, bins=bins, num_groups=num_groups)

    @classmethod
    def from_coo(cls, coo: COOMatrix, **kw) -> "SellMatrix":
        return cls.from_csr(CSRMatrix.from_coo(coo), **kw)

    def spmv(self, x: np.ndarray) -> np.ndarray:
        """Host oracle over the SELL layout (fp64) — differential-test anchor."""
        x = np.asarray(x, dtype=np.float64)
        y = np.zeros(self.padded_rows, dtype=np.float64)
        for bin_ in self.bins:
            ng, K = bin_.n_groups, bin_.k
            ja = bin_.ja.reshape(ng, K, SUBLANES, LANES)
            as_ = bin_.as_.reshape(ng, K, SUBLANES, LANES)
            contrib = (as_.astype(np.float64) * x[ja]).sum(axis=1)  # (ng,8,128)
            rows = (
                bin_.group_ids.astype(np.int64)[:, None, None] * GROUP_ROWS
                + np.arange(SUBLANES)[None, :, None] * LANES
                + np.arange(LANES)[None, None, :]
            )
            y[rows.reshape(-1)] = contrib.reshape(-1)
        return y[: self.nrows]


def _build_slab_lists(rows_of_entries, col_idx, gids, ginv, ng):
    """Distinct ``col // 128`` values per group, padded with a sentinel."""
    SENTINEL = np.int32(2**30)
    g_all = rows_of_entries // GROUP_ROWS
    sel = ginv[g_all] >= 0
    gl = ginv[g_all[sel]]
    slabs = col_idx[sel].astype(np.int64) // LANES
    if gl.size == 0:
        return (
            np.full((ng, 1), SENTINEL, dtype=np.int32),
            np.zeros(ng, dtype=np.int32),
        )
    key = gl * (slabs.max() + 1) + slabs
    uniq = np.unique(key)
    u_g = uniq // (slabs.max() + 1)
    u_s = uniq % (slabs.max() + 1)
    counts = np.bincount(u_g, minlength=ng).astype(np.int64)
    s_max = int(counts.max()) if counts.size else 1
    slab_list = np.full((ng, max(s_max, 1)), SENTINEL, dtype=np.int32)
    pos = np.arange(u_g.size, dtype=np.int64) - np.concatenate(
        [[0], np.cumsum(counts)[:-1]]
    )[u_g]
    slab_list[u_g, pos] = u_s.astype(np.int32)
    return slab_list, counts.astype(np.int32)
