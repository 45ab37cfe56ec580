"""Pallas SELL-C-128 SpMV — the TPU performance kernels.

TPU-native redesign of the reference's CUDA warp-per-row kernels
(cuda_src/csr_matrix_cuda.cu:151-196 warp CSR, cuda_src/hll_matrix.cu:379-426
warp HLL, and the shared-memory x-caching variants :198-241/:428-479):

  * warp-per-row lane striding        ->  lane-per-row SELL-C-128 layout
  * __shfl_down_sync butterfly reduce ->  native sublane reduction
  * shared-memory x cache             ->  whole x table resident in VMEM
  * gather of x[col]                  ->  slab decomposition col = 128*q + m
  * cudaOccupancyMaxPotentialBlockSize -> K-binning of groups (one pallas_call
        per rectangular bin; bin edges autotunable)

Four kernels, selected per bin by the host-side cost model in formats/sell.py:

  * ``k-major`` slab-list kernel — rolled loop over the group's distinct
    x-slabs (scalar-prefetched lists); the scattered-matrix (power-law) tool.
  * ``sb-major`` range-scan kernel — each (ck,128) chunk covers ck
    consecutive entries x 128 consecutive rows; statically scans the chunk's
    host-computed slab range; best for banded/local columns.
  * ``sb-list`` — per-chunk DISTINCT slab lists; wide ranges, few slabs.
  * ``wl`` window-layered — sublane = slot in an 8-slab window, ONE
    take_along_axis per layer tile; the clustered-stencil (FEM) winner.

Empirical design constraints (measured on TPU v5e via probes; see
docs/DESIGN.md): XLA arbitrary gather ~0.1-1 G elem/s (unusable); Mosaic
lane-gather (``take_along_axis`` axis=1) is the only vectorized gather;
aggregate two-stream Pallas streaming ~230-310 GB/s (wl tiles ~430); chunk
loops must fully unroll; output blocks must be >= (8,128).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.sell import (CHUNK_K, LANES, SUBLANES, SellMatrix,
                            slab_table_rows)

__all__ = [
    "DeviceSellBin", "DeviceSell", "DevicePanelSell",
    "device_put_sell", "device_put_panel_sell", "max_x_table_cols",
    "sell_spmv_pallas",
]

_UNROLL_MAX = 64  # unroll the K-reduction up to this many slices


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceSellBin:
    k: int
    n_groups: int
    layout: str            # "k-major" | "sb-major"
    span: int              # sb-major static scan length
    group_ids: jax.Array   # (ng,) int32
    ja: jax.Array          # (ng*k*8, 128) int32
    as_: jax.Array         # (ng*k*8, 128) float
    slab_list: jax.Array   # k-major: (ng, s_max) slab ids; sb-major: (ng, 8*k/8) qbase
    slab_count: jax.Array  # (ng,) int32
    contig_start: int = -1  # first group id when the bin's groups are a
                            # contiguous range (enables multi-group steps)
    chunk_k: int = CHUNK_K  # sb-major chunk sublane height
    add_into: bool = False  # accumulate onto tiles another bin wrote (sg far)
    resident_g_per: int = 0  # >1: resident-y mode — whole y stays one VMEM
                             # window, each grid step serves this many groups
                             # via predicated dynamic writes (group_ids padded
                             # with -1). Fixes the per-step overhead of tiny
                             # non-contiguous bins (sigma-sorted scattered
                             # matrices fragment group ids, forcing g_per=1
                             # revolving tiles of a few KB).
    sg_slots: bool = False   # sg: free sublane-slot positions (sigma-reduce)
    ja_packed: bool = False  # wl: index plane packed 4 lane-bytes/int32
                             # (_pack_wl_ja) — 4B -> 1B of HBM index traffic
                             # per slot; kernels unpack with shift+mask

    def tree_flatten(self):
        return (
            (self.group_ids, self.ja, self.as_, self.slab_list, self.slab_count),
            (self.k, self.n_groups, self.layout, self.span, self.contig_start,
             self.chunk_k, self.add_into, self.resident_g_per, self.sg_slots,
             self.ja_packed),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        k, ng, layout, span, contig, ck, add, res, slots, packed = aux
        return cls(k, ng, layout, span, *children, contig_start=contig,
                   chunk_k=ck, add_into=add, resident_g_per=res,
                   sg_slots=slots, ja_packed=packed)


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceSell:
    nrows: int
    ncols: int
    nnz: int
    num_groups: int
    bins: list
    # y groups incl. contiguous-tail padding (0 = num_groups): bins whose
    # contiguous range ends the group list may be padded with zero groups
    # so multi-group grid steps don't require ng % g_per == 0 (the r3
    # ml_laplace regression: a merged 391-group bin fell to g_per=1 and
    # paid the ~9 us/grid-step floor 391 times; see _contig_tail_pad)
    y_groups: int = 0

    def tree_flatten(self):
        return (tuple(self.bins),), (self.nrows, self.ncols, self.nnz,
                                     self.num_groups, self.y_groups)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux[:4], list(children[0]),
                   *aux[4:])

    def spmv(self, x):
        return sell_spmv_pallas(self, x)


def _sb_i16_enabled() -> bool:
    """sb-major chunk-relative int16 index plane (VERDICT r4 item 6) —
    opt-in via SPMV_SB_I16=1. r2 measured an int16 *absolute-column* cast
    losing when kernels were pass-bound; the dd sb bins now sit at the
    two-stream byte floor (kkt dd 26.9 GF ~ 260 GB/s), where halving the
    4B index plane is worth ~1.2x. Stored value: (dq << 7) | lane with
    dq = slab - chunk_qbase (fits: static spans <= 40), pads clipped to
    dq = -1 (matches no pass; their values are 0)."""
    return os.environ.get("SPMV_SB_I16", "0") == "1"


def _pack_sb_i16(ja_h: np.ndarray, sl_h: np.ndarray, ng: int, K: int,
                 ck: int, span: int) -> np.ndarray:
    """(rows,128) absolute-column sb-major plane -> int16 (dq<<7)|m plane.

    Row r of a group's (SUBLANES, K) block belongs to chunk (r % K) // ck;
    its qbase is slab_list[g, sb*nchunks + c] (the scalar-prefetched table
    the kernel already reads)."""
    rows = ja_h.shape[0]
    kb = SUBLANES * K
    assert rows == ng * kb, (rows, ng, K)
    nchunks = K // ck
    q = (ja_h.astype(np.int64) >> 7)
    m = ja_h & (LANES - 1)
    # per-row (g, sb, c) -> qbase
    r = np.arange(rows, dtype=np.int64)
    g_of = r // kb
    sb_of = (r % kb) // K
    c_of = (r % K) // ck
    qb = np.asarray(sl_h).reshape(ng, -1)[g_of, sb_of * nchunks + c_of]
    dq = np.clip(q - qb[:, None], -1, 255)
    return ((dq << 7) | m).astype(np.int16)


def _pack_sl_i16(ja_h: np.ndarray, lst_h: np.ndarray, ng: int, K: int,
                 ck: int, span: int) -> np.ndarray:
    """sb-list twin of :func:`_pack_sb_i16`: stored value is
    (js << 7) | lane where js = the slab's POSITION in its chunk's sorted
    distinct list — the kernel compares js against the static pass id and
    keeps gathering from ``lst_ref[..s]``. Pad entries (slab 0 not in the
    list) resolve to js = -1 or to a harmless list hit on value-0 slots."""
    rows = ja_h.shape[0]
    kb = SUBLANES * K
    assert rows == ng * kb, (rows, ng, K)
    nchunks = K // ck
    q = (ja_h.astype(np.int32) >> 7)
    m = ja_h & (LANES - 1)
    r = np.arange(rows, dtype=np.int64)
    chunk_of = ((r // kb) * SUBLANES * nchunks
                + ((r % kb) // K) * nchunks
                + (r % K) // ck)
    lists2 = np.asarray(lst_h, np.int32).reshape(ng * SUBLANES * nchunks,
                                                 span)
    js = np.empty((rows, LANES), np.int16)
    blk = max(1, (1 << 22) // max(span, 1))   # bound temp to ~2 GB
    for a in range(0, rows, blk):
        z = min(rows, a + blk)
        lr = lists2[chunk_of[a:z]]            # (B, span) sorted ascending
        js[a:z] = ((lr[:, None, :] <= q[a:z, :, None]).sum(-1) - 1
                   ).astype(np.int16)
    return ((js.astype(np.int32) << 7) | m).astype(np.int16)


# scalar-prefetch tables per pallas_call must fit the compile budget: the
# 127M-scale HTTP 500s come from tables that scale with ng — fem3d_large's
# default wl bin carries a 2.76 MB slabs table and fails AOT compile, while
# fem3d_cube's 918 KB bin compiles AND measures 96.9 GF (the r4 headline).
# Cap placed just above the proven-good 918 KB so the cube structure stays
# byte-identical; fem3d_large splits into ~919 KB parts (inside the proven
# envelope, below the presumed 1 MB compile limit).
_SMEM_TABLE_CAP = 930 * 1024


# Grid-step compile limit (measured, round 5): a single-kernel program at
# 525 grid steps (fem3d_large wl sub-bin, g_per=1) fails AOT compile with
# the same HTTP 500 as the multi-kernel programs, while 306 steps (the r4
# unpacked cube big bin, g_per=2) compiles and runs at 96.9 GF. The
# scalar-prefetch revolving-output pipeline appears to materialize
# per-step state at compile time. Also retro-explains the r4 kkt
# default/pow2/fine ladder 500s (non-contig k-major bins, ~1033 steps at
# g_per=1) and the road default-sbmajor hang class.
_MAX_GRID_STEPS = 320

# Per-OPERAND-plane byte limit (bisected, round 5, fem127_diag2 +
# BF16PK cross-check): abstract compiles PASS with a 361.1e6-byte value
# plane (cube K144xng612; and the cube dd pair of TWO such planes RAN at
# 85.7 GF) and FAIL at 363.3e6 (K168xng528) regardless of packing,
# x-table rows, y size, grid steps, or the SUM of planes — the compile
# helper dies when any single pallas_call operand plane crosses ~362e6
# bytes (~345 MiB). Bins beyond the proven threshold split to a target.
_PROVEN_PLANE_BYTES = 361_200_000
_TARGET_PLANE_BYTES = 300_000_000


def _split_oversize_host_bins(bins, num_groups=None, value_bytes=4):
    """Split host bins into contiguous group-range sub-bins so that each
    part (a) keeps its scalar-prefetch tables under the SMEM compile
    budget, (b) keeps every upload plane under the single-array cap, and
    (c) keeps its GRID at <= _MAX_GRID_STEPS steps under the g_per it
    will get. Group-aligned slicing is exact for every layout (planes and
    tables are per-group rows); kernel geometry is unchanged.

    Part sizing: contiguous bins take multiples of 16 groups (so
    _pick_g_per keeps g_per >= 2 — an odd part falls to g_per=1 and
    doubles its steps); an odd remainder is capped at _MAX_GRID_STEPS.
    Non-contiguous bins assume g_per=1 unless resident-eligible (the
    resident whole-y mode multi-group-steps and needs no split).
    """
    import dataclasses

    out = []
    for b in bins:
        ng = int(b.n_groups)
        if b.layout not in ("k-major", "sb-major", "sb-list", "wl"):
            out.append(b)  # sg tables are not plain per-group rows
            continue
        sl = np.asarray(b.slab_list)
        sl2 = sl if sl.ndim == 2 else (
            sl.reshape(ng, -1) if ng and sl.size % ng == 0 else None)
        if sl2 is None or ng < 2:
            out.append(b)
            continue
        gids = np.asarray(b.group_ids, np.int64)
        contig = bool(gids.size and np.array_equal(
            gids, gids[0] + np.arange(gids.size)))
        resident_ok = (
            not contig and b.layout in _RESIDENT_LAYOUTS and ng >= 4
            and num_groups is not None
            and (num_groups + 15) * SUBLANES * LANES * 8 <= _RESIDENT_Y_BYTES)

        kb = b.ja.shape[0] // ng
        table_pg = (sl2[0].nbytes if sl2.size else 4) + 8
        plane_pg = max(kb * LANES * 4, b.ja[:kb].nbytes)
        cap_tab = max(int(_SMEM_TABLE_CAP // max(table_pg, 1)), 1)
        cap_pl = max(int(_MAX_ARRAY_BYTES // max(plane_pg, 1)), 1)
        # single-plane byte criterion (the LARGEST operand plane as it
        # will upload: packed wl ja = 1 B/slot, sb int16 = 2 B, else 4;
        # value planes at their per-plane itemsize — dd hi/lo are f32)
        if b.layout == "wl" and _wl_pack_enabled():
            ja_b = 1.0
        elif (b.layout in ("sb-major", "sb-list") and _sb_i16_enabled()
              and int(getattr(b, "span", 0)) <= 255):
            ja_b = 2.0
        else:
            ja_b = 4.0
        io_pg = kb * LANES * max(ja_b, value_bytes)
        if ng * io_pg > _PROVEN_PLANE_BYTES:
            cap_io = max(int(_TARGET_PLANE_BYTES // io_pg), 1)
        else:
            cap_io = ng
        if contig:
            cap_grid = _MAX_GRID_STEPS * 2       # parts sized for g_per>=2
        elif resident_ok:
            cap_grid = _MAX_GRID_STEPS * 16      # resident multi-group steps
        else:
            cap_grid = _MAX_GRID_STEPS           # g_per = 1
        raw_cap = min(cap_tab, cap_pl, cap_grid, cap_io)
        max_take = raw_cap
        if contig:
            max_take = max((max_take // 16) * 16, 16)
        # the whole bin fits when it is inside every cap at its own g_per
        # (alignment only matters for PARTS, not for an unsplit bin)
        fits_whole = ng <= raw_cap and not (
            contig and ng % 2
            and ng > min(cap_tab, cap_pl, cap_io, _MAX_GRID_STEPS))
        if fits_whole:
            out.append(b)
            continue

        sizes = []
        rem = ng
        while rem > max_take:
            sizes.append(max_take)
            rem -= max_take
        if contig and rem % 2 and rem > _MAX_GRID_STEPS:
            take = max(min((max_take // 2 // 16) * 16, rem - 1), 16)
            sizes.append(take)
            rem -= take
        if rem:
            sizes.append(rem)

        cnt = np.asarray(b.slab_count)
        a = 0
        for size in sizes:
            z = a + size
            out.append(dataclasses.replace(
                b,
                group_ids=np.asarray(b.group_ids)[a:z],
                ja=b.ja[a * kb: z * kb],
                as_=b.as_[a * kb: z * kb],
                slab_list=sl2[a:z],
                slab_count=cnt[a:z] if cnt.ndim == 1 and cnt.size == ng
                else cnt,
                real_nnz=int(b.real_nnz) * size // ng,
            ))
            a = z
    return out


def _wl_pack_enabled() -> bool:
    """wl index bit-plane packing (VERDICT r4 item 6): four 7-bit lane
    indices per int32 TILE — the index plane's HBM traffic drops 4x, the
    kernels unpack with one shift+mask per (8,128) tile. DEFAULT ON since
    the round-5 on-device proof (PKSMOKE bit-identity; cube f32
    96.9 -> 140.3 GF, dd 65.0 -> 85.7, bf16 127 -> 160.5; fem3d_large
    104.3/65.8). SPMV_WL_PACK=0 opts out. (r2's "int16 loses" finding was
    about a CAST of absolute columns, not a bit-plane.)"""
    return os.environ.get("SPMV_WL_PACK", "1") == "1"


def _pack_wl_ja(ja_h: np.ndarray, rows_per_group: int) -> np.ndarray:
    """Pack a wl bin's lane-index plane 4 tiles -> 1 int32 tile, per group.

    wl ``ja`` values are lane offsets 0..127 (7 bits; _kernel_wl docstring).
    Within each group, (8,128) tile ``t`` lands in byte ``t % 4`` of packed
    tile ``t // 4``; the per-group tile count pads to a multiple of 4 with
    zero tiles (gathers lane 0 times value 0.0 — the existing wl padding
    semantics). Top byte holds values <= 0x7F so the int32 view is never
    negative and arithmetic shifts are safe."""
    ng = ja_h.shape[0] // rows_per_group
    Tn = rows_per_group // 8
    Tp = -(-Tn // 4)
    tiles = ja_h.reshape(ng, Tn, 8, LANES).astype(np.uint32)
    if Tp * 4 != Tn:
        tiles = np.concatenate(
            [tiles, np.zeros((ng, Tp * 4 - Tn, 8, LANES), np.uint32)], axis=1)
    tiles = tiles.reshape(ng, Tp, 4, 8, LANES)
    packed = (tiles[:, :, 0]
              | (tiles[:, :, 1] << np.uint32(8))
              | (tiles[:, :, 2] << np.uint32(16))
              | (tiles[:, :, 3] << np.uint32(24)))
    return packed.reshape(ng * Tp * 8, LANES).astype(np.int32)


def device_put_sell(sell, dtype=jnp.float32, device=None, resident=True):
    """Upload a host SellMatrix (≙ the HLL per-block device upload of
    main_cuda.cu:376-402, flattened into rectangular bins). PanelSellMatrix
    inputs route to :func:`device_put_panel_sell`.

    ``resident=False`` skips the resident-y padding (`_resident_pad`
    appends gid=-1 sentinel groups that only the resident SpMV kernels
    predicate off) — required for containers fed to the multi-RHS SpMM
    (ops/pallas_sell_spmm.py), whose kernel has no resident mode."""
    if hasattr(sell, "panels"):
        return device_put_panel_sell(sell, dtype=dtype, device=device,
                                     resident=resident)
    total = sum(b.ja.nbytes + b.as_.nbytes for b in sell.bins)
    if total > _MAX_UPLOAD_BYTES:
        raise MemoryError(
            f"SELL device arrays {total/2**20:.0f} MiB > "
            f"{_MAX_UPLOAD_BYTES/2**20:.0f} MiB — uploads this large crash "
            "the tunneled TPU worker (sigma-sort or coarser guards needed)")
    bins = []
    y_groups = sell.num_groups
    itemsize = jnp.dtype(dtype).itemsize
    for b in _split_oversize_host_bins(sell.bins, sell.num_groups,
                                   value_bytes=itemsize):
        gids = np.asarray(b.group_ids, np.int64)
        contig = (
            int(gids[0])
            if gids.size and np.array_equal(gids, gids[0] + np.arange(gids.size))
            else -1
        )
        res_g_per, padded = (_resident_pad(b, sell.num_groups, itemsize)
                             if resident else (0, None))
        if padded is None and resident:
            # end-of-range contiguous bins: zero-group tail padding so an
            # odd group count can't force g_per=1 (the per-grid-step floor)
            _gp, ng_p, tail = _contig_tail_pad(b, sell.num_groups, itemsize,
                                               contig)
            if tail is not None:
                padded = tail
                y_groups = max(y_groups, contig + ng_p)
        if padded is not None:
            gid_h, ja_h, as_h, sl_h, cnt_h = padded
            ng_dev = gid_h.size
        else:
            gid_h, ja_h, as_h, sl_h, cnt_h = (
                b.group_ids, b.ja, b.as_, b.slab_list, b.slab_count)
            ng_dev = int(b.n_groups)
        packed = b.layout == "wl" and _wl_pack_enabled()
        if packed:
            ja_h = _pack_wl_ja(np.asarray(ja_h), ja_h.shape[0] // ng_dev)
        if (_sb_i16_enabled() and int(getattr(b, "span", 0)) <= 255
                and b.layout in ("sb-major", "sb-list")):
            # int16 plane signals itself by dtype; kernels switch on it
            pack = _pack_sb_i16 if b.layout == "sb-major" else _pack_sl_i16
            ja_h = pack(np.asarray(ja_h), np.asarray(sl_h), ng_dev,
                        int(b.k), int(getattr(b, "chunk_k", 8)),
                        int(b.span))
        bins.append(
            DeviceSellBin(
                k=int(b.k),
                n_groups=ng_dev,
                layout=b.layout,
                span=int(b.span),
                group_ids=jax.device_put(jnp.asarray(gid_h, jnp.int32), device),
                ja=jax.device_put(jnp.asarray(
                    ja_h, jnp.int16 if ja_h.dtype == np.int16
                    else jnp.int32), device),
                as_=jax.device_put(jnp.asarray(as_h, dtype), device),
                slab_list=jax.device_put(jnp.asarray(sl_h, jnp.int32), device),
                slab_count=jax.device_put(jnp.asarray(cnt_h, jnp.int32), device),
                contig_start=contig,
                chunk_k=int(getattr(b, "chunk_k", 8)),
                add_into=bool(getattr(b, "add_into", False)),
                resident_g_per=res_g_per,
                sg_slots=bool(getattr(b, "sg_slots", False)),
                ja_packed=packed,
            )
        )
    return DeviceSell(sell.nrows, sell.ncols, sell.nnz, sell.num_groups,
                      bins, y_groups=y_groups)


# v5e VMEM is 128 MiB; the x table plus double-buffered entry tiles must fit.
_X_TABLE_VMEM_BUDGET = 96 * 1024 * 1024
# resident-y mode: the whole (num_groups*8, 128) y buffer lives in VMEM for
# the bin's entire grid (constant output index_map), so non-contiguous bins
# can process many groups per step with predicated dynamic-offset writes
_RESIDENT_Y_BYTES = 16 * 1024 * 1024
_RESIDENT_LAYOUTS = ("k-major", "sg")


def _contig_tail_pad(b, num_groups: int, value_itemsize: int,
                     contig: int):
    """Zero-group padding for a contiguous bin whose range ENDS the group
    list, so ``_pick_g_per`` can use multi-group grid steps without an
    ``ng % g_per == 0`` divisibility accident.

    Measured motivation (round 4): ml_laplace_like's merged sb-major bin
    has 391 groups (odd) — ``g_per`` fell from r2's 2 to 1 and the kernel
    paid the ~9 us/grid-step floor 391 times (3.53 ms, 15.7 GF) where r2's
    374+17-group split ran 187 steps (1.6 ms true, ~34 GF). Padding the
    tail bin to a g_per multiple restores (and extends) multi-group steps;
    the padded groups stream all-zero JA/AS tiles (slab 0 gathers * 0.0)
    into y rows past ``num_groups`` which the final crop discards.

    Only the END-of-range bin may be padded: interior bins' following group
    ids belong to OTHER bins, and a plain-write zero tile there would wipe
    their results. Returns (g_per, ng_padded, padded host arrays) or
    (0, 0, None)."""
    ng = int(b.n_groups)
    if contig < 0 or contig + ng != num_groups or ng < 3:
        return 0, 0, None
    per_group = int(b.k) * SUBLANES * LANES * (4 + value_itemsize)
    want = max(1, _MAX_STEP_BYTES // max(per_group, 1))
    g_per = 0
    for cand in (16, 8, 4, 2):
        pad_c = (-ng) % cand
        # bound the zero-group stream cost: padding may not exceed a third
        # of the bin (small bins take a smaller g_per instead)
        if cand <= want and contig % cand == 0 and pad_c <= max(1, ng // 3):
            g_per = cand
            break
    if g_per <= 1 or ng % g_per == 0:
        return 0, 0, None  # nothing to gain / already divisible
    ng_p = -(-ng // g_per) * g_per
    pad = ng_p - ng
    # slab_list shapes are layout-specific; pad only the per-group forms
    # (first axis == ng, or 1-D with a whole number of entries per group)
    sl = np.asarray(b.slab_list)
    if sl.ndim == 2 and sl.shape[0] == ng:
        sl_p = np.concatenate([sl, np.zeros((pad, sl.shape[1]), sl.dtype)])
    elif sl.ndim == 1 and sl.size % max(ng, 1) == 0:
        per = sl.size // max(ng, 1)
        sl_p = np.concatenate([sl, np.zeros(pad * per, sl.dtype)])
    elif sl.size == 0:
        sl_p = sl
    else:
        return 0, 0, None
    gids = np.asarray(b.group_ids, np.int64)
    gid_p = np.concatenate([gids.astype(np.int32),
                            (contig + ng + np.arange(pad)).astype(np.int32)])
    kb = b.ja.shape[0] // max(ng, 1)  # rows per group in the entry planes
    if kb * ng != b.ja.shape[0]:
        return 0, 0, None
    ja_p = np.concatenate([b.ja, np.zeros((pad * kb, LANES), b.ja.dtype)])
    as_p = np.concatenate([b.as_, np.zeros((pad * kb, LANES), b.as_.dtype)])
    cnt = np.asarray(b.slab_count, np.int32)
    cnt_p = (np.concatenate([cnt, np.zeros(pad, np.int32)])
             if cnt.ndim == 1 and cnt.size == ng else cnt)
    if cnt_p is cnt and cnt.size not in (0, ng):
        return 0, 0, None
    return g_per, ng_p, (gid_p, ja_p, as_p, sl_p, cnt_p)


def _resident_pad(b, num_groups: int, value_itemsize: int):
    """Pick the resident-mode g_per for a host bin (0 = stay revolving) and
    return (g_per, padded host arrays). Pads group lists to a multiple of
    g_per with gid = -1 (the kernels predicate the write off)."""
    ng = int(b.n_groups)
    # Budget against the WORST-CASE y buffer: a sibling end-of-range bin's
    # _contig_tail_pad may grow y_groups up to g_per-1 = 15 groups past
    # num_groups, and the resident kernels size their constant VMEM window
    # from y.shape at call time (ADVICE r4).
    y_groups_worst = num_groups + 15
    if (
        b.layout not in _RESIDENT_LAYOUTS
        or ng < 4
        or y_groups_worst * SUBLANES * LANES * value_itemsize > _RESIDENT_Y_BYTES
    ):
        return 0, None
    gids = np.asarray(b.group_ids, np.int64)
    if gids.size and np.array_equal(gids, gids[0] + np.arange(gids.size)):
        return 0, None  # contiguous bins already get multi-group steps
    per_group = int(b.k) * SUBLANES * LANES * (4 + value_itemsize)
    g_per = int(min(16, max(1, _MAX_STEP_BYTES // max(per_group, 1))))
    if g_per <= 1:
        return 0, None
    ng_p = -(-ng // g_per) * g_per
    pad = ng_p - ng
    gid_p = np.concatenate([gids.astype(np.int32),
                            np.full(pad, -1, np.int32)])
    kb = int(b.k) * SUBLANES
    ja_p = np.concatenate(
        [b.ja, np.zeros((pad * kb, LANES), b.ja.dtype)]) if pad else b.ja
    as_p = np.concatenate(
        [b.as_, np.zeros((pad * kb, LANES), b.as_.dtype)]) if pad else b.as_
    sl = np.asarray(b.slab_list)
    if sl.ndim == 1:
        sl = sl.reshape(ng, -1)
    sl_p = np.concatenate(
        [sl, np.zeros((pad, sl.shape[1]), sl.dtype)]) if pad else sl
    cnt_p = np.concatenate(
        [np.asarray(b.slab_count, np.int32), np.zeros(pad, np.int32)]) \
        if pad else np.asarray(b.slab_count, np.int32)
    return g_per, (gid_p, ja_p, as_p, sl_p, cnt_p)
# total device-array budget per structure: the observed worker-killers were
# ~1.4 GB SINGLE arrays (xla_csr, HLL repack); many-array SELL structures up
# to ~1.9 GB uploaded fine in r1 (119M-nnz dd) — budget set between
_MAX_UPLOAD_BYTES = int(os.environ.get("SPMV_MAX_UPLOAD_MB",
                                       "2200")) * 1024 * 1024
# single-array transfer cap: the observed worker-killers were ~1.4 GB SINGLE
# arrays; bin-by-bin uploads below this ran fine up to ~1.9 GB total (r1).
# Both caps are env-tunable (SPMV_MAX_UPLOAD_MB / SPMV_MAX_ARRAY_MB) so a
# supervised chain stage can probe beyond the conservative defaults — e.g.
# the fem3d_large dd wl structure needs ~2.9 GB total in <1 GB arrays.
_MAX_ARRAY_BYTES = int(os.environ.get("SPMV_MAX_ARRAY_MB",
                                      "1200")) * 1024 * 1024


def pack_x_table(x, ncols: int):
    """Pad x to the (R, 128) slab table consumed by the kernels.

    The whole table lives in VMEM (the generalization of the reference's
    shared-memory x cache, csr_matrix_cuda.cu:198-241). Raises for vectors
    beyond the VMEM budget (~24M f32 columns) — larger N routes through the
    column-panel decomposition (PanelSellMatrix / DevicePanelSell), which
    calls this per panel."""
    Rp = slab_table_rows(ncols)
    nbytes = Rp * LANES * x.dtype.itemsize
    if nbytes > _X_TABLE_VMEM_BUDGET:
        raise ValueError(
            f"x table ({nbytes/2**20:.0f} MiB for N={ncols}) exceeds the VMEM "
            f"budget ({_X_TABLE_VMEM_BUDGET/2**20:.0f} MiB); column-panel "
            "decomposition is not implemented yet — use the XLA kernels "
            "(ops/xla.py) for N this large"
        )
    pad = Rp * LANES - x.shape[0]
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    return x.reshape(Rp, LANES)


def device_put_x(x, ncols: int, dtype=jnp.float32, device=None):
    """Upload x PRE-PACKED as the (Rp, 128) slab table.

    The in-jit 1-D -> (Rp, 128) reshape is a physical relayout that XLA TPU
    executes at ~10 GB/s — 392 us for N=1M, the dominant fixed cost of every
    spmv call (TPU-measured, probes/sg_overhead.out). Packing on the host at
    upload matches the reference's methodology (x is memcpy'd to the device
    once before timing, main_cuda.cu:134-145); :func:`sell_spmv_pallas`
    accepts the packed table directly (x.ndim == 2)."""
    x = np.asarray(x)
    Rp = slab_table_rows(ncols)
    tab = np.zeros((Rp * LANES,), np.dtype(jnp.dtype(dtype).name))
    tab[: x.shape[0]] = x
    return jax.device_put(jnp.asarray(tab.reshape(Rp, LANES)), device)


# ---------------------------------------------------------------------------
# k-major slab-list kernel
# ---------------------------------------------------------------------------


def _kernel_k_major(k: int, g_per: int = 1, accumulate: bool = False,
                    resident: bool = False):
    KB = k * SUBLANES

    def kernel(gid_ref, slab_ref, cnt_ref, x_ref, ja_ref, as_ref, yin_ref, y_ref):
        step = pl.program_id(0)

        def group_acc(g, base):
            ja = ja_ref[pl.ds(base, KB), :]
            q = ja >> 7              # // 128
            m = ja & (LANES - 1)     # % 128
            nslab = cnt_ref[g]

            # chunked rolled loop: 8 slab passes per fori iteration — the
            # per-iteration overhead of a rolled Mosaic loop is ~8x a pass
            # (probes), so chunking recovers most of it on scattered
            # matrices. Lists are padded to a multiple of 8 with the spare
            # zero slab Rp-1 (in range, matches no entry).
            def body(c, acc, _m=m, _q=q, _g=g):
                for s8 in range(8):
                    sq = slab_ref[_g, c * 8 + s8]
                    xrow = x_ref[sq, :]
                    xb = jnp.broadcast_to(xrow[None, :], (KB, LANES))
                    gat = jnp.take_along_axis(xb, _m, axis=1)
                    acc = acc + jnp.where(_q == sq, gat, 0)
                return acc

            # gather first, multiply by values once (each entry matches
            # exactly one slab, so summing gathers first is exact).
            # Accumulation always happens in the x-table dtype (f32): the
            # value plane may be stored narrower (bf16 mode — halves the
            # dominant HBM stream) and is widened at load.
            gath = jax.lax.fori_loop(
                0, (nslab + 7) // 8, body, jnp.zeros((KB, LANES), x_ref.dtype)
            )
            acc = as_ref[pl.ds(base, KB), :].astype(x_ref.dtype) * gath
            # per-row reduction: out[i,j] = sum_k acc[k*8+i, j] — pairwise
            # tree (error growth ~log K vs ~K for the sequential chain;
            # dense-row f32 headroom, VERDICT r2 weak #8)
            if k <= _UNROLL_MAX:
                parts = [acc[kk * SUBLANES:(kk + 1) * SUBLANES, :]
                         for kk in range(k)]
                while len(parts) > 1:
                    parts = [parts[i] + parts[i + 1]
                             if i + 1 < len(parts) else parts[i]
                             for i in range(0, len(parts), 2)]
                red = parts[0]
            else:
                # rolled reduction: Mosaic has no dynamic_slice on arrays,
                # so stage acc through a scratch ref (refs support pl.ds)
                def scoped_red(scratch, _acc=acc):
                    scratch[:] = _acc

                    def red_body(kk, r):
                        return r + scratch[pl.ds(kk * SUBLANES, SUBLANES), :]

                    return jax.lax.fori_loop(1, k, red_body, scratch[0:SUBLANES, :])

                red = pl.run_scoped(
                    scoped_red, pltpu.VMEM((KB, LANES), acc.dtype)
                )
            return red

        if resident:
            # resident-y: whole y window stays in VMEM (constant index_map);
            # a rolled loop serves g_per groups per step, each writing its
            # (8,128) tile at a dynamic offset, predicated off for the -1
            # padding groups. The window must be seeded from the aliased
            # input once — rows this bin never writes are stored back at
            # grid end and would otherwise clobber earlier bins' tiles.
            @pl.when(step == 0)
            def _():
                y_ref[:] = yin_ref[:]

            def gbody(gi, _):
                g = step * g_per + gi
                red = group_acc(g, gi * KB)
                gid = gid_ref[g]

                @pl.when(gid >= 0)
                def _():
                    r = pl.multiple_of(gid * SUBLANES, SUBLANES)
                    if accumulate:
                        y_ref[pl.ds(r, SUBLANES), :] = \
                            y_ref[pl.ds(r, SUBLANES), :] + red
                    else:
                        y_ref[pl.ds(r, SUBLANES), :] = red
                return 0

            jax.lax.fori_loop(0, g_per, gbody, 0)
            return

        outs = []
        for gi in range(g_per):  # static: groups per grid step
            outs.append(group_acc(step * g_per + gi, gi * KB))
        out = outs[0] if g_per == 1 else jnp.concatenate(outs, axis=0)
        # column-panel accumulation: later panels add onto the aliased y tile
        y_ref[:] = (yin_ref[:] + out) if accumulate else out

    return kernel


# ---------------------------------------------------------------------------
# sb-major range-scan kernel
# ---------------------------------------------------------------------------


def _kernel_sb_major(k: int, span: int, g_per: int = 1, ck: int = CHUNK_K,
                     accumulate: bool = False, idx16: bool = False):
    """Range-scan kernel with fully static control flow.

    Per (8,128) chunk: ``span`` unrolled gather passes starting at the
    host-precomputed, scalar-prefetched slab base ``qb`` (slab_ref doubles as
    the qbase table for sb-major bins). Over-scan beyond the chunk's true
    range is masked out by the ``q == sq`` select, so a bin-uniform static
    span is safe; the multiply by values happens once per chunk, not per
    pass. When ``span == 1`` every entry's slab equals ``qb`` by
    construction, so the compare/select drops out entirely.
    """
    assert k % ck == 0
    nchunks = k // ck

    def kernel(gid_ref, qb_ref, cnt_ref, x_ref, ja_ref, as_ref, yin_ref, y_ref):
        step = pl.program_id(0)
        dtype = x_ref.dtype  # accumulate in x dtype; values may be narrower
        rows = []
        for gi in range(g_per):  # static: groups per grid step
            g = step * g_per + gi
            gbase = gi * k * SUBLANES
            for sb in range(SUBLANES):  # static: 8 superblocks per group

                def chunk_body(c, acc, _sb=sb, _g=g, _gbase=gbase):
                    off = pl.multiple_of(_gbase + _sb * k, ck) + c * ck
                    tile = ja_ref[pl.ds(off, ck), :]
                    if idx16:
                        # chunk-relative int16 plane (_pack_sb_i16): value
                        # is (dq << 7) | lane, dq = slab - qbase — half the
                        # index HBM bytes, and the compare target becomes
                        # the static pass id s (no qb add per pass)
                        tile = tile.astype(jnp.int32)
                    vals = as_ref[pl.ds(off, ck), :].astype(dtype)
                    qb = qb_ref[_g, _sb * nchunks + c]
                    if span == 1:
                        m = (tile & (LANES - 1)) if idx16 \
                            else tile - qb * LANES  # q == qb for every entry
                        xrow = x_ref[qb, :]
                        xb = jnp.broadcast_to(xrow[None, :], (ck, LANES))
                        gath = jnp.take_along_axis(xb, m, axis=1)
                    else:
                        q = tile >> 7          # // 128 (idx16: dq)
                        m = tile & (LANES - 1)  # % 128
                        gath = jnp.zeros((ck, LANES), dtype)
                        for s in range(span):  # static unroll
                            sq = qb + s
                            xrow = x_ref[sq, :]
                            xb = jnp.broadcast_to(xrow[None, :], (ck, LANES))
                            gat = jnp.take_along_axis(xb, m, axis=1)
                            gath = gath + jnp.where(q == (s if idx16 else sq),
                                                    gat, 0)
                    return acc + vals * gath

                # Mosaic fori_loop supports only unroll=1 or full unroll
                psum = jax.lax.fori_loop(
                    0, nchunks, chunk_body, jnp.zeros((ck, LANES), dtype),
                    unroll=nchunks if nchunks <= 16 else 1,
                )
                rows.append(jnp.sum(psum, axis=0))
        out = jnp.stack(rows)
        y_ref[:] = (yin_ref[:] + out) if accumulate else out

    return kernel


_MAX_STEP_BYTES = 4 << 20  # target JA+AS bytes per grid step (DMA efficiency)


def _pick_g_per(bin_, bytes_per_entry: int = 8) -> int:
    """Groups per grid step: largest divisor of (ng, contig alignment) that
    keeps the step's streams near _MAX_STEP_BYTES. Non-contiguous bins use 1
    (per-group scalar-prefetch output indexing)."""
    if bin_.contig_start < 0:
        return 1
    per_group = bin_.k * SUBLANES * LANES * bytes_per_entry
    want = max(1, _MAX_STEP_BYTES // per_group)
    g_per = 1
    for cand in (16, 8, 4, 2):
        if (
            cand <= want
            and bin_.n_groups % cand == 0
            and bin_.contig_start % cand == 0
        ):
            g_per = cand
            break
    return g_per


def _kernel_sb_list(k: int, span: int, g_per: int = 1, ck: int = CHUNK_K,
                    accumulate: bool = False, idx16: bool = False):
    """Hybrid kernel: sb-major data layout with per-chunk *distinct-slab
    lists* (scalar-prefetched, padded with the spare zero slab Rp-1).
    Robust when a chunk's slab range is wide but its distinct count is small
    — e.g. stencil matrices whose boundary rows shift k-alignment across
    x-slabs. The pad slab is in-range but referenced by no entry, so the
    mask never matches and no per-pass clamp is needed."""
    assert k % ck == 0
    nchunks = k // ck

    def kernel(gid_ref, lst_ref, cnt_ref, x_ref, ja_ref, as_ref, yin_ref, y_ref):
        step = pl.program_id(0)
        dtype = x_ref.dtype  # accumulate in x dtype; values may be narrower
        rows = []
        for gi in range(g_per):
            g = step * g_per + gi
            gbase = gi * k * SUBLANES
            for sb in range(SUBLANES):

                def chunk_body(c, acc, _sb=sb, _g=g, _gbase=gbase):
                    off = pl.multiple_of(_gbase + _sb * k, ck) + c * ck
                    tile = ja_ref[pl.ds(off, ck), :]
                    if idx16:
                        # list-position int16 plane (_pack_sl_i16): value is
                        # (js << 7) | lane — compare against the static pass
                        # id instead of the prefetched slab value
                        tile = tile.astype(jnp.int32)
                    vals = as_ref[pl.ds(off, ck), :].astype(dtype)
                    q = tile >> 7
                    m = tile & (LANES - 1)
                    lbase = (_sb * nchunks + c) * span
                    gath = jnp.zeros((ck, LANES), dtype)
                    for s in range(span):  # static unroll
                        sq = lst_ref[_g, lbase + s]
                        xrow = x_ref[sq, :]  # pads point at the spare zero slab
                        xb = jnp.broadcast_to(xrow[None, :], (ck, LANES))
                        gat = jnp.take_along_axis(xb, m, axis=1)
                        gath = gath + jnp.where(q == (s if idx16 else sq),
                                                gat, 0)
                    return acc + vals * gath

                psum = jax.lax.fori_loop(
                    0, nchunks, chunk_body, jnp.zeros((ck, LANES), dtype),
                    unroll=nchunks if nchunks <= 16 else 1,
                )
                rows.append(jnp.sum(psum, axis=0))
        out = jnp.stack(rows)
        y_ref[:] = (yin_ref[:] + out) if accumulate else out

    return kernel


def _kernel_wl(k: int, L: int, NW: int, g_per: int = 1,
               accumulate: bool = False, packed: bool = False):
    """Window-layered kernel (clustered matrices: FEM stencils).

    Data layout (formats/sell.py _wl_profile / _emit_wl_bin): per 128-row
    block, per window of 8 distinct slabs, ``L`` layer tiles of (8,128)
    where sublane = the slab's slot in the window and lane = row. The kernel
    builds one 8-row W table per window (8 scalar-prefetch-driven x reads)
    and then needs a SINGLE ``take_along_axis`` per layer tile — replacing
    the sb kernels' per-slab masked passes (probe2: one gather per tile runs
    at the streaming floor). ``ja`` stores lane offsets m directly.
    """
    assert k == 8 * NW * L
    Tn = SUBLANES * NW * L          # (8,128) tiles per group
    Tp = -(-Tn // 4)                # packed int32 tiles per group

    def kernel(gid_ref, slabs_ref, cnt_ref, x_ref, ja_ref, as_ref, yin_ref,
               y_ref):
        step = pl.program_id(0)
        dtype = x_ref.dtype  # accumulate in x dtype; may be narrower values
        rows = []
        for gi in range(g_per):
            g = step * g_per + gi
            gbase = gi * k * SUBLANES
            pbase = gi * Tp * 8
            for rb in range(SUBLANES):
                acc = jnp.zeros((8, LANES), dtype)
                for w in range(NW):
                    sbase = (rb * NW + w) * 8
                    W = jnp.stack(
                        [x_ref[slabs_ref[g, sbase + s], :] for s in range(8)]
                    )
                    for l in range(L):
                        t = (rb * NW + w) * L + l
                        off = pl.multiple_of(gbase + t * 8, 8)
                        if packed:
                            # 4 lane-index tiles per int32 tile: byte t%4
                            # of packed tile t//4 (_pack_wl_ja). One
                            # shift+mask replaces 3 extra HBM index bytes
                            # per slot.
                            poff = pl.multiple_of(pbase + (t // 4) * 8, 8)
                            pw = ja_ref[pl.ds(poff, 8), :]
                            m = (pw >> (8 * (t % 4))) & (LANES - 1)
                        else:
                            m = ja_ref[pl.ds(off, 8), :]
                        vals = as_ref[pl.ds(off, 8), :].astype(dtype)
                        acc = acc + vals * jnp.take_along_axis(W, m, axis=1)
                rows.append(jnp.sum(acc, axis=0))
        out = jnp.stack(rows)
        y_ref[:] = (yin_ref[:] + out) if accumulate else out

    return kernel


def _kernel_sg(T: int, V: int, g_per: int = 1, accumulate: bool = False,
               resident: bool = False, slots: bool = True):
    """SG kernel — the scattered/short-row layout (formats/sg.py; TPU answer
    to the reference's thread-per-row CUDA kernel, csr_matrix_cuda.cu:122-148).

    Every (8,128) tile has ONE shared x-window ``[w0, w0+V)``: per pass
    ``v`` the kernel broadcasts x-table row ``w0 + v`` and accumulates the
    lane-gather under a ``doff == v`` mask, where ``ja`` packs
    ``md = (doff*8 + sigma)*128 + m`` — ~4 vector ops per pass shared by up
    to 1024 entries.

    ``slots=True``: entries sit at free sublane slots of their lane
    (lane = row % 128); the destination sigma-row comes from md's sigma
    bits via a per-tile 8-way masked sublane reduction. ``slots=False``
    (dd-compatible packing): position == destination row, so the tile's
    products add straight onto the group's (8,128) y tile — no reduction.

    ``V > 0``: static unrolled passes (slab table stride 1: shared w0).
    ``V == 0``: per-tile dynamic pass counts (stride 2: [w0, count rounded
    to a multiple of 8]), scanned by a chunked rolled loop of 8 passes per
    iteration — the k-major rolled-chunk pattern; empty/padding tiles have
    count 0 and cost only the loop test.
    """
    TB = T * SUBLANES
    stride = 2 if V == 0 else 1

    def kernel(gid_ref, w0_ref, cnt_ref, x_ref, ja_ref, as_ref, yin_ref, y_ref):
        step = pl.program_id(0)
        dtype = x_ref.dtype  # accumulate in x dtype; values may be narrower

        def group_acc(g, gbase):
            def tile_body(t, acc, _g=g, _gbase=gbase):
                off = pl.multiple_of(_gbase, SUBLANES) + t * SUBLANES
                md = ja_ref[pl.ds(off, SUBLANES), :]
                vals = as_ref[pl.ds(off, SUBLANES), :].astype(dtype)
                m = md & (LANES - 1)
                zero = jnp.zeros((SUBLANES, LANES), dtype)
                w0 = w0_ref[_g, t * stride]
                if V == 1:
                    # doff == 0 for every entry by construction: no mask
                    xrow = x_ref[w0, :]
                    W = jnp.broadcast_to(xrow[None, :], (SUBLANES, LANES))
                    gath = jnp.take_along_axis(W, m, axis=1)
                elif V == 0:
                    doff = md >> 10

                    def chunk(c, gacc, _m=m, _d=doff, _w0=w0):
                        # ONE dynamic 8-row window load per chunk: per-pass
                        # dynamic single-row reads stall ~20 cycles each and
                        # dominated the whole kernel (TPU-measured, road
                        # 7.7 ms); static sublane extracts pipeline
                        W8 = x_ref[pl.ds(_w0 + c * 8, 8), :]
                        for v8 in range(8):
                            W = jnp.broadcast_to(W8[v8 : v8 + 1],
                                                 (SUBLANES, LANES))
                            gat = jnp.take_along_axis(W, _m, axis=1)
                            gacc = gacc + jnp.where(_d == c * 8 + v8, gat, 0)
                        return gacc

                    vc = w0_ref[_g, t * 2 + 1]  # multiple of 8 (0 = empty)
                    gath = jax.lax.fori_loop(0, vc // 8, chunk, zero)
                else:
                    # static V: a multiple of 8 by the quantize_V ladder, so
                    # the 8-row chunk reads stay inside the clamped window
                    assert V % 8 == 0, "static sg spans must be multiples of 8"
                    doff = md >> 10
                    gath = zero
                    for c in range(V // 8):
                        W8 = x_ref[pl.ds(w0 + c * 8, 8), :]
                        for v8 in range(8):
                            W = jnp.broadcast_to(W8[v8 : v8 + 1],
                                                 (SUBLANES, LANES))
                            gat = jnp.take_along_axis(W, m, axis=1)
                            gath = gath + jnp.where(doff == c * 8 + v8, gat, 0)
                prod = vals * gath
                if not slots:
                    return acc + prod
                # sigma-reduction: land each slot's product on its
                # destination sigma-row (masked sublane reduces)
                sig = (md >> 7) & (SUBLANES - 1)
                rows = [
                    jnp.sum(jnp.where(sig == s, prod, 0), axis=0,
                            keepdims=True)
                    for s in range(SUBLANES)
                ]
                return acc + jnp.concatenate(rows, axis=0)

            # keep bodies bounded: full unroll only while the step's total
            # unrolled pass count stays within the Mosaic compile budget.
            # Resident mode rolls the group loop (fori), so its body holds
            # ONE group's tile loop — g_per doesn't multiply the budget.
            # Wide-Tq bins bound the (rolled) tile loop by the group's REAL
            # tile count (slab_count): pow2 Tq quantization would otherwise
            # scan every padding tile at the full static pass count.
            mult = 1 if resident else g_per
            unroll = T if (T <= 32 and mult * T * max(V, 1) <= 320) else 1
            bound = cnt_ref[g] if (unroll == 1 and T > 8) else T
            return jax.lax.fori_loop(
                0, bound, tile_body, jnp.zeros((SUBLANES, LANES), dtype),
                unroll=unroll,
            )

        if resident:
            @pl.when(step == 0)
            def _():
                y_ref[:] = yin_ref[:]  # seed: see _kernel_k_major resident

            def gbody(gi, _):
                g = step * g_per + gi
                acc = group_acc(g, gi * TB)
                gid = gid_ref[g]

                @pl.when(gid >= 0)
                def _():
                    r = pl.multiple_of(gid * SUBLANES, SUBLANES)
                    if accumulate:
                        y_ref[pl.ds(r, SUBLANES), :] = \
                            y_ref[pl.ds(r, SUBLANES), :] + acc
                    else:
                        y_ref[pl.ds(r, SUBLANES), :] = acc
                return 0

            jax.lax.fori_loop(0, g_per, gbody, 0)
            return

        outs = []
        for gi in range(g_per):
            outs.append(group_acc(step * g_per + gi, gi * TB))
        out = outs[0] if g_per == 1 else jnp.concatenate(outs, axis=0)
        y_ref[:] = (yin_ref[:] + out) if accumulate else out

    return kernel


def _bin_call(bin_: DeviceSellBin, x_tab, y, num_groups: int, interpret: bool,
              accumulate: bool = False):
    """One pallas_call for one rectangular bin, writing its groups' (8,128)
    output tiles in place into the shared y buffer (input_output_aliases).
    Contiguous bins process ``g_per`` groups per grid step for DMA
    efficiency (≙ reference block-size tuning, main_cuda.cu occupancy)."""
    ng, K = bin_.n_groups, bin_.k
    resident = int(getattr(bin_, "resident_g_per", 0) or 0)
    packed = bool(getattr(bin_, "ja_packed", False))
    ja_bytes = 1 if packed else bin_.ja.dtype.itemsize
    g_per = resident if resident > 1 else _pick_g_per(
        bin_, bytes_per_entry=ja_bytes + bin_.as_.dtype.itemsize)
    KB = K * SUBLANES * g_per
    # packed wl: the index plane carries ceil(tiles/4) int32 tiles per group
    KBJ = (-(-(K * SUBLANES // 8) // 4) * 8 * g_per) if packed else KB
    R = x_tab.shape[0]

    if resident > 1:
        # resident-y: one constant output window holds the whole y buffer;
        # groups write their tiles at dynamic offsets (see _kernel_* resident)
        yrows = y.shape[0]
        out_map_spec = pl.BlockSpec((yrows, LANES), lambda g, *refs: (0, 0),
                                    memory_space=pltpu.VMEM)
    elif g_per == 1:
        out_map = lambda g, refs0, refs1, refs2: (refs0[g], 0)
        out_map_spec = pl.BlockSpec((SUBLANES, LANES), out_map,
                                    memory_space=pltpu.VMEM)
    else:
        out_map = lambda g, refs0, refs1, refs2: (refs0[g * g_per] // g_per, 0)
        out_map_spec = pl.BlockSpec((SUBLANES * g_per, LANES), out_map,
                                    memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # group_ids, slab_list/qbase, slab_count
        grid=(ng // g_per,),
        in_specs=[
            pl.BlockSpec((R, LANES), lambda g, *refs: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KBJ, LANES), lambda g, *refs: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, LANES), lambda g, *refs: (g, 0), memory_space=pltpu.VMEM),
            # the aliased y input: same mapping as the output so the window
            # holds what we overwrite (revolving tile, or the whole buffer)
            out_map_spec,
        ],
        out_specs=out_map_spec,
    )

    if bin_.layout == "sb-major":
        kernel = _kernel_sb_major(K, bin_.span, g_per, bin_.chunk_k, accumulate,
                                  idx16=bin_.ja.dtype == jnp.int16)
    elif bin_.layout == "sb-list":
        kernel = _kernel_sb_list(K, bin_.span, g_per, bin_.chunk_k, accumulate,
                                 idx16=bin_.ja.dtype == jnp.int16)
    elif bin_.layout == "wl":
        kernel = _kernel_wl(K, bin_.span, bin_.chunk_k, g_per, accumulate,
                            packed=packed)
    elif bin_.layout == "sg":
        kernel = _kernel_sg(K, bin_.span, g_per, accumulate,
                            resident=resident > 1,
                            slots=bool(getattr(bin_, "sg_slots", False)))
    else:
        kernel = _kernel_k_major(K, g_per, accumulate, resident=resident > 1)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_groups * SUBLANES, LANES), x_tab.dtype),
        input_output_aliases={6: 0},  # yin (3 prefetch + x,ja,as -> index 6) -> y
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # v5e exposes 128 MiB VMEM; the default 16 MiB scoped limit both
            # rejects large x-tables and OOMs unrolled kernels (measured)
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(bin_.group_ids, bin_.slab_list, bin_.slab_count, x_tab, bin_.ja, bin_.as_, y)


@functools.partial(jax.jit, static_argnames=("interpret", "assembly"))
def sell_spmv_pallas(dsell, x, *, interpret: bool = False, assembly: str = "auto"):
    """SpMV over the binned SELL layout; returns y[:nrows] in natural order.

    Accepts a :class:`DeviceSell` (single x-table in VMEM) or a
    :class:`DevicePanelSell` (column panels for N beyond the VMEM budget —
    parity with the reference's unbounded-N kernels, src/csr_matrix.c:130-139).

    ``assembly``:
      ``"auto"`` (default): core bins (write-disjoint tiles) chain one
      aliased buffer; each add_into bin (sg far remainder) writes its OWN
      zero buffer with plain writes, summed at the end. Accumulating into a
      resident whole-y window forces an 8 MB read-modify-write per grid
      step (TPU-measured ~28 us/step vs ~7 pure-write,
      probes/sg_bins_road2.out) — private buffers keep far bins pure-write.
      ``"sum"``: every bin gets its own zero buffer (data-independent calls
      overlap DMA/compute; probes/kernel_probe4).
      ``"chain"``: one aliased buffer through every call (serial; r1).
    """
    if isinstance(dsell, DevicePanelSell):
        return _panel_spmv(dsell, x, interpret)
    # 2-D input = already the packed (Rp, 128) slab table (device_put_x)
    x_tab = x if x.ndim == 2 else pack_x_table(x, dsell.ncols)
    # y covers the contiguous-tail-padded groups (zero tiles past
    # num_groups, discarded by the final crop)
    yg = dsell.y_groups or dsell.num_groups
    y = jnp.zeros((yg * SUBLANES, LANES), dtype=x_tab.dtype)
    has_far = any(b.add_into for b in dsell.bins)
    if assembly == "sum" and len(dsell.bins) > 1:
        # every bin writes its own zero buffer (add_into bins included — the
        # final sum assembles overlapping groups exactly)
        ys = [
            _bin_call(bin_, x_tab, jnp.zeros_like(y), yg, interpret)
            for bin_ in dsell.bins
        ]
        for yb in ys:
            y = y + yb
    elif assembly == "auto" and has_far:
        for bin_ in dsell.bins:
            if not bin_.add_into:
                y = _bin_call(bin_, x_tab, y, yg, interpret)
        for bin_ in dsell.bins:
            if bin_.add_into:
                y = y + _bin_call(bin_, x_tab, jnp.zeros_like(y),
                                  yg, interpret)
    else:
        for bin_ in dsell.bins:
            y = _bin_call(bin_, x_tab, y, yg, interpret,
                          accumulate=bin_.add_into)
    return y.reshape(-1)[: dsell.nrows]


# ---------------------------------------------------------------------------
# column panels: x beyond the VMEM budget
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class DevicePanelSell:
    """Per-column-panel DeviceSell structures sharing one y buffer."""

    nrows: int
    ncols: int
    nnz: int
    num_groups: int
    bounds: tuple          # (P+1,) static column edges
    panels: list           # list[DeviceSell]

    def tree_flatten(self):
        return (tuple(self.panels),), (
            self.nrows, self.ncols, self.nnz, self.num_groups, self.bounds,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, list(children[0]))

    def spmv(self, x):
        return sell_spmv_pallas(self, x)


def max_x_table_cols(dtype=jnp.float32) -> int:
    """Largest N whose x-table fits the VMEM budget (slab-aligned).

    Derived from the same formula as :func:`pack_x_table`, which allocates
    ``Rp = (ceil(N/128)//8 + 1) * 8`` rows (sublane alignment PLUS a spare
    zero slab) — so the returned N satisfies ``Rp * 128 * itemsize <=
    _X_TABLE_VMEM_BUDGET`` exactly at the boundary."""
    itemsize = jnp.dtype(dtype).itemsize
    rows = (_X_TABLE_VMEM_BUDGET // (LANES * itemsize) // SUBLANES - 1) * SUBLANES
    return rows * LANES


def device_put_panel_sell(psell, dtype=jnp.float32, device=None,
                          resident=True) -> DevicePanelSell:
    """Upload a host PanelSellMatrix (formats/sell.py). ``resident=False``
    as in :func:`device_put_sell` (required for the SpMM path)."""
    return DevicePanelSell(
        nrows=psell.nrows,
        ncols=psell.ncols,
        nnz=psell.nnz,
        num_groups=psell.num_groups,
        bounds=tuple(int(b) for b in psell.bounds),
        panels=[device_put_sell(p, dtype=dtype, device=device,
                                resident=resident) for p in psell.panels],
    )


def _panel_spmv(dps: DevicePanelSell, x, interpret: bool):
    # y covers any panel's contiguous-tail padding (zero tiles, cropped)
    yg = max([dps.num_groups]
             + [p.y_groups or p.num_groups for p in dps.panels])
    y = jnp.zeros((yg * SUBLANES, LANES), dtype=x.dtype)
    for p, dsell in enumerate(dps.panels):
        c0, c1 = dps.bounds[p], dps.bounds[p + 1]
        x_tab = pack_x_table(x[c0:c1], c1 - c0)
        for bin_ in dsell.bins:
            # always accumulate: panels may write the same group tiles
            y = _bin_call(bin_, x_tab, y, yg, interpret,
                          accumulate=True)
    return y.reshape(-1)[: dps.nrows]
