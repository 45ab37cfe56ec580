"""Double-double Pallas SELL SpMV — fp64-class results on the TPU VPU.

The reference's kernels are all fp64 (C doubles). Mosaic rejects 64-bit
types, so this kernel family carries every value as an f32 ``(hi, lo)`` pair
(:mod:`.doubledouble`) and accumulates with error-free transforms: products
via Dekker two-prod, sums via Knuth two-sum — ~2^-48 relative error,
validated to < 1e-12 against the numpy fp64 oracle (vs ~1e-7 for the plain
f32 kernels). This is the framework's answer to SURVEY §7 hard part 1
("fp64 on TPU ... validation to 1e-9 forces true fp64 accumulation").

Same SELL-C-128 layouts and slab-enumeration strategies as
:mod:`.pallas_sell`; the value stream doubles (8 B/entry) and each slab pass
gathers from both x half-tables.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.sell import CHUNK_K, LANES, SUBLANES, SellMatrix
from .doubledouble import dd_add_dd, split_f64, two_prod, two_sum
from .pallas_sell import pack_x_table

__all__ = ["DeviceSellDD", "DevicePanelSellDD", "device_put_sell_dd",
           "device_put_panel_sell_dd", "sell_spmv_pallas_dd"]


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceSellBinDD:
    k: int
    n_groups: int
    layout: str
    span: int
    group_ids: jax.Array
    ja: jax.Array
    as_hi: jax.Array
    as_lo: jax.Array
    slab_list: jax.Array
    slab_count: jax.Array
    contig_start: int = -1
    chunk_k: int = CHUNK_K
    add_into: bool = False
    resident_g_per: int = 0  # see ops/pallas_sell.py DeviceSellBin
    ja_packed: bool = False  # wl: 4 lane-bytes per int32 tile (_pack_wl_ja)

    def tree_flatten(self):
        return (
            (self.group_ids, self.ja, self.as_hi, self.as_lo,
             self.slab_list, self.slab_count),
            (self.k, self.n_groups, self.layout, self.span, self.contig_start,
             self.chunk_k, self.add_into, self.resident_g_per,
             self.ja_packed),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        k, ng, layout, span, contig, ck, add, res, packed = aux
        return cls(k, ng, layout, span, *children, contig_start=contig,
                   chunk_k=ck, add_into=add, resident_g_per=res,
                   ja_packed=packed)


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceSellDD:
    nrows: int
    ncols: int
    nnz: int
    num_groups: int
    bins: list
    # y groups incl. contiguous-tail padding (0 = num_groups); see
    # pallas_sell._contig_tail_pad
    y_groups: int = 0

    def tree_flatten(self):
        return (tuple(self.bins),), (self.nrows, self.ncols, self.nnz,
                                     self.num_groups, self.y_groups)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux[:4], list(children[0]), *aux[4:])

    def spmv(self, x):
        return sell_spmv_pallas_dd(self, x)


def device_put_sell_dd(sell, device=None):
    """Upload with fp64 values split into f32 (hi, lo) planes.
    PanelSellMatrix inputs route to :func:`device_put_panel_sell_dd`."""
    if hasattr(sell, "panels"):
        return device_put_panel_sell_dd(sell, device=device)
    from .pallas_sell import _MAX_ARRAY_BYTES, _MAX_UPLOAD_BYTES

    from .pallas_sell import _split_oversize_host_bins
    split_bins = _split_oversize_host_bins(sell.bins, sell.num_groups,
                                       value_bytes=4)  # hi/lo planes are f32 each

    # per-ARRAY cap: the observed worker-killers were ~1.4 GB single
    # transfers; many-array structures up to 1.9 GB uploaded fine (r1
    # 119M-nnz dd). Uploads happen bin-by-bin below (incremental), so the
    # total cap is the looser memory-pressure bound — this re-admits the
    # reference's own headline scale (fp64 at 127M nnz, result_cuda.csv:3)
    # that r2's all-or-nothing 2.2 GB total guard skipped. Oversize bins
    # were split above (the hi/lo planes upload at rows*128*4 B each,
    # which _split_oversize_host_bins bounds by _MAX_ARRAY_BYTES).
    biggest = max((max(b.ja.nbytes, b.ja.shape[0] * 128 * 4)
                   for b in split_bins), default=0)
    total = sum(b.ja.nbytes + 2 * b.as_.nbytes for b in split_bins)
    if biggest > _MAX_ARRAY_BYTES or total > 2 * _MAX_UPLOAD_BYTES:
        raise MemoryError(
            f"dd SELL device arrays: biggest {biggest/2**20:.0f} MiB / "
            f"total {total/2**20:.0f} MiB exceed the worker-crash guard "
            f"({_MAX_ARRAY_BYTES/2**20:.0f} / "
            f"{2*_MAX_UPLOAD_BYTES/2**20:.0f} MiB)")
    from .pallas_sell import (_contig_tail_pad, _pack_sb_i16,
                              _pack_sl_i16, _pack_wl_ja, _resident_pad,
                              _sb_i16_enabled, _wl_pack_enabled)

    bins = []
    y_groups = sell.num_groups
    for b in split_bins:
        if b.layout == "sg" and getattr(b, "sg_slots", False):
            raise ValueError(
                "dd kernels need row-unique sg positions (their error-free "
                "transforms sum at most one product per output); convert "
                "with SellMatrix.from_csr(..., sg_slots=False) for the dd "
                "stage")
        gids = np.asarray(b.group_ids, np.int64)
        contig = (
            int(gids[0])
            if gids.size and np.array_equal(gids, gids[0] + np.arange(gids.size))
            else -1
        )
        # itemsize 8: the dd y pair (hi, lo) doubles the resident-y budget use
        res_g_per, padded = _resident_pad(b, sell.num_groups, 8)
        if padded is None:
            _gp, ng_p, tail = _contig_tail_pad(b, sell.num_groups, 8, contig)
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
        hi, lo = split_f64(np.asarray(as_h, np.float64))
        packed = b.layout == "wl" and _wl_pack_enabled()
        if packed:
            ja_h = _pack_wl_ja(np.asarray(ja_h), ja_h.shape[0] // ng_dev)
        if (_sb_i16_enabled() and int(getattr(b, "span", 0)) <= 255
                and b.layout in ("sb-major", "sb-list")):
            pack = _pack_sb_i16 if b.layout == "sb-major" else _pack_sl_i16
            ja_h = pack(np.asarray(ja_h), np.asarray(sl_h), ng_dev,
                        int(b.k), int(getattr(b, "chunk_k", 8)),
                        int(b.span))
        bins.append(
            DeviceSellBinDD(
                ja_packed=packed,
                contig_start=contig,
                chunk_k=int(getattr(b, "chunk_k", 8)),
                add_into=bool(getattr(b, "add_into", False)),
                resident_g_per=res_g_per,
                k=int(b.k),
                n_groups=ng_dev,
                layout=b.layout,
                span=int(b.span),
                group_ids=jax.device_put(jnp.asarray(gid_h, jnp.int32), device),
                ja=jax.device_put(jnp.asarray(
                    ja_h, jnp.int16 if ja_h.dtype == np.int16
                    else jnp.int32), device),
                as_hi=jax.device_put(jnp.asarray(hi), device),
                as_lo=jax.device_put(jnp.asarray(lo), device),
                slab_list=jax.device_put(jnp.asarray(sl_h, jnp.int32), device),
                slab_count=jax.device_put(jnp.asarray(cnt_h, jnp.int32), device),
            )
        )
    return DeviceSellDD(sell.nrows, sell.ncols, sell.nnz, sell.num_groups,
                        bins, y_groups=y_groups)


def _dd_chunk_accumulate(acc_h, acc_l, vals_h, vals_l, g_h, g_l):
    """acc += a * g in double-double, elementwise on (ck, LANES)."""
    ph, pe = two_prod(vals_h, g_h)
    pl_ = pe + (vals_h * g_l + vals_l * g_h)
    sh, se = two_sum(acc_h, ph)
    return sh, acc_l + (se + pl_)


def _dd_reduce_sublanes(acc_h, acc_l, ck: int = CHUNK_K):
    """DD sum over the sublane axis: (ck,128) dd -> (128,) dd."""
    rh = acc_h[0, :]
    rl = acc_l[0, :]
    for i in range(1, ck):
        rh, rl = dd_add_dd(rh, rl, acc_h[i, :], acc_l[i, :])
    return rh, rl


def _kernel_sb_major_dd(k: int, span: int, interpret: bool = False, g_per: int = 1,
                        ck: int = CHUNK_K, accumulate: bool = False,
                        idx16: bool = False):
    """interpret=True keeps every loop rolled (unroll=1): the XLA CPU jit that
    executes interpreted kernels folds the error-free-transform terms when
    bodies are unrolled (this runtime sets --xla_allow_excess_precision).
    Mosaic-compiled TPU kernels preserve EFTs with full unrolling (measured
    8.5e-14 vs fp64 oracle)."""
    assert k % ck == 0
    nchunks = k // ck

    def kernel(gid_ref, qb_ref, cnt_ref, xh_ref, xl_ref, ja_ref, ah_ref, al_ref,
               yinh_ref, yinl_ref, yh_ref, yl_ref):
        step = pl.program_id(0)
        rows_h, rows_l = [], []
        for gi in range(g_per):
          g = step * g_per + gi
          gbase = gi * k * SUBLANES
          for sb in range(SUBLANES):

            def chunk_body(c, carry, _sb=sb, _g=g, _gbase=gbase):
                acc_h, acc_l = carry
                off = pl.multiple_of(_gbase + _sb * k, ck) + c * ck
                tile = ja_ref[pl.ds(off, ck), :]
                if idx16:  # chunk-relative (dq<<7)|lane int16 plane
                    tile = tile.astype(jnp.int32)
                vh = ah_ref[pl.ds(off, ck), :]
                vl = al_ref[pl.ds(off, ck), :]
                qb = qb_ref[_g, _sb * nchunks + c]
                if span == 1:
                    m = (tile & (LANES - 1)) if idx16 else tile - qb * LANES
                    xbh = jnp.broadcast_to(xh_ref[qb, :][None, :], (ck, LANES))
                    xbl = jnp.broadcast_to(xl_ref[qb, :][None, :], (ck, LANES))
                    g_h = jnp.take_along_axis(xbh, m, axis=1)
                    g_l = jnp.take_along_axis(xbl, m, axis=1)
                else:
                    q = tile >> 7
                    m = tile & (LANES - 1)
                    g_h = jnp.zeros((ck, LANES), jnp.float32)
                    g_l = jnp.zeros((ck, LANES), jnp.float32)
                    for s in range(span):
                        sq = qb + s
                        xbh = jnp.broadcast_to(xh_ref[sq, :][None, :], (ck, LANES))
                        xbl = jnp.broadcast_to(xl_ref[sq, :][None, :], (ck, LANES))
                        mask = q == (s if idx16 else sq)
                        g_h = g_h + jnp.where(mask, jnp.take_along_axis(xbh, m, axis=1), 0)
                        g_l = g_l + jnp.where(mask, jnp.take_along_axis(xbl, m, axis=1), 0)
                return _dd_chunk_accumulate(acc_h, acc_l, vh, vl, g_h, g_l)

            zero = jnp.zeros((ck, LANES), jnp.float32)
            acc_h, acc_l = jax.lax.fori_loop(
                0, nchunks, chunk_body, (zero, zero),
                unroll=1 if interpret else (nchunks if nchunks <= 16 else 1),
            )
            rh, rl = _dd_reduce_sublanes(acc_h, acc_l, ck)
            rows_h.append(rh)
            rows_l.append(rl)
        oh, ol = jnp.stack(rows_h), jnp.stack(rows_l)
        if accumulate:  # column panels: dd-add onto the aliased y tiles
            oh, ol = dd_add_dd(yinh_ref[:], yinl_ref[:], oh, ol)
        yh_ref[:] = oh
        yl_ref[:] = ol

    return kernel


def _kernel_sb_list_dd(k: int, span: int, interpret: bool = False, g_per: int = 1,
                       ck: int = CHUNK_K, accumulate: bool = False,
                       idx16: bool = False):
    """DD twin of the sb-list hybrid (per-chunk distinct-slab lists)."""
    assert k % ck == 0
    nchunks = k // ck

    def kernel(gid_ref, lst_ref, cnt_ref, xh_ref, xl_ref, ja_ref, ah_ref, al_ref,
               yinh_ref, yinl_ref, yh_ref, yl_ref):
        step = pl.program_id(0)
        rows_h, rows_l = [], []
        for gi in range(g_per):
          g = step * g_per + gi
          gbase = gi * k * SUBLANES
          for sb in range(SUBLANES):

            def chunk_body(c, carry, _sb=sb, _g=g, _gbase=gbase):
                acc_h, acc_l = carry
                off = pl.multiple_of(_gbase + _sb * k, ck) + c * ck
                tile = ja_ref[pl.ds(off, ck), :]
                if idx16:  # list-position (js<<7)|lane int16 plane
                    tile = tile.astype(jnp.int32)
                vh = ah_ref[pl.ds(off, ck), :]
                vl = al_ref[pl.ds(off, ck), :]
                q = tile >> 7
                m = tile & (LANES - 1)
                lbase = (_sb * nchunks + c) * span
                g_h = jnp.zeros((ck, LANES), jnp.float32)
                g_l = jnp.zeros((ck, LANES), jnp.float32)
                for s in range(span):
                    sq = lst_ref[_g, lbase + s]
                    xbh = jnp.broadcast_to(xh_ref[sq, :][None, :], (ck, LANES))
                    xbl = jnp.broadcast_to(xl_ref[sq, :][None, :], (ck, LANES))
                    mask = q == (s if idx16 else sq)
                    g_h = g_h + jnp.where(mask, jnp.take_along_axis(xbh, m, axis=1), 0)
                    g_l = g_l + jnp.where(mask, jnp.take_along_axis(xbl, m, axis=1), 0)
                return _dd_chunk_accumulate(acc_h, acc_l, vh, vl, g_h, g_l)

            zero = jnp.zeros((ck, LANES), jnp.float32)
            acc_h, acc_l = jax.lax.fori_loop(
                0, nchunks, chunk_body, (zero, zero),
                unroll=1 if interpret else (nchunks if nchunks <= 16 else 1),
            )
            rh, rl = _dd_reduce_sublanes(acc_h, acc_l, ck)
            rows_h.append(rh)
            rows_l.append(rl)
        oh, ol = jnp.stack(rows_h), jnp.stack(rows_l)
        if accumulate:  # column panels: dd-add onto the aliased y tiles
            oh, ol = dd_add_dd(yinh_ref[:], yinl_ref[:], oh, ol)
        yh_ref[:] = oh
        yl_ref[:] = ol

    return kernel


def _kernel_k_major_dd(k: int, interpret: bool = False, g_per: int = 1,
                       accumulate: bool = False, resident: bool = False):
    KB = k * SUBLANES

    def kernel(gid_ref, slab_ref, cnt_ref, xh_ref, xl_ref, ja_ref, ah_ref, al_ref,
               yinh_ref, yinl_ref, yh_ref, yl_ref):
        step = pl.program_id(0)

        def group_acc(g, base):
          ja = ja_ref[pl.ds(base, KB), :]
          q = ja >> 7
          m = ja & (LANES - 1)
          nslab = cnt_ref[g]

          def body(c, carry, _q=q, _m=m, _g=g):
            g_h, g_l = carry
            for s8 in range(8):  # chunked rolled loop (see f32 twin)
                sq = slab_ref[_g, c * 8 + s8]
                xbh = jnp.broadcast_to(xh_ref[sq, :][None, :], (KB, LANES))
                xbl = jnp.broadcast_to(xl_ref[sq, :][None, :], (KB, LANES))
                mask = _q == sq
                g_h = g_h + jnp.where(mask, jnp.take_along_axis(xbh, _m, axis=1), 0)
                g_l = g_l + jnp.where(mask, jnp.take_along_axis(xbl, _m, axis=1), 0)
            return g_h, g_l

          zero = jnp.zeros((KB, LANES), jnp.float32)
          g_h, g_l = jax.lax.fori_loop(0, (nslab + 7) // 8, body, (zero, zero))

          # dd product per entry, then dd reduction over the K slices
          vh = ah_ref[pl.ds(base, KB), :]
          vl = al_ref[pl.ds(base, KB), :]
          ph, pe = two_prod(vh, g_h)
          pl_ = pe + (vh * g_l + vl * g_h)
          zero = jnp.zeros((SUBLANES, LANES), jnp.float32)
          if interpret:
            # rolled loop: see _kernel_sb_major_dd note on EFT folding
            def red_body(kk, carry, _ph=ph, _pl=pl_):
                h, l = carry
                sh = jax.lax.dynamic_slice(_ph, (kk * SUBLANES, 0), (SUBLANES, LANES))
                sl_ = jax.lax.dynamic_slice(_pl, (kk * SUBLANES, 0), (SUBLANES, LANES))
                return dd_add_dd(h, l, sh, sl_)

            acc_h, acc_l = jax.lax.fori_loop(0, k, red_body, (zero, zero), unroll=1)
          else:
            acc_h, acc_l = zero, zero
            for kk in range(k):
                sl = slice(kk * SUBLANES, (kk + 1) * SUBLANES)
                acc_h, acc_l = dd_add_dd(acc_h, acc_l, ph[sl, :], pl_[sl, :])
          return acc_h, acc_l

        if resident:
            @pl.when(step == 0)
            def _():
                yh_ref[:] = yinh_ref[:]  # seed: see f32 twin resident note
                yl_ref[:] = yinl_ref[:]

            def gbody(gi, _):
                g = step * g_per + gi
                acc_h, acc_l = group_acc(g, gi * KB)
                gid = gid_ref[g]

                @pl.when(gid >= 0)
                def _():
                    r = pl.multiple_of(gid * SUBLANES, SUBLANES)
                    if accumulate:
                        oh, ol = dd_add_dd(yh_ref[pl.ds(r, SUBLANES), :],
                                           yl_ref[pl.ds(r, SUBLANES), :],
                                           acc_h, acc_l)
                    else:
                        oh, ol = acc_h, acc_l
                    yh_ref[pl.ds(r, SUBLANES), :] = oh
                    yl_ref[pl.ds(r, SUBLANES), :] = ol
                return 0

            jax.lax.fori_loop(0, g_per, gbody, 0)
            return

        outs_h, outs_l = [], []
        for gi in range(g_per):
            acc_h, acc_l = group_acc(step * g_per + gi, gi * KB)
            outs_h.append(acc_h)
            outs_l.append(acc_l)
        oh = outs_h[0] if g_per == 1 else jnp.concatenate(outs_h, axis=0)
        ol = outs_l[0] if g_per == 1 else jnp.concatenate(outs_l, axis=0)
        if accumulate:
            oh, ol = dd_add_dd(yinh_ref[:], yinl_ref[:], oh, ol)
        yh_ref[:] = oh
        yl_ref[:] = ol

    return kernel



def _kernel_wl_dd(k: int, L: int, NW: int, interpret: bool = False,
                  g_per: int = 1, accumulate: bool = False,
                  packed: bool = False):
    """DD twin of the window-layered kernel (ops/pallas_sell.py _kernel_wl):
    one W table pair (hi, lo) per window, one take_along_axis pair per layer
    tile, dd accumulation. Under interpret the layer loop stays rolled so
    XLA CPU cannot fold the error-free transforms. ``packed``: the index
    plane holds 4 lane-bytes per int32 tile (_pack_wl_ja) — the rolled
    interpret loop unpacks with a dynamic shift, the Mosaic path unrolls
    with static byte lanes."""
    assert k == 8 * NW * L
    Tp = -(-(SUBLANES * NW * L) // 4)

    def kernel(gid_ref, slabs_ref, cnt_ref, xh_ref, xl_ref, ja_ref, ah_ref,
               al_ref, yinh_ref, yinl_ref, yh_ref, yl_ref):
        step = pl.program_id(0)
        rows_h, rows_l = [], []
        for gi in range(g_per):
            g = step * g_per + gi
            gbase = gi * k * SUBLANES
            pbase = gi * Tp * 8
            for rb in range(SUBLANES):
                acc_h = jnp.zeros((8, LANES), jnp.float32)
                acc_l = jnp.zeros((8, LANES), jnp.float32)
                for w in range(NW):
                    sbase = (rb * NW + w) * 8
                    Wh = jnp.stack(
                        [xh_ref[slabs_ref[g, sbase + s], :] for s in range(8)])
                    Wl = jnp.stack(
                        [xl_ref[slabs_ref[g, sbase + s], :] for s in range(8)])

                    def _load_m(l_static_or_traced, _rb=rb, _w=w,
                                _gbase=gbase, _pbase=pbase):
                        t = (_rb * NW + _w) * L + l_static_or_traced
                        if packed:
                            pw = ja_ref[pl.ds(_pbase + (t // 4) * 8, 8), :]
                            return (pw >> (8 * (t % 4))) & 127
                        return ja_ref[pl.ds(_gbase + t * 8, 8), :]

                    def layer_body(l, carry, _rb=rb, _w=w, _gbase=gbase,
                                   _Wh=Wh, _Wl=Wl):
                        ah, al = carry
                        off = _gbase + ((_rb * NW + _w) * L) * 8 + l * 8
                        m = _load_m(l, _rb=_rb, _w=_w)
                        vh = ah_ref[pl.ds(off, 8), :]
                        vl = al_ref[pl.ds(off, 8), :]
                        gh = jnp.take_along_axis(_Wh, m, axis=1)
                        gl_ = jnp.take_along_axis(_Wl, m, axis=1)
                        return _dd_chunk_accumulate(ah, al, vh, vl, gh, gl_)

                    if interpret:
                        acc_h, acc_l = jax.lax.fori_loop(
                            0, L, layer_body, (acc_h, acc_l), unroll=1)
                    else:
                        for l in range(L):
                            acc_h, acc_l = layer_body(l, (acc_h, acc_l))
                rh, rl = _dd_reduce_sublanes(acc_h, acc_l, 8)
                rows_h.append(rh)
                rows_l.append(rl)
        oh, ol = jnp.stack(rows_h), jnp.stack(rows_l)
        if accumulate:
            oh, ol = dd_add_dd(yinh_ref[:], yinl_ref[:], oh, ol)
        yh_ref[:] = oh
        yl_ref[:] = ol

    return kernel


def _kernel_sg_dd(T: int, V: int, interpret: bool = False, g_per: int = 1,
                  accumulate: bool = False, resident: bool = False):
    """DD twin of the SG kernel (ops/pallas_sell.py _kernel_sg): hi/lo x
    tables gathered per shared-window pass, double-double accumulation per
    tile straight into the (8,128) y pair (the layout is scatter-free: entry
    position == destination row). The per-pass masked gather sums are exact
    (each entry matches exactly one pass), so only the tile accumulation
    needs error-free transforms — kept rolled under interpret (XLA CPU folds
    unrolled EFTs; Mosaic preserves them)."""
    TB = T * SUBLANES
    stride = 2 if V == 0 else 1

    def kernel(gid_ref, w0_ref, cnt_ref, xh_ref, xl_ref, ja_ref, ah_ref, al_ref,
               yinh_ref, yinl_ref, yh_ref, yl_ref):
        step = pl.program_id(0)

        def group_acc(g, gbase):
            def tile_body(t, carry, _g=g, _gbase=gbase):
                acc_h, acc_l = carry
                off = pl.multiple_of(_gbase, SUBLANES) + t * SUBLANES
                md = ja_ref[pl.ds(off, SUBLANES), :]
                vh = ah_ref[pl.ds(off, SUBLANES), :]
                vl = al_ref[pl.ds(off, SUBLANES), :]
                m = md & (LANES - 1)
                zero = jnp.zeros((SUBLANES, LANES), jnp.float32)
                w0 = w0_ref[_g, t * stride]
                if V == 1:
                    # doff == 0 for every entry by construction: no mask
                    Wh = jnp.broadcast_to(xh_ref[w0, :][None, :],
                                          (SUBLANES, LANES))
                    Wl = jnp.broadcast_to(xl_ref[w0, :][None, :],
                                          (SUBLANES, LANES))
                    g_h = jnp.take_along_axis(Wh, m, axis=1)
                    g_l = jnp.take_along_axis(Wl, m, axis=1)
                elif V == 0:
                    doff = md >> 10

                    def chunk(c, gg, _m=m, _d=doff, _w0=w0):
                        # one dynamic 8-row window load per chunk (per-pass
                        # dynamic row reads stall ~20 cycles; see f32 twin)
                        g_h, g_l = gg
                        W8h = xh_ref[pl.ds(_w0 + c * 8, 8), :]
                        W8l = xl_ref[pl.ds(_w0 + c * 8, 8), :]
                        for v8 in range(8):
                            Wh = jnp.broadcast_to(W8h[v8 : v8 + 1],
                                                  (SUBLANES, LANES))
                            Wl = jnp.broadcast_to(W8l[v8 : v8 + 1],
                                                  (SUBLANES, LANES))
                            mask = _d == c * 8 + v8
                            g_h = g_h + jnp.where(
                                mask, jnp.take_along_axis(Wh, _m, axis=1), 0)
                            g_l = g_l + jnp.where(
                                mask, jnp.take_along_axis(Wl, _m, axis=1), 0)
                        return g_h, g_l

                    vc = w0_ref[_g, t * 2 + 1]  # multiple of 8 (0 = empty)
                    g_h, g_l = jax.lax.fori_loop(0, vc // 8, chunk, (zero, zero))
                else:
                    assert V % 8 == 0, "static sg spans must be multiples of 8"
                    doff = md >> 10
                    g_h, g_l = zero, zero
                    for c in range(V // 8):
                        W8h = xh_ref[pl.ds(w0 + c * 8, 8), :]
                        W8l = xl_ref[pl.ds(w0 + c * 8, 8), :]
                        for v8 in range(8):
                            Wh = jnp.broadcast_to(W8h[v8 : v8 + 1],
                                                  (SUBLANES, LANES))
                            Wl = jnp.broadcast_to(W8l[v8 : v8 + 1],
                                                  (SUBLANES, LANES))
                            mask = doff == c * 8 + v8
                            g_h = g_h + jnp.where(
                                mask, jnp.take_along_axis(Wh, m, axis=1), 0)
                            g_l = g_l + jnp.where(
                                mask, jnp.take_along_axis(Wl, m, axis=1), 0)
                return _dd_chunk_accumulate(acc_h, acc_l, vh, vl, g_h, g_l)

            zero = jnp.zeros((SUBLANES, LANES), jnp.float32)
            # resident mode rolls the group loop: g_per doesn't multiply the
            # compile budget; wide-Tq bins bound the rolled tile loop by the
            # group's real tile count (see the f32 twin)
            mult = 1 if resident else g_per
            unroll = 1 if interpret else (
                T if (T <= 16 and mult * T * max(V, 1) <= 160) else 1)
            bound = cnt_ref[g] if (unroll == 1 and T > 8) else T
            return jax.lax.fori_loop(
                0, bound, tile_body, (zero, zero), unroll=unroll)

        if resident:
            @pl.when(step == 0)
            def _():
                yh_ref[:] = yinh_ref[:]  # seed: see f32 twin resident note
                yl_ref[:] = yinl_ref[:]

            def gbody(gi, _):
                g = step * g_per + gi
                acc_h, acc_l = group_acc(g, gi * TB)
                gid = gid_ref[g]

                @pl.when(gid >= 0)
                def _():
                    r = pl.multiple_of(gid * SUBLANES, SUBLANES)
                    if accumulate:
                        oh, ol = dd_add_dd(yh_ref[pl.ds(r, SUBLANES), :],
                                           yl_ref[pl.ds(r, SUBLANES), :],
                                           acc_h, acc_l)
                    else:
                        oh, ol = acc_h, acc_l
                    yh_ref[pl.ds(r, SUBLANES), :] = oh
                    yl_ref[pl.ds(r, SUBLANES), :] = ol
                return 0

            jax.lax.fori_loop(0, g_per, gbody, 0)
            return

        outs_h, outs_l = [], []
        for gi in range(g_per):
            acc_h, acc_l = group_acc(step * g_per + gi, gi * TB)
            outs_h.append(acc_h)
            outs_l.append(acc_l)
        oh = outs_h[0] if g_per == 1 else jnp.concatenate(outs_h, axis=0)
        ol = outs_l[0] if g_per == 1 else jnp.concatenate(outs_l, axis=0)
        if accumulate:
            oh, ol = dd_add_dd(yinh_ref[:], yinl_ref[:], oh, ol)
        yh_ref[:] = oh
        yl_ref[:] = ol

    return kernel


def _bin_call_dd(bin_, xh_tab, xl_tab, yh, yl, num_groups: int, interpret: bool,
                 accumulate: bool = False):
    from .pallas_sell import _pick_g_per

    ng, K = bin_.n_groups, bin_.k
    # resident-y mode (device_put_sell_dd pads group lists with gid=-1 via
    # _resident_pad): both y planes stay whole-buffer VMEM windows and the
    # kernels predicate padding groups' writes off — same wiring as the f32
    # twin's _bin_call (a revolving out_map with gid=-1 would clobber a real
    # group's tile with zeros)
    resident = int(getattr(bin_, "resident_g_per", 0) or 0)
    packed = bool(getattr(bin_, "ja_packed", False))
    if resident > 1:
        g_per = resident
    else:
        # JA i32 (1B wl-packed / 2B sb-i16) + AS hi/lo f32
        ja_b = 1 if packed else bin_.ja.dtype.itemsize
        g_per = _pick_g_per(bin_, bytes_per_entry=8 + ja_b)
    KB = K * SUBLANES * g_per
    KBJ = (-(-(K * SUBLANES // 8) // 4) * 8 * g_per) if packed else KB
    R = xh_tab.shape[0]

    if resident > 1:
        yrows = yh.shape[0]
        out_map_spec = pl.BlockSpec((yrows, LANES), lambda g, *r: (0, 0),
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
        num_scalar_prefetch=3,
        grid=(ng // g_per,),
        in_specs=[
            pl.BlockSpec((R, LANES), lambda g, *r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda g, *r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KBJ, LANES), lambda g, *r: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, LANES), lambda g, *r: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, LANES), lambda g, *r: (g, 0), memory_space=pltpu.VMEM),
            out_map_spec,
            out_map_spec,
        ],
        out_specs=(out_map_spec, out_map_spec),
    )

    if bin_.layout == "sb-major":
        kernel = _kernel_sb_major_dd(K, bin_.span, interpret, g_per, bin_.chunk_k,
                                     accumulate,
                                     idx16=bin_.ja.dtype == jnp.int16)
    elif bin_.layout == "sb-list":
        kernel = _kernel_sb_list_dd(K, bin_.span, interpret, g_per, bin_.chunk_k,
                                    accumulate,
                                    idx16=bin_.ja.dtype == jnp.int16)
    elif bin_.layout == "wl":
        kernel = _kernel_wl_dd(K, bin_.span, bin_.chunk_k, interpret, g_per,
                               accumulate, packed=packed)
    elif bin_.layout == "sg":
        kernel = _kernel_sg_dd(K, bin_.span, interpret, g_per, accumulate,
                               resident=resident > 1)
    else:
        kernel = _kernel_k_major_dd(K, interpret, g_per, accumulate,
                                    resident=resident > 1)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_groups * SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((num_groups * SUBLANES, LANES), jnp.float32),
        ),
        # inputs: 3 prefetch + xh,xl,ja,ah,al -> yinh at 8, yinl at 9
        input_output_aliases={8: 0, 9: 1},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(bin_.group_ids, bin_.slab_list, bin_.slab_count,
      xh_tab, xl_tab, bin_.ja, bin_.as_hi, bin_.as_lo, yh, yl)


@jax.tree_util.register_pytree_node_class
@dataclass
class DevicePanelSellDD:
    """Column-panelled dd SELL (x beyond the VMEM budget; see
    formats/sell.py PanelSellMatrix)."""

    nrows: int
    ncols: int
    nnz: int
    num_groups: int
    bounds: tuple
    panels: list  # list[DeviceSellDD]

    def tree_flatten(self):
        return (tuple(self.panels),), (
            self.nrows, self.ncols, self.nnz, self.num_groups, self.bounds,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, list(children[0]))


def device_put_panel_sell_dd(psell, device=None) -> DevicePanelSellDD:
    return DevicePanelSellDD(
        nrows=psell.nrows,
        ncols=psell.ncols,
        nnz=psell.nnz,
        num_groups=psell.num_groups,
        bounds=tuple(int(b) for b in psell.bounds),
        panels=[device_put_sell_dd(p, device=device) for p in psell.panels],
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def sell_spmv_pallas_dd(dsell, xh, xl, *, interpret: bool = False):
    """fp64-class SpMV; takes x split into (hi, lo) f32; returns (yh, yl).

    Combine with :func:`.doubledouble.combine_f64` (XLA-side, f64) for the
    final fp64 vector. Accepts DeviceSellDD or DevicePanelSellDD (column
    panels, dd-accumulated across panels).
    """
    yh = None
    if isinstance(dsell, DevicePanelSellDD):
        yg = max([dsell.num_groups]
                 + [getattr(p, "y_groups", 0) or p.num_groups
                    for p in dsell.panels])
        yh = jnp.zeros((yg * SUBLANES, LANES), jnp.float32)
        yl = jnp.zeros_like(yh)
        for p, panel in enumerate(dsell.panels):
            c0, c1 = dsell.bounds[p], dsell.bounds[p + 1]
            xh_tab = pack_x_table(xh[c0:c1], c1 - c0)
            xl_tab = pack_x_table(xl[c0:c1], c1 - c0)
            for bin_ in panel.bins:
                yh, yl = _bin_call_dd(bin_, xh_tab, xl_tab, yh, yl,
                                      yg, interpret,
                                      accumulate=True)
        return yh.reshape(-1)[: dsell.nrows], yl.reshape(-1)[: dsell.nrows]
    # 2-D inputs = already packed (Rp, 128) tables (pallas_sell.device_put_x)
    xh_tab = xh if xh.ndim == 2 else pack_x_table(xh, dsell.ncols)
    xl_tab = xl if xl.ndim == 2 else pack_x_table(xl, dsell.ncols)
    yg = dsell.y_groups or dsell.num_groups
    yh = jnp.zeros((yg * SUBLANES, LANES), jnp.float32)
    yl = jnp.zeros_like(yh)
    # like the f32 twin's assembly="auto": add_into bins (sg far remainders)
    # write PRIVATE zero buffers and combine with an exact dd two-sum at the
    # end — accumulating into a resident whole-y window re-DMAs ~8 MB per
    # grid step (read-modify-write; probes/sg_bins_road2.out)
    for bin_ in dsell.bins:
        if not bin_.add_into:
            yh, yl = _bin_call_dd(bin_, xh_tab, xl_tab, yh, yl,
                                  yg, interpret)
    for bin_ in dsell.bins:
        if bin_.add_into:
            fh = jnp.zeros_like(yh)
            fl = jnp.zeros_like(yl)
            fh, fl = _bin_call_dd(bin_, xh_tab, xl_tab, fh, fl,
                                  yg, interpret)
            yh, yl = dd_add_dd(yh, yl, fh, fl)
    return yh.reshape(-1)[: dsell.nrows], yl.reshape(-1)[: dsell.nrows]


def sell_spmv_dd_f64(dsell: DeviceSellDD, x64, *, interpret: bool = False):
    """Convenience wrapper: fp64 in, fp64 out (split/combine in XLA)."""
    xh = jnp.asarray(x64, jnp.float32)
    xl = (x64 - xh.astype(x64.dtype)).astype(jnp.float32)
    yh, yl = sell_spmv_pallas_dd(dsell, xh, xl, interpret=interpret)
    return yh.astype(x64.dtype) + yl.astype(x64.dtype)
