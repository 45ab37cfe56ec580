"""Multi-RHS SpMM over the SELL k-major layout: stream A once, serve R
right-hand sides.

``Y = A @ X`` with ``X`` of shape ``(N, R)``. The SpMV kernels
(ops/pallas_sell.py) are HBM-bandwidth-bound — the JA/AS entry streams
dominate and the VPU sits mostly idle (fem3d f32 measured ~642 GB/s at
~88 GF, RESULTS.md). This kernel loads each (K*8, 128) entry tile ONCE
and runs the gather/FMA pipeline ``R`` times against ``R`` VMEM-resident
x-tables, multiplying arithmetic intensity by ``R`` at unchanged HBM
traffic — the sparse analogue of blocking a GEMV into a GEMM, and the
fast path for block solvers (solvers/cg.py cg_multi: k systems per one
A stream).

Scope: k-major bins (the flagship layout class for the banded/FEM
matrices solvers run on). Other layouts raise — convert with
``SellMatrix.from_csr(csr, layout="k-major")``.

Reference parity: the reference has no SpMM at all (its CUDA/OpenMP
surface is single-vector SpMV, cuda_src/csr_matrix_cuda.cu); this is a
TPU-first extension alongside the BSR MXU path (ops/pallas_bsr.py),
covering matrices too scattered for dense 128x128 blocking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.sell import LANES, SUBLANES, slab_table_rows
from .pallas_sell import (
    _UNROLL_MAX,
    _X_TABLE_VMEM_BUDGET,
    DevicePanelSell,
    DeviceSell,
    _pick_g_per,
)

__all__ = ["pack_x_multi", "device_put_x_multi", "sell_spmm_pallas",
           "MAX_RHS"]

# static unroll of the RHS loop: each r re-runs the slab-gather pipeline,
# so the Mosaic compile budget bounds R (the VMEM x-table budget usually
# binds first anyway)
MAX_RHS = 32


def pack_x_multi(X, ncols: int):
    """Pack ``X (N, R)`` into the ``(R, Rp, 128)`` stacked slab tables.

    Layout matches :func:`ops.pallas_sell.pack_x_table` per RHS (sublane
    alignment plus the spare all-zero slab ``Rp-1``); the whole stack must
    fit the VMEM budget."""
    X = jnp.asarray(X)
    if X.ndim != 2:
        raise ValueError(f"X must be (N, R), got {X.shape}")
    n, r = X.shape
    if r > MAX_RHS:
        raise ValueError(f"R={r} > MAX_RHS={MAX_RHS}: tile the RHS block")
    Rp = slab_table_rows(ncols)  # one shared geometry invariant
    nbytes = r * Rp * LANES * X.dtype.itemsize
    if nbytes > _X_TABLE_VMEM_BUDGET:
        raise ValueError(
            f"stacked x tables ({nbytes/2**20:.0f} MiB for N={ncols}, R={r}) "
            f"exceed the VMEM budget ({_X_TABLE_VMEM_BUDGET/2**20:.0f} MiB); "
            "reduce R or column-panel the matrix")
    pad = Rp * LANES - n
    if pad:
        X = jnp.concatenate([X, jnp.zeros((pad, r), X.dtype)], axis=0)
    return X.T.reshape(r, Rp, LANES)


def device_put_x_multi(X, ncols: int, dtype=jnp.float32, device=None):
    """Upload ``X (N, R)`` pre-packed as stacked slab tables (host-side
    pack: in-jit relayouts are ~10 GB/s on this hardware, docs/DESIGN.md)."""
    X = np.asarray(X, np.dtype(jnp.dtype(dtype).name))
    tab = np.asarray(pack_x_multi(X, ncols))
    return jax.device_put(jnp.asarray(tab, dtype), device)


def _kernel_k_major_spmm(k: int, R: int, g_per: int = 1,
                         accumulate: bool = False):
    KB = k * SUBLANES

    def kernel(gid_ref, slab_ref, cnt_ref, x_ref, ja_ref, as_ref, yin_ref,
               y_ref):
        step = pl.program_id(0)
        dtype = x_ref.dtype

        for gi in range(g_per):  # static: groups per grid step
            g = step * g_per + gi
            base = gi * KB
            ja = ja_ref[pl.ds(base, KB), :]
            q = ja >> 7              # // 128
            m = ja & (LANES - 1)     # % 128
            nslab = cnt_ref[g]
            # ONE entry-tile load serves all R right-hand sides
            vals = as_ref[pl.ds(base, KB), :].astype(dtype)

            for r in range(R):  # static RHS unroll
                def body(c, acc, _m=m, _q=q, _g=g, _r=r):
                    for s8 in range(8):  # chunked rolled loop (k-major twin)
                        sq = slab_ref[_g, c * 8 + s8]
                        xrow = x_ref[_r, sq, :]
                        xb = jnp.broadcast_to(xrow[None, :], (KB, LANES))
                        gat = jnp.take_along_axis(xb, _m, axis=1)
                        acc = acc + jnp.where(_q == sq, gat, 0)
                    return acc

                gath = jax.lax.fori_loop(
                    0, (nslab + 7) // 8, body, jnp.zeros((KB, LANES), dtype)
                )
                acc = vals * gath
                if k <= _UNROLL_MAX:
                    # pairwise-tree reduction (error growth ~log K)
                    parts = [acc[kk * SUBLANES:(kk + 1) * SUBLANES, :]
                             for kk in range(k)]
                    while len(parts) > 1:
                        parts = [parts[i] + parts[i + 1]
                                 if i + 1 < len(parts) else parts[i]
                                 for i in range(0, len(parts), 2)]
                    red = parts[0]
                else:
                    # rolled reduction through a scratch ref (Mosaic has no
                    # dynamic_slice on arrays; refs support pl.ds)
                    def scoped_red(scratch, _acc=acc):
                        scratch[:] = _acc

                        def red_body(kk, rr):
                            return rr + scratch[pl.ds(kk * SUBLANES,
                                                      SUBLANES), :]

                        return jax.lax.fori_loop(1, k, red_body,
                                                 scratch[0:SUBLANES, :])

                    red = pl.run_scoped(
                        scoped_red, pltpu.VMEM((KB, LANES), acc.dtype)
                    )
                sl = pl.ds(gi * SUBLANES, SUBLANES)
                if accumulate:
                    y_ref[r, sl, :] = yin_ref[r, sl, :] + red
                else:
                    y_ref[r, sl, :] = red

    return kernel


def _kernel_wl_spmm(k: int, L: int, NW: int, R: int, g_per: int = 1,
                    accumulate: bool = False):
    """wl (window-layered) SpMM twin: per window, the R per-RHS W tables
    are built once (8 scalar-prefetch-driven x reads each — one (8,128)
    vreg per RHS), then every layer tile's m/vals load is amortized over
    R gathers/FMAs. Data layout identical to _kernel_wl
    (ops/pallas_sell.py): ja stores lane offsets directly."""
    assert k == 8 * NW * L

    def kernel(gid_ref, slabs_ref, cnt_ref, x_ref, ja_ref, as_ref, yin_ref,
               y_ref):
        step = pl.program_id(0)
        dtype = x_ref.dtype
        for gi in range(g_per):
            g = step * g_per + gi
            gbase = gi * k * SUBLANES
            rows = [[] for _ in range(R)]  # per-RHS output rows (8 per group)
            for rb in range(SUBLANES):
                accs = [jnp.zeros((8, LANES), dtype) for _ in range(R)]
                for w in range(NW):
                    sbase = (rb * NW + w) * 8
                    Ws = [
                        jnp.stack([x_ref[r, slabs_ref[g, sbase + s], :]
                                   for s in range(8)])
                        for r in range(R)
                    ]
                    for l in range(L):
                        t = (rb * NW + w) * L + l
                        off = pl.multiple_of(gbase + t * 8, 8)
                        m = ja_ref[pl.ds(off, 8), :]
                        vals = as_ref[pl.ds(off, 8), :].astype(dtype)
                        for r in range(R):
                            accs[r] = accs[r] + vals * jnp.take_along_axis(
                                Ws[r], m, axis=1)
                for r in range(R):
                    rows[r].append(jnp.sum(accs[r], axis=0))
            sl = pl.ds(gi * SUBLANES, SUBLANES)
            for r in range(R):
                red = jnp.stack(rows[r])
                if accumulate:
                    y_ref[r, sl, :] = yin_ref[r, sl, :] + red
                else:
                    y_ref[r, sl, :] = red

    return kernel


_SPMM_LAYOUTS = ("k-major", "wl")


def _bin_call_spmm(bin_, x_tabs, y, num_groups: int, interpret: bool,
                   accumulate: bool = False):
    """One pallas_call for one k-major or wl bin over R stacked x-tables."""
    if bin_.layout not in _SPMM_LAYOUTS:
        raise NotImplementedError(
            f"sell_spmm_pallas serves {_SPMM_LAYOUTS} bins only (got "
            f"{bin_.layout!r}); convert with layout='k-major'")
    if int(getattr(bin_, "resident_g_per", 0) or 0) > 1:
        # resident-padded bins carry gid=-1 sentinel groups that only the
        # resident SpMV kernels predicate off — running them here would
        # write tiles through output block index -1 (silent corruption)
        raise NotImplementedError(
            "this DeviceSell was uploaded with resident-y padding; build "
            "the SpMM container with device_put_sell(..., resident=False)")
    ng, K = bin_.n_groups, bin_.k
    R = x_tabs.shape[0]
    g_per = _pick_g_per(bin_, bytes_per_entry=4 + bin_.as_.dtype.itemsize)
    KB = K * SUBLANES * g_per
    Rp = x_tabs.shape[1]

    if g_per == 1:
        out_map = lambda g, refs0, refs1, refs2: (0, refs0[g], 0)
    else:
        out_map = lambda g, refs0, refs1, refs2: (0, refs0[g * g_per] // g_per, 0)
    out_spec = pl.BlockSpec((R, SUBLANES * g_per, LANES), out_map,
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # group_ids, slab_list, slab_count
        grid=(ng // g_per,),
        in_specs=[
            pl.BlockSpec((R, Rp, LANES), lambda g, *refs: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, LANES), lambda g, *refs: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, LANES), lambda g, *refs: (g, 0),
                         memory_space=pltpu.VMEM),
            out_spec,  # aliased yin
        ],
        out_specs=out_spec,
    )
    if bin_.layout == "wl":
        kernel = _kernel_wl_spmm(K, bin_.span, bin_.chunk_k, R, g_per,
                                 accumulate)
    else:
        kernel = _kernel_k_major_spmm(K, R, g_per, accumulate)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, num_groups * SUBLANES, LANES),
                                       x_tabs.dtype),
        input_output_aliases={6: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(bin_.group_ids, bin_.slab_list, bin_.slab_count, x_tabs,
      bin_.ja, bin_.as_, y)


def _panel_spmm(dps: DevicePanelSell, X, interpret: bool):
    """Column-panel SpMM: X beyond the stacked-table VMEM budget. Each
    panel's R tables are packed in-jit from the raw ``(N, R)`` X (a
    relayout per panel — the documented large-N tradeoff; panels must be
    built with ``max_panel_cols <= max_x_table_cols(dtype) // R``)."""
    R = X.shape[1]
    y = jnp.zeros((R, dps.num_groups * SUBLANES, LANES), dtype=X.dtype)
    for p, dsell in enumerate(dps.panels):
        c0, c1 = dps.bounds[p], dps.bounds[p + 1]
        x_tabs = pack_x_multi(X[c0:c1], c1 - c0)
        for bin_ in dsell.bins:
            # always accumulate: panels may write the same group tiles
            y = _bin_call_spmm(bin_, x_tabs, y, dps.num_groups, interpret,
                               accumulate=True)
    return y.reshape(R, -1)[:, : dps.nrows].T


@functools.partial(jax.jit, static_argnames=("interpret",))
def sell_spmm_pallas(dsell, X, *, interpret: bool = False):
    """``Y = A @ X`` over k-major/wl SELL bins; returns ``(nrows, R)``.

    ``dsell``: a :class:`DeviceSell` (``device_put_sell(...,
    resident=False)``) or a :class:`DevicePanelSell` for N beyond the
    stacked-table VMEM budget.

    ``X``: either the raw ``(N, R)`` matrix or (non-panel only) the
    pre-packed ``(R, Rp, 128)`` stacked tables from
    :func:`device_put_x_multi` (preferred — host-side pack avoids the
    in-jit relayout)."""
    if isinstance(dsell, DevicePanelSell):
        if X.ndim != 2:
            raise ValueError("panel SpMM needs the raw (N, R) X "
                             "(tables are packed per panel)")
        return _panel_spmm(dsell, X, interpret)
    x_tabs = X if X.ndim == 3 else pack_x_multi(X, dsell.ncols)
    R = x_tabs.shape[0]
    y = jnp.zeros((R, dsell.num_groups * SUBLANES, LANES),
                  dtype=x_tabs.dtype)
    for bin_ in dsell.bins:
        y = _bin_call_spmm(bin_, x_tabs, y, dsell.num_groups, interpret,
                           accumulate=bin_.add_into)
    return y.reshape(R, -1)[:, : dsell.nrows].T
