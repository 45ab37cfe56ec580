"""Double-double PR SpMV — fp64-class results on zero-locality matrices.

The dd twin of ops/pallas_pr.py (see that module + formats/pr.py): the
gather phase forms each product as an error-free two_prod pair, BOTH
planes ride the same Beneš exchange network (the routing is positional —
identical masks), and the reduction chains dd_add_dd over the k-major
slots (rolled ref-slice loops, which both Mosaic and the interpret-mode
XLA CPU jit preserve — docs/DESIGN.md EFT folding note).

fp64 parity target: the reference's CUDA fp64 kernels
(cuda_src/csr_matrix_cuda.cu:122-196) on webbase-1M-class matrices, where
the dd broadcast kernels sit at the diffuse floor (0.016 GFLOPS r2).

Capacity: dd holds four (n_rows,128) scratch planes, so panels target
n_rows <= 2^14 (formats/pr.py pr_from_csr(target_rows=...)).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.pr import PanelPRMatrix, PRMatrix
from ..formats.pr_route import benes_stage_distances
from ..formats.sell import LANES, SUBLANES
from .doubledouble import dd_add_dd, split_f64, two_prod
from .pallas_sell import _MAX_UPLOAD_BYTES, pack_x_table

__all__ = ["DevicePRDD", "DevicePanelPRDD", "device_put_pr_dd",
           "pr_spmv_pallas_dd", "DD_PANEL_TARGET_ROWS"]

DD_PANEL_TARGET_ROWS = 1 << 14   # four scratch planes -> half the f32 cap


@jax.tree_util.register_pytree_node_class
@dataclass
class DevicePRDD:
    nrows: int
    ncols: int
    nnz: int
    n_rows: int
    win: int
    y_rows: int
    bins: tuple
    val_h: jax.Array
    val_l: jax.Array
    md: jax.Array
    masks: jax.Array
    final_lane: jax.Array
    tile_base: jax.Array
    tile_far: jax.Array
    row_slab: jax.Array

    def tree_flatten(self):
        return (
            (self.val_h, self.val_l, self.md, self.masks, self.final_lane,
             self.tile_base, self.tile_far, self.row_slab),
            (self.nrows, self.ncols, self.nnz, self.n_rows, self.win,
             self.y_rows, self.bins),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)


@jax.tree_util.register_pytree_node_class
@dataclass
class DevicePanelPRDD:
    nrows: int
    ncols: int
    nnz: int
    panels: tuple

    def tree_flatten(self):
        return (self.panels,), (self.nrows, self.ncols, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, children[0])


def device_put_pr_dd(pr, device=None):
    if isinstance(pr, PanelPRMatrix):
        return DevicePanelPRDD(
            nrows=pr.nrows, ncols=pr.ncols, nnz=pr.nnz,
            panels=tuple(device_put_pr_dd(p, device=device)
                         for p in pr.panels))
    vh, vl = split_f64(pr.val)
    total = vh.nbytes * 2 + pr.md.nbytes + pr.masks.nbytes + pr.final_lane.nbytes
    if total > _MAX_UPLOAD_BYTES:
        raise MemoryError(
            f"PR-dd device arrays {total/2**20:.0f} MiB > "
            f"{_MAX_UPLOAD_BYTES/2**20:.0f} MiB")
    put = lambda a, dt: jax.device_put(jnp.asarray(a, dt), device)
    return DevicePRDD(
        nrows=pr.nrows, ncols=pr.ncols, nnz=pr.nnz, n_rows=pr.n_rows,
        win=pr.win, y_rows=pr.y_rows, bins=tuple(pr.bins),
        val_h=put(vh, jnp.float32), val_l=put(vl, jnp.float32),
        md=put(pr.md, jnp.int32), masks=put(pr.masks, jnp.int32),
        final_lane=put(pr.final_lane, jnp.int32),
        tile_base=put(pr.tile_base, jnp.int32),
        tile_far=put(pr.tile_far, jnp.int32),
        row_slab=put(pr.row_slab, jnp.int32),
    )


def _kernel_pr_dd(n_rows: int, win: int, bins: tuple, TB: int,
                  n_blocks: int, stages: tuple):
    def kernel(base_ref, far_ref, rslab_ref, xh_ref, xl_ref, vh_ref, vl_ref,
               md_ref, mask_ref, fl_ref, yh_ref, yl_ref,
               ph_ref, pl_ref, qh_ref, ql_ref):
        step = pl.program_id(0)

        def dd_store(prow, vh, vl, g_h, g_l):
            # error-free product: (vh+vl)*(g_h+g_l) to dd precision
            ph, pe = two_prod(vh, g_h)
            plo = pe + (vh * g_l + vl * g_h)
            ph_ref[pl.ds(prow, SUBLANES), :] = ph
            pl_ref[pl.ds(prow, SUBLANES), :] = plo

        def tile_body(t, _):
            gt = step * TB + t
            loc = t * SUBLANES
            md = md_ref[pl.ds(loc, SUBLANES), :]
            vh = vh_ref[pl.ds(loc, SUBLANES), :]
            vl = vl_ref[pl.ds(loc, SUBLANES), :]
            m = md & (LANES - 1)
            dv = md >> 7
            prow = gt * SUBLANES

            def near(width):
                base = pl.multiple_of(base_ref[gt], SUBLANES)
                ch = xh_ref[pl.ds(base, width), :]
                cl = xl_ref[pl.ds(base, width), :]
                g_h = jnp.zeros((SUBLANES, LANES), jnp.float32)
                g_l = jnp.zeros((SUBLANES, LANES), jnp.float32)
                for v in range(width):
                    sel = dv == v
                    xbh = jnp.broadcast_to(ch[v, :][None, :], (SUBLANES, LANES))
                    xbl = jnp.broadcast_to(cl[v, :][None, :], (SUBLANES, LANES))
                    g_h = g_h + jnp.where(sel, jnp.take_along_axis(xbh, m, axis=1), 0)
                    g_l = g_l + jnp.where(sel, jnp.take_along_axis(xbl, m, axis=1), 0)
                dd_store(prow, vh, vl, g_h, g_l)

            # tile classes as in the f32 kernel: 8-row / win-row / far
            @pl.when(far_ref[gt] == 0)
            def _():
                near(SUBLANES)

            if win > SUBLANES:
                @pl.when(far_ref[gt] == 1)
                def _():
                    near(win)

            @pl.when(far_ref[gt] == 2)
            def _():
                Wh = jnp.stack([xh_ref[rslab_ref[gt * SUBLANES + i], :]
                                for i in range(SUBLANES)])
                Wl = jnp.stack([xl_ref[rslab_ref[gt * SUBLANES + i], :]
                                for i in range(SUBLANES)])
                dd_store(prow, vh, vl,
                         jnp.take_along_axis(Wh, m, axis=1),
                         jnp.take_along_axis(Wl, m, axis=1))

            return 0

        jax.lax.fori_loop(0, TB, tile_body, 0, unroll=1)

        @pl.when(step == n_blocks - 1)
        def _():
            src_h, src_l, dst_h, dst_l = ph_ref, pl_ref, qh_ref, ql_ref
            for s, d in enumerate(stages):
                rowpar = jax.lax.broadcasted_iota(jnp.int32, (n_rows, LANES), 0)
                take_hi = (rowpar & d) == 0
                swap = ((mask_ref[:] >> s) & 1) == 1
                for srcp, dstp in ((src_h, dst_h), (src_l, dst_l)):
                    a = srcp[:]
                    hi = pltpu.roll(a, n_rows - d, axis=0)
                    lo = pltpu.roll(a, d, axis=0)
                    dstp[:] = jnp.where(swap, jnp.where(take_hi, hi, lo), a)
                src_h, dst_h = dst_h, src_h
                src_l, dst_l = dst_l, src_l
            fl = fl_ref[:]
            dst_h[:] = jnp.take_along_axis(src_h[:], fl, axis=1)
            dst_l[:] = jnp.take_along_axis(src_l[:], fl, axis=1)
            red_h, red_l = dst_h, dst_l
            for (K, G, off, g0) in bins:
                def gbody(gg, _, _K=K, _off=off, _g0=g0):
                    b = _off + gg * _K * SUBLANES

                    def kbody(kk, carry, _b=b):
                        h, l = carry
                        return dd_add_dd(
                            h, l,
                            red_h[pl.ds(_b + kk * SUBLANES, SUBLANES), :],
                            red_l[pl.ds(_b + kk * SUBLANES, SUBLANES), :])

                    # rolled dd chain (EFT-preserving in Mosaic AND in the
                    # interpret-mode XLA CPU jit; never statically unrolled)
                    zero = jnp.zeros((SUBLANES, LANES), jnp.float32)
                    acc_h, acc_l = jax.lax.fori_loop(
                        0, _K, kbody, (zero, zero), unroll=1)
                    yh_ref[pl.ds((_g0 + gg) * SUBLANES, SUBLANES), :] = acc_h
                    yl_ref[pl.ds((_g0 + gg) * SUBLANES, SUBLANES), :] = acc_l
                    return 0

                jax.lax.fori_loop(0, G, gbody, 0, unroll=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def pr_spmv_pallas_dd(dpr, xh, xl, *, interpret: bool = False):
    """dd SpMV over the PR layout; returns (yh, yl) in SIGMA row order,
    each length nrows (combine in f64 off-device for full accuracy)."""
    xh_tab = xh if xh.ndim == 2 else pack_x_table(xh, dpr.ncols)
    xl_tab = xl if xl.ndim == 2 else pack_x_table(xl, dpr.ncols)
    if isinstance(dpr, DevicePanelPRDD):
        parts = [pr_spmv_pallas_dd(p, xh_tab, xl_tab, interpret=interpret)
                 for p in dpr.panels]
        return (jnp.concatenate([p[0] for p in parts]),
                jnp.concatenate([p[1] for p in parts]))
    R = xh_tab.shape[0]
    n_rows = dpr.n_rows
    n_tiles = n_rows // SUBLANES
    TB = min(64, n_tiles)
    n_blocks = n_tiles // TB
    BR = TB * SUBLANES
    stages = tuple(benes_stage_distances(n_rows))

    whole = lambda rows: pl.BlockSpec(
        (rows, LANES), lambda g, *refs: (0, 0), memory_space=pltpu.VMEM)
    block = pl.BlockSpec((BR, LANES), lambda g, *refs: (g, 0),
                         memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[whole(R), whole(R), block, block, block,
                  whole(n_rows), whole(n_rows)],
        out_specs=[whole(dpr.y_rows), whole(dpr.y_rows)],
        scratch_shapes=[pltpu.VMEM((n_rows, LANES), jnp.float32)
                        for _ in range(4)],
    )
    kernel = _kernel_pr_dd(n_rows, dpr.win, dpr.bins, TB, n_blocks, stages)
    yh, yl = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((dpr.y_rows, LANES), jnp.float32)
                   for _ in range(2)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(dpr.tile_base, dpr.tile_far, dpr.row_slab,
      xh_tab, xl_tab, dpr.val_h, dpr.val_l, dpr.md, dpr.masks,
      dpr.final_lane)
    return yh.reshape(-1)[: dpr.nrows], yl.reshape(-1)[: dpr.nrows]
