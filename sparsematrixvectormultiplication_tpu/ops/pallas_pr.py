"""PR (permutation-routed) SpMV Pallas kernel — the zero-locality engine.

One ``pallas_call`` executes the three PR phases (formats/pr.py):

1. **Gather** (grid-streamed): source tiles are column-slab-sorted with one
   slab per row, so each (8,128) tile reads one ``win``-row x window
   (8-aligned dynamic start) and serves all 1024 entries with ``win``
   broadcast+lane-gather passes; tiles whose window exceeds ``win`` take
   the per-row dynamic-load path (rare). Products land in a VMEM-resident
   ``(n_rows, 128)`` scratch in column order. Total slab traffic ~R +
   n_tiles window loads for the WHOLE matrix — this is what removes the
   per-(row-group, slab) "diffuse floor" (docs/DESIGN.md round-3).
2. **Route** (last grid step): 2*log2(n_rows)-1 Beneš exchange stages
   over the resident products — per stage, the xor-partner array (block
   swap or paired rolls, see _benes_partner) masked-selected by swap bits
   streamed as ONE bit-packed int32 plane — then one ``take_along_axis``
   delivers every product to its destination lane.
3. **Reduce**: the routed array IS a sigma-sorted k-major SELL slot
   buffer; per K-bin masked sublane k-sums write y (sigma row order, like
   the sigma SELL stages; callers unpermute at validation).

Replaces the reference's CUDA thread-per-row/warp kernels on scattered
matrices (cuda_src/csr_matrix_cuda.cu:122-196) where the GPU's native
per-lane gather has no direct TPU analogue.
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
from .pallas_sell import _MAX_UPLOAD_BYTES, pack_x_table

__all__ = ["DevicePR", "DevicePanelPR", "device_put_pr", "pr_spmv_pallas"]

_UNROLL_K = 16          # static reduce unroll bound (k-major convention)


@jax.tree_util.register_pytree_node_class
@dataclass
class DevicePR:
    nrows: int
    ncols: int
    nnz: int
    n_rows: int
    win: int
    y_rows: int
    bins: tuple              # ((K, G, dest_row_off, g0), ...) static
    val: jax.Array           # (n_rows, 128) dtype
    md: jax.Array            # (n_rows, 128) int32
    masks: jax.Array         # (n_rows, 128) int32 Beneš bitplanes
    final_lane: jax.Array    # (n_rows, 128) int32
    tile_base: jax.Array     # (n_rows//8,) int32
    tile_far: jax.Array      # (n_rows//8,) int32
    row_slab: jax.Array      # (n_rows,) int32

    def tree_flatten(self):
        return (
            (self.val, self.md, self.masks, self.final_lane,
             self.tile_base, self.tile_far, self.row_slab),
            (self.nrows, self.ncols, self.nnz, self.n_rows, self.win,
             self.y_rows, self.bins),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    def spmv(self, x):
        return pr_spmv_pallas(self, x)


@jax.tree_util.register_pytree_node_class
@dataclass
class DevicePanelPR:
    """Row-slice panels (formats/pr.py PanelPRMatrix); y = concat of the
    panels' sigma-order outputs."""

    nrows: int
    ncols: int
    nnz: int
    panels: tuple

    def tree_flatten(self):
        return (self.panels,), (self.nrows, self.ncols, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, children[0])

    def spmv(self, x):
        return pr_spmv_pallas(self, x)


def device_put_pr(pr, dtype=jnp.float32, device=None):
    """Upload a host PRMatrix / PanelPRMatrix (guards the tunneled
    worker's upload crash threshold like device_put_sell)."""
    if isinstance(pr, PanelPRMatrix):
        return DevicePanelPR(
            nrows=pr.nrows, ncols=pr.ncols, nnz=pr.nnz,
            panels=tuple(device_put_pr(p, dtype=dtype, device=device)
                         for p in pr.panels))
    # md is stored int32 by PRMatrix.from_csr and uploads at full size
    total = (pr.val.size * jnp.dtype(dtype).itemsize
             + pr.md.nbytes + pr.masks.nbytes + pr.final_lane.nbytes)
    if total > _MAX_UPLOAD_BYTES:
        raise MemoryError(
            f"PR device arrays {total/2**20:.0f} MiB > "
            f"{_MAX_UPLOAD_BYTES/2**20:.0f} MiB")
    put = lambda a, dt: jax.device_put(jnp.asarray(a, dt), device)
    return DevicePR(
        nrows=pr.nrows, ncols=pr.ncols, nnz=pr.nnz, n_rows=pr.n_rows,
        win=pr.win, y_rows=pr.y_rows, bins=tuple(pr.bins),
        val=put(pr.val, dtype), md=put(pr.md, jnp.int32),
        masks=put(pr.masks, jnp.int32),
        final_lane=put(pr.final_lane, jnp.int32),
        tile_base=put(pr.tile_base, jnp.int32),
        tile_far=put(pr.tile_far, jnp.int32),
        row_slab=put(pr.row_slab, jnp.int32),
    )


def _benes_partner(a, d: int, n_rows: int, impl: str):
    """The xor-partner array: partner[i] = a[i ^ d] along axis 0.

    ``impl="swap"`` (d a multiple of 8): reshape the sublane axis into
    (pairs, 2, d) blocks and swap the middle axis — ONE block copy.
    ``impl="roll"``: two circular rolls selected by the position's d-bit
    parity (crosses tile boundaries for any d; the fallback for d < 8).
    """
    if impl == "swap" and d % SUBLANES == 0:
        v = a.reshape(n_rows // (2 * d), 2, d, LANES)
        sw = jnp.concatenate([v[:, 1:2], v[:, 0:1]], axis=1)
        return sw.reshape(n_rows, LANES)
    hi = pltpu.roll(a, n_rows - d, axis=0)   # hi[i] = a[i + d]
    lo = pltpu.roll(a, d, axis=0)            # lo[i] = a[i - d]
    rowpar = jax.lax.broadcasted_iota(jnp.int32, (n_rows, LANES), 0)
    return jnp.where((rowpar & d) == 0, hi, lo)


def _kernel_pr(n_rows: int, win: int, bins: tuple, TB: int, n_blocks: int,
               stages: tuple, phases: str = "all", stage_impl: str = "roll"):
    """See module docstring. TB = tiles per grid step. ``phases`` trims the
    kernel for phase-cost probes: "gather" stops after products, "route"
    adds the Beneš stages + lane gather, "all" (default) adds the
    reduction. Trimmed variants write whatever the spare scratch holds —
    NOT a valid SpMV, probe timing only. ``stage_impl`` picks the
    exchange-stage partner computation (see _benes_partner)."""

    def kernel(base_ref, far_ref, rslab_ref, x_ref, val_ref, md_ref,
               mask_ref, fl_ref, y_ref, p_ref, q_ref):
        step = pl.program_id(0)
        dtype = val_ref.dtype

        # ---- phase 1: gather this block's tiles into the resident products
        def tile_body(t, _):
            gt = step * TB + t
            loc = t * SUBLANES
            md = md_ref[pl.ds(loc, SUBLANES), :]
            vals = val_ref[pl.ds(loc, SUBLANES), :]
            m = md & (LANES - 1)
            dv = md >> 7
            prow = gt * SUBLANES

            def near(width):
                # shared window: `width` broadcast+lane-gather passes serve
                # the whole tile
                base = pl.multiple_of(base_ref[gt], SUBLANES)
                chunk = x_ref[pl.ds(base, width), :]
                gath = jnp.zeros((SUBLANES, LANES), dtype)
                for v in range(width):  # static unroll
                    xb = jnp.broadcast_to(chunk[v, :][None, :],
                                          (SUBLANES, LANES))
                    gat = jnp.take_along_axis(xb, m, axis=1)
                    gath = gath + jnp.where(dv == v, gat, 0)
                p_ref[pl.ds(prow, SUBLANES), :] = vals * gath

            # tile class 0: tight 8-row window (the common case);
            # class 1: full win-row window; class 2: per-row dynamic reads
            @pl.when(far_ref[gt] == 0)
            def _():
                near(SUBLANES)

            if win > SUBLANES:
                @pl.when(far_ref[gt] == 1)
                def _():
                    near(win)

            @pl.when(far_ref[gt] == 2)
            def _():
                W = jnp.stack(
                    [x_ref[rslab_ref[gt * SUBLANES + i], :]
                     for i in range(SUBLANES)])
                gath = jnp.take_along_axis(W, m, axis=1)
                p_ref[pl.ds(prow, SUBLANES), :] = vals * gath

            return 0

        jax.lax.fori_loop(0, TB, tile_body, 0, unroll=1)

        # ---- phases 2+3 at the last step (products complete)
        @pl.when(step == n_blocks - 1)
        def _():
            if phases == "gather":  # probe: flush products, skip route
                y_ref[:] = p_ref[pl.ds(0, y_ref.shape[0]), :]
                return
            src, dst = p_ref, q_ref
            for s, d in enumerate(stages):  # static Beneš schedule
                a = src[:]
                partner = _benes_partner(a, d, n_rows, stage_impl)
                swap = ((mask_ref[:] >> s) & 1) == 1
                dst[:] = jnp.where(swap, partner, a)
                src, dst = dst, src
            # final per-row lane gather into the spare scratch
            dst[:] = jnp.take_along_axis(src[:], fl_ref[:], axis=1)
            red = dst
            if phases == "route":  # probe: skip the reduction
                y_ref[:] = red[pl.ds(0, y_ref.shape[0]), :]
                return
            # reduce: k-major slot sums per bin
            for (K, G, off, g0) in bins:  # static bin list
                def gbody(gg, _, _K=K, _off=off, _g0=g0):
                    b = _off + gg * _K * SUBLANES
                    if _K <= _UNROLL_K:
                        # pairwise tree: ~log K error growth (f32 headroom)
                        parts = [red[pl.ds(b + kk * SUBLANES, SUBLANES), :]
                                 for kk in range(_K)]
                        while len(parts) > 1:
                            parts = [parts[i] + parts[i + 1]
                                     if i + 1 < len(parts) else parts[i]
                                     for i in range(0, len(parts), 2)]
                        acc = parts[0]
                    else:
                        def kbody(kk, a2, _b=b):
                            return a2 + red[pl.ds(_b + kk * SUBLANES,
                                                  SUBLANES), :]
                        acc = jax.lax.fori_loop(
                            1, _K, kbody, red[pl.ds(b, SUBLANES), :])
                    y_ref[pl.ds((_g0 + gg) * SUBLANES, SUBLANES), :] = acc
                    return 0

                jax.lax.fori_loop(0, G, gbody, 0, unroll=1)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("interpret", "phases", "stage_impl",
                                    "crop"))
def pr_spmv_pallas(dpr, x, *, interpret: bool = False, phases: str = "all",
                   stage_impl: str = "roll", crop: bool = True):
    """SpMV over the PR layout. Returns y[:nrows] in SIGMA row order (like
    the sigma SELL stages — callers unpermute with the host matrix's
    ``unpermute`` / ``row_perm``). Panel inputs concatenate their panels'
    sigma outputs (matching PanelPRMatrix.row_perm). ``phases`` != "all"
    trims the kernel for phase-cost probes (output NOT a valid SpMV)."""
    x_tab = x if x.ndim == 2 else pack_x_table(x, dpr.ncols)
    if isinstance(dpr, DevicePanelPR):
        return jnp.concatenate(
            [pr_spmv_pallas(p, x_tab, interpret=interpret, phases=phases,
                            stage_impl=stage_impl)
             for p in dpr.panels])
    R = x_tab.shape[0]
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
        num_scalar_prefetch=3,  # tile_base, tile_far, row_slab
        grid=(n_blocks,),
        in_specs=[
            whole(R),            # x table
            block,               # val
            block,               # md
            whole(n_rows),       # masks
            whole(n_rows),       # final_lane
        ],
        out_specs=whole(dpr.y_rows),
        scratch_shapes=[
            pltpu.VMEM((n_rows, LANES), x_tab.dtype),
            pltpu.VMEM((n_rows, LANES), x_tab.dtype),
        ],
    )
    kernel = _kernel_pr(n_rows, dpr.win, dpr.bins, TB, n_blocks, stages,
                        phases=phases, stage_impl=stage_impl)
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((dpr.y_rows, LANES), x_tab.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(dpr.tile_base, dpr.tile_far, dpr.row_slab,
      x_tab, dpr.val, dpr.md, dpr.masks, dpr.final_lane)
    # crop=False: full kernel y for force_ladder panels, whose real rows
    # sit at non-contiguous positions (indexed host-side via y_pos) — and
    # whose shard_map stacking needs one uniform length (spmd_pr.py)
    return y.reshape(-1)[: dpr.nrows] if crop else y.reshape(-1)
