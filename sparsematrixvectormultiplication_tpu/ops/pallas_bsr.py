"""Pallas MXU kernel for block-sparse SpMM: ``Y = A @ X``, A in BSR form.

The reference framework stops at SpMV (one RHS; cuda_src/*.cu kernels all
take a single ``x``). SpMV can never feed the MXU — there is no matmul in
it. With a dense block of ``B`` right-hand sides the same sparse operand
becomes a chain of (128,128) x (128,B) matmuls, one per stored block:

    grid = (n_block_rows, kb); at step (g, j) the kernel
      - DMAs A's dense block (g, j) into VMEM            (BlockSpec over A)
      - DMAs X's 128-row slab ``block_cols[g*kb+j]``     (scalar-prefetch
        driven index_map — the only "gather", done by DMA at slab width)
      - issues one MXU matmul, accumulating into Y's (128, B) block, which
        stays resident in VMEM across the kb steps (revisited output).

No per-element gathers anywhere: the irregularity is absorbed into the
block-column table read at DMA-descriptor time. f32 in / f32 accumulate,
or bf16 in / f32 accumulate (the MXU's native mode).

Design notes (docs/DESIGN.md): device data enters as jit ARGUMENTS (never
closure constants — remote-compile request bloat), every shape is static,
and X wider than ``_MAX_TB`` columns is processed in independent
pallas_calls per column chunk (each chunk's DMA/compute overlaps the
previous one's tail; same rationale as assembly="sum" in pallas_sell.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.bsr import BLOCK, BSRMatrix
from .pallas_sell import _MAX_UPLOAD_BYTES

__all__ = ["DeviceBSR", "device_put_bsr", "pad_rhs", "bsr_spmm_pallas"]

_MAX_TB = 512   # X columns per pallas_call (keeps the Y block + X slab
                # well under VMEM at f32: (128+128)*512*4 = 512 KiB/step)


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceBSR:
    nrows: int
    ncols: int
    nnz: int
    kb: int
    n_block_rows: int
    block_cols: jax.Array  # (n_block_rows * kb,) int32 (scalar prefetch)
    blocks: jax.Array      # (n_block_rows * kb, 128, 128)

    def tree_flatten(self):
        return ((self.block_cols, self.blocks),
                (self.nrows, self.ncols, self.nnz, self.kb,
                 self.n_block_rows))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    def spmm(self, X):
        return bsr_spmm_pallas(self, X)


def device_put_bsr(bsr: BSRMatrix, dtype=jnp.float32, device=None) -> DeviceBSR:
    """Upload the blocked matrix (≙ the CSR device upload of
    main_cuda.cu:134-145, but as dense MXU tiles)."""
    blocks = np.asarray(bsr.blocks, jnp.dtype(dtype))
    if blocks.nbytes > _MAX_UPLOAD_BYTES:
        raise MemoryError(
            f"BSR device array {blocks.nbytes / 2**20:.0f} MiB > "
            f"{_MAX_UPLOAD_BYTES / 2**20:.0f} MiB upload guard "
            "(tunneled-worker crash bound; shrink max_bytes at from_csr)")
    put = functools.partial(jax.device_put, device=device)
    return DeviceBSR(bsr.nrows, bsr.ncols, bsr.nnz, bsr.kb,
                     bsr.n_block_rows,
                     put(np.asarray(bsr.block_cols, np.int32)),
                     put(blocks))


def pad_rhs(X: np.ndarray, ncols: int, dtype=jnp.float32,
            to_device: bool = True):
    """Host-side pad of the RHS block to (n_block_cols*128, B) — done at
    upload time like device_put_x's slab packing (in-jit pads of device
    arrays are HBM relayouts; docs/DESIGN.md). ``to_device=False`` keeps
    the padded numpy array on host (SPMD callers place it themselves)."""
    X = np.asarray(X)
    if X.ndim == 1:
        X = X[:, None]
    rp = -(-max(ncols, 1) // BLOCK) * BLOCK
    bp = -(-X.shape[1] // BLOCK) * BLOCK  # lane dim: 128-multiples only
    out = np.zeros((rp, bp), jnp.dtype(dtype))
    out[:X.shape[0], :X.shape[1]] = X.astype(jnp.dtype(dtype))
    return jax.device_put(out) if to_device else out


def _kernel(acc_dtype):
    def kernel(bc_ref, a_ref, x_ref, o_ref):
        del bc_ref  # consumed by the index_maps
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        # precision=HIGHEST: Mosaic's default f32 matmul runs single-pass
        # bf16xbf16 on the MXU — TPU-measured Aug 20 (probes/bsr_spmm_r4
        # first run): bf16-level error on EVERY output (31.1M sig_diffs),
        # invisible in interpret mode (XLA CPU does true f32). HIGHEST
        # selects the multi-pass f32 decomposition. For native bf16 inputs
        # the single pass IS the honest mode (precision left default).
        prec = ("highest" if a_ref.dtype == jnp.float32 else None)
        o_ref[:] += jnp.dot(a_ref[0], x_ref[:],
                            preferred_element_type=acc_dtype,
                            precision=prec)
    return kernel


def _kernel_dma(kb, acc_dtype):
    """Explicit-DMA twin of :func:`_kernel`: X stays in HBM
    (``memory_space=ANY``) and each step DMAs its 128-row slab into a
    VMEM scratch using the scalar-prefetched block-column index
    *inside the kernel body* — the same prefetch-consumption style as
    the TPU-validated sb-list kernel (pallas_sell.py:709), avoiding
    data-dependent BlockSpec index maps entirely."""
    def kernel(bc_ref, a_ref, x_hbm, o_ref, xb, sem):
        g = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        bc = bc_ref[g * kb + j]
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(bc * BLOCK, BLOCK), :], xb, sem)
        cp.start()
        cp.wait()
        # precision: see _kernel — Mosaic f32 dots default to bf16 passes
        prec = ("highest" if a_ref.dtype == jnp.float32 else None)
        o_ref[:] += jnp.dot(a_ref[0], xb[:],
                            preferred_element_type=acc_dtype,
                            precision=prec)
    return kernel


def _chunk_call(dbsr: DeviceBSR, xp, interpret: bool, route: str = "blockspec"):
    kb, n_br = dbsr.kb, dbsr.n_block_rows
    tb = xp.shape[1]
    if route == "dma":
        x_spec = pl.BlockSpec(memory_space=pl.ANY)
        kernel = _kernel_dma(kb, jnp.float32)
        scratch = [pltpu.VMEM((BLOCK, tb), xp.dtype),
                   pltpu.SemaphoreType.DMA]
    elif route == "blockspec":
        x_spec = pl.BlockSpec((BLOCK, tb), lambda g, j, bc: (bc[g * kb + j], 0),
                              memory_space=pltpu.VMEM)
        kernel = _kernel(jnp.float32)
        scratch = []
    else:
        raise ValueError(f"unknown route {route!r}")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # block_cols
        grid=(n_br, kb),
        in_specs=[
            pl.BlockSpec((1, BLOCK, BLOCK), lambda g, j, bc: (g * kb + j, 0, 0),
                         memory_space=pltpu.VMEM),
            x_spec,
        ],
        out_specs=pl.BlockSpec((BLOCK, tb), lambda g, j, bc: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_br * BLOCK, tb), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(dbsr.block_cols, dbsr.blocks, xp)


@functools.partial(jax.jit, static_argnames=("interpret", "route"))
def bsr_spmm_pallas(dbsr: DeviceBSR, X, *, interpret: bool = False,
                    route: str = "blockspec"):
    """Multi-RHS SpMM; returns ``(nrows, B)`` float32 in natural order.

    ``X`` is either the pre-padded ``(n_block_cols*128, B)`` table from
    :func:`pad_rhs` (preferred) or a raw ``(ncols, B)`` / ``(ncols,)``
    array (padded in-jit). Column blocks beyond ``_MAX_TB`` run as
    independent pallas_calls so their DMA streams overlap.

    ``route`` selects how the X slab reaches VMEM: ``"blockspec"``
    (data-dependent BlockSpec index map — pipelined by Mosaic) or
    ``"dma"`` (explicit in-kernel ``make_async_copy``). Both are
    oracle-validated in tests; the TPU A/B lives in
    probes/bsr_spmm_tpu.py.
    """
    squeeze = X.ndim == 1
    if squeeze:
        X = X[:, None]
    b = X.shape[1]
    rp = -(-max(dbsr.ncols, 1) // BLOCK) * BLOCK
    bp = -(-b // BLOCK) * BLOCK  # lane dim: 128-multiples only
    if X.shape[0] != rp or bp != b:
        X = jnp.pad(X, ((0, rp - X.shape[0]), (0, bp - b)))
    outs = [_chunk_call(dbsr, X[:, c:c + _MAX_TB], interpret, route)
            for c in range(0, bp, _MAX_TB)]
    y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    y = y[:dbsr.nrows, :b]
    return y[:, 0] if squeeze else y
