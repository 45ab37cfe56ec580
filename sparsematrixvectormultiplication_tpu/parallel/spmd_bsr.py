"""SPMD block-sparse SpMM — the MXU BSR kernel under ``shard_map``.

Multi-chip SpMM the TPU way (≙ what the reference would do with one GPU
per matrix slice, but as one SPMD program): block-rows are sharded over
a mesh axis, the dense RHS block ``X`` is replicated, and every chip
runs the same Pallas MXU program (ops/pallas_bsr.py) on its slice — no
collectives in the hot loop at all, because BSR's ELL-over-blocks
layout makes ``kb`` GLOBAL: unlike the SELL bins (parallel/
spmd_pallas.py harmonization), shards are born shape-uniform and need
zero padding negotiation. Only the block-row count pads to the shard
multiple (all-zero blocks).

Same leading-shard-axis idiom as spmd_pallas.py: every leaf gets a
shard dimension, ``device_put`` with ``P(axis)`` lays shards onto
chips, and the shard_map body peels ``leaf[0]``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.bsr import BLOCK, BSRMatrix
from ..ops.pallas_bsr import DeviceBSR, bsr_spmm_pallas, pad_rhs

__all__ = ["SpmdBSR", "shard_bsr", "bsr_spmm_spmd"]


@dataclass
class SpmdBSR:
    stacked: DeviceBSR      # leaves carry a leading shard axis
    shard_rows: np.ndarray  # real (unpadded) rows owned per shard
    local_rows: int         # padded rows per shard
    nrows: int
    ncols: int
    axis: str


def shard_bsr(bsr: BSRMatrix, n_shards: int, *, mesh: Mesh | None = None,
              axis: str = "rows", dtype=jnp.float32) -> SpmdBSR:
    """Split block-rows into ``n_shards`` uniform contiguous slices."""
    kb = bsr.kb
    br_local = max(-(-bsr.n_block_rows // n_shards), 1)
    br_pad = br_local * n_shards

    blocks = np.zeros((br_pad * kb, BLOCK, BLOCK), jnp.dtype(dtype))
    blocks[:bsr.n_block_rows * kb] = bsr.blocks.astype(jnp.dtype(dtype))
    bcols = np.zeros(br_pad * kb, np.int32)
    bcols[:bsr.n_block_rows * kb] = bsr.block_cols

    blocks = blocks.reshape(n_shards, br_local * kb, BLOCK, BLOCK)
    bcols = bcols.reshape(n_shards, br_local * kb)
    shard_rows = np.clip(bsr.nrows - np.arange(n_shards) * br_local * BLOCK,
                         0, br_local * BLOCK)

    stacked = DeviceBSR(
        nrows=br_local * BLOCK,  # per-shard padded rows (aux is LOCAL)
        ncols=bsr.ncols,
        nnz=bsr.nnz,
        kb=kb,
        n_block_rows=br_local,
        block_cols=bcols,
        blocks=blocks,
    )
    if mesh is not None:
        def put(leaf):
            spec = P(axis, *([None] * (leaf.ndim - 1)))
            return jax.device_put(jnp.asarray(leaf), NamedSharding(mesh, spec))

        stacked = jax.tree_util.tree_map(put, stacked)
    else:
        stacked = jax.tree_util.tree_map(jnp.asarray, stacked)

    return SpmdBSR(stacked=stacked, shard_rows=shard_rows.astype(np.int64),
                   local_rows=br_local * BLOCK, nrows=bsr.nrows,
                   ncols=bsr.ncols, axis=axis)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "interpret"))
def _spmd_run(stacked, X, *, mesh, axis, interpret):
    def local_fn(st, xl):
        dbsr = jax.tree_util.tree_map(lambda a: a[0], st)
        return bsr_spmm_pallas(dbsr, xl, interpret=interpret)

    run = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return run(stacked, X)


def bsr_spmm_spmd(spmd: SpmdBSR, X, mesh: Mesh, *, interpret: bool = False):
    """``Y = A @ X`` with the MXU kernel running SPMD over ``mesh``.

    ``X`` is ``(ncols, B)`` (replicated to every chip); it is padded to
    the slab/lane grid HOST-SIDE here — an in-jit pad of the replicated
    device array would be a per-call HBM relayout (docs/DESIGN.md).
    Returns the global ``(nrows, B)`` result in natural row order."""
    b = X.shape[1] if X.ndim == 2 else 1
    xp = pad_rhs(X, spmd.ncols, dtype=spmd.stacked.blocks.dtype,
                 to_device=False)
    Xr = jax.device_put(xp, NamedSharding(mesh, P()))
    Y = _spmd_run(spmd.stacked, Xr, mesh=mesh, axis=spmd.axis,
                  interpret=interpret)
    Y = np.asarray(Y)
    L = spmd.local_rows
    parts = [Y[i * L:i * L + int(r), :b]
             for i, r in enumerate(spmd.shard_rows)]
    return np.concatenate(parts) if parts else Y[:0, :b]
