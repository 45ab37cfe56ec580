"""Pallas HLL SpMV — the hack-size-granular kernel surface.

The reference benchmarks HLL as a distinct format with its own GPU kernels
(spmv_hll_naive/warp/warp_shared, cuda_src/hll_matrix.cu:346-479), where the
work profile is set by per-32-row-block MAXNZ padding. On TPU the same
compute maps onto the SELL-C-128 kernel machinery; this module preserves the
**HLL padding semantics** exactly — every row carries its block's MAXNZ
slots, including the explicit (last-valid-col, 0.0) padding slots — so the
CSR-vs-HLL "format shootout" (BASELINE.json config 5) measures the true
HLL work profile, not a repacked one.
"""

from __future__ import annotations

import numpy as np

from ..formats.csr import CSRMatrix
from ..formats.hll import HLLMatrix
from ..formats.sell import SellMatrix
from .pallas_sell import DeviceSell, device_put_sell, sell_spmv_pallas

__all__ = ["hll_to_sell", "device_put_hll_pallas", "hll_spmv_pallas"]


def hll_to_sell(hll: HLLMatrix, **sell_kwargs) -> SellMatrix:
    """Repack an HLL matrix into SELL bins *including* its padding slots.

    Each row contributes exactly ``maxnz[block]`` entries (reference layout
    hll_matrix.c:235), so per-group K equals the max block MAXNZ in the
    group and the padded area matches HLL's.
    """
    M = hll.nrows
    counts = np.repeat(
        hll.maxnz.astype(np.int64),
        [hll.block_rows(b) for b in range(hll.num_blocks)],
    )
    row_ptr = np.zeros(M + 1, dtype=np.int64)
    np.cumsum(counts, out=row_ptr[1:])
    # HLL flat arrays are already row-major per block -> per-row slices align
    csr_like = CSRMatrix(
        nrows=M,
        ncols=hll.ncols,
        row_ptr=row_ptr,
        col_idx=hll.ja,
        values=hll.as_,
    )
    return SellMatrix.from_csr(csr_like, **sell_kwargs)


def device_put_hll_pallas(hll: HLLMatrix, dtype=None, device=None) -> DeviceSell:
    import jax.numpy as jnp

    return device_put_sell(hll_to_sell(hll), dtype=dtype or jnp.float32, device=device)


def hll_spmv_pallas(dhll: DeviceSell, x, *, interpret: bool = False):
    """SpMV over the HLL-derived device layout (≙ spmv_hll_warp_kernel role)."""
    return sell_spmv_pallas(dhll, x, interpret=interpret)
