"""Device composite for the locality-split layout (formats/split.py).

One jitted program: the near SELL bins and the natural-order PR far part
both read the same VMEM x-table; their outputs combine with a single
vector add (both are in natural row order — see formats/split.py for why
the PR part's sigma is the identity). No gather/scatter appears anywhere
on the device path.

≙ reference thread-per-row CUDA kernel's regime
(cuda_src/csr_matrix_cuda.cu:122-148) — the TPU-native answer is a split,
not a translation.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .pallas_pr import DevicePR, device_put_pr, pr_spmv_pallas
from .pallas_sell import (DeviceSell, device_put_sell, pack_x_table,
                          sell_spmv_pallas)

__all__ = ["DeviceSplit", "device_put_split", "split_spmv_pallas",
           "DeviceSplitDD", "device_put_split_dd", "split_spmv_pallas_dd"]


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceSplit:
    nrows: int
    ncols: int
    nnz: int
    near: DeviceSell
    far: DevicePR

    def tree_flatten(self):
        return (self.near, self.far), (self.nrows, self.ncols, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    def spmv(self, x):
        return split_spmv_pallas(self, x)


def device_put_split(sm, dtype=jnp.float32, device=None) -> DeviceSplit:
    return DeviceSplit(
        nrows=sm.nrows, ncols=sm.ncols, nnz=sm.nnz,
        near=device_put_sell(sm.near, dtype=dtype, device=device),
        far=device_put_pr(sm.far, dtype=dtype, device=device),
    )


@functools.partial(jax.jit, static_argnames=("interpret", "assembly"))
def split_spmv_pallas(ds: DeviceSplit, x, *, interpret: bool = False,
                      assembly: str = "auto"):
    """y = near_sell(x) + far_pr(x), both natural row order, one program."""
    x_tab = x if x.ndim == 2 else pack_x_table(x, ds.ncols)
    y_near = sell_spmv_pallas(ds.near, x_tab, interpret=interpret,
                              assembly=assembly)
    y_far = pr_spmv_pallas(ds.far, x_tab, interpret=interpret)
    return y_near + y_far[: ds.nrows]


# ---------------------------------------------------------------------------
# fp64-class (double-double) twin
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceSplitDD:
    nrows: int
    ncols: int
    nnz: int
    near: object   # DeviceSellDD
    far: object    # DevicePRDD

    def tree_flatten(self):
        return (self.near, self.far), (self.nrows, self.ncols, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)


def device_put_split_dd(sm, device=None) -> DeviceSplitDD:
    """dd upload. The PR-dd kernel holds four VMEM scratch planes, so ONE
    Beneš problem caps at 2^14 rows (ops/pallas_pr_dd.py
    DD_PANEL_TARGET_ROWS); SplitMatrix.from_csr builds the far side to
    that per-panel cap (formats/split.py _FAR_TARGET_ROWS), so paneled
    far sides upload directly — the guard checks the WORST panel only."""
    from .pallas_pr_dd import (DD_PANEL_TARGET_ROWS, device_put_pr_dd)
    from .pallas_sell_dd import device_put_sell_dd

    worst = max(p.n_rows for p in getattr(sm.far, "panels", (sm.far,)))
    if worst > DD_PANEL_TARGET_ROWS:
        raise ValueError(
            f"split far PR panel has {worst} Beneš rows > the dd VMEM cap "
            f"{DD_PANEL_TARGET_ROWS} — rebuild with "
            f"SplitMatrix.from_csr(far_target_rows=<=2^14) or run the f32 "
            f"stage instead")
    return DeviceSplitDD(
        nrows=sm.nrows, ncols=sm.ncols, nnz=sm.nnz,
        near=device_put_sell_dd(sm.near, device=device),
        far=device_put_pr_dd(sm.far, device=device),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def split_spmv_pallas_dd(ds: DeviceSplitDD, xh, xl, *,
                         interpret: bool = False):
    """fp64-class composite: (yh, yl) = near_dd(x) ⊕ far_dd(x), both
    natural row order, renormalized with an error-free dd add."""
    from .doubledouble import dd_add_dd
    from .pallas_pr_dd import pr_spmv_pallas_dd
    from .pallas_sell import pack_x_table as _pack
    from .pallas_sell_dd import sell_spmv_pallas_dd

    xh_tab = xh if xh.ndim == 2 else _pack(xh, ds.ncols)
    xl_tab = xl if xl.ndim == 2 else _pack(xl, ds.ncols)
    yh_n, yl_n = sell_spmv_pallas_dd(ds.near, xh_tab, xl_tab,
                                     interpret=interpret)
    yh_f, yl_f = pr_spmv_pallas_dd(ds.far, xh_tab, xl_tab,
                                   interpret=interpret)
    return dd_add_dd(yh_n, yl_n, yh_f[: ds.nrows], yl_f[: ds.nrows])
