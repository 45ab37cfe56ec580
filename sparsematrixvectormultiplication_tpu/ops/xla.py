"""XLA (pure-jnp) SpMV kernels — the device oracles.

These are the jittable "serial" kernels of the framework (SURVEY §7 step 3):
the CSR segment-sum kernel ≙ the reference's golden serial CSR row loop
(src/csr_matrix.c:130-139), the padded ELL kernel ≙ the serial HLL loop
(src/hll_matrix.c:286-308). They run on any backend (CPU for tests, TPU for
fp64-exact validation); the Pallas kernels in :mod:`.pallas_sell` are the
TPU performance path (XLA's arbitrary gather does not vectorize on TPU —
measured ~0.1-1 G elem/s, see kernel-design notes in docs/DESIGN.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "csr_spmv",
    "csr_spmm",
    "ell_spmv",
    "sell_spmv_xla",
    "DeviceCSR",
    "DeviceELL",
    "device_put_csr",
    "device_put_ell",
]


@functools.partial(jax.jit, static_argnames=("nrows",))
def csr_spmv(values, col_idx, row_ids, x, *, nrows: int):
    """CSR SpMV: ``y = segment_sum(values * x[col_idx], row_ids)``.

    ``row_ids`` is the expanded per-entry row index (sorted ascending, as
    produced by :meth:`formats.csr.CSRMatrix.row_ids`).
    """
    prod = values * jnp.take(x, col_idx)
    return jax.ops.segment_sum(
        prod, row_ids, num_segments=nrows, indices_are_sorted=True
    )


@functools.partial(jax.jit, static_argnames=("nrows",))
def csr_spmm(values, col_idx, row_ids, X, *, nrows: int):
    """CSR multi-RHS SpMM: ``Y = segment_sum(values[:, None] * X[col_idx], row_ids)``.

    The any-backend differential twin of the MXU BSR kernel
    (ops/pallas_bsr.py). On TPU the row gather of ``X`` is the slow XLA
    gather (docs/DESIGN.md) — this is a correctness baseline, not the
    production path.
    """
    prod = values[:, None] * jnp.take(X, col_idx, axis=0)
    return jax.ops.segment_sum(
        prod, row_ids, num_segments=nrows, indices_are_sorted=True
    )


@jax.jit
def ell_spmv(ja, as_, x):
    """Padded-ELL SpMV over a rectangle: ``y[i] = sum_k as_[i,k] * x[ja[i,k]]``.

    Padding entries carry ``as_ == 0`` and an in-bounds column (reference
    hll_matrix.c:241-246), so they contribute nothing.
    """
    return jnp.sum(as_ * jnp.take(x, ja), axis=1)


def sell_spmv_xla(dsell, x_tab):
    """SELL-C-128 SpMV via plain XLA gathers (correctness path, any backend).

    Same memory layout the Pallas kernel consumes; used as the differential
    twin in tests (SURVEY §4 implication: Pallas-vs-jnp differential tests).
    """
    from ..formats.sell import GROUP_ROWS, LANES, SUBLANES

    num_groups = dsell.num_groups
    y = jnp.zeros((num_groups * SUBLANES, LANES), dtype=x_tab.dtype)
    x_flat = x_tab.reshape(-1)
    for bin_ in dsell.bins:
        ng, K = bin_.n_groups, bin_.k
        if bin_.layout == "k-major":
            ja = bin_.ja.reshape(ng, K, SUBLANES, LANES)
            as_ = bin_.as_.reshape(ng, K, SUBLANES, LANES)
            contrib = jnp.sum(as_ * jnp.take(x_flat, ja), axis=1)  # (ng,8,128)
        else:  # sb-major
            ja = bin_.ja.reshape(ng, SUBLANES, K, LANES)
            as_ = bin_.as_.reshape(ng, SUBLANES, K, LANES)
            contrib = jnp.sum(as_ * jnp.take(x_flat, ja), axis=2)  # (ng,8,128)
        rows = bin_.group_ids.astype(jnp.int32)
        y = y.at[
            (rows[:, None] * SUBLANES + jnp.arange(SUBLANES)[None, :]).reshape(-1)
        ].set(contrib.reshape(ng * SUBLANES, LANES))
    return y.reshape(-1)


# --------------------------------------------------------------------------
# Device-resident containers (≙ the reference's cudaMalloc/Memcpy upload layer,
# main_cuda.cu:134-145 / 376-402 — here a jax.device_put of packed arrays).
# --------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class DeviceCSR:
    """CSR arrays resident on device (a pytree, so it passes through jit as
    an argument — closure capture would embed the matrix in the compile
    request on this runtime)."""

    def __init__(self, values, col_idx, row_ids, nrows, ncols):
        self.values = values
        self.col_idx = col_idx
        self.row_ids = row_ids
        self.nrows = int(nrows)
        self.ncols = int(ncols)

    @property
    def nnz(self):
        return int(self.values.shape[0])

    def spmv(self, x):
        return csr_spmv(self.values, self.col_idx, self.row_ids, x, nrows=self.nrows)

    def tree_flatten(self):
        return (self.values, self.col_idx, self.row_ids), (self.nrows, self.ncols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


@jax.tree_util.register_pytree_node_class
class DeviceELL:
    """Rectangular padded ELL arrays resident on device (HLL rect view)."""

    def __init__(self, ja, as_, nrows, ncols, nnz):
        self.ja = ja
        self.as_ = as_
        self.nrows = int(nrows)
        self.ncols = int(ncols)
        self.nnz = int(nnz)

    def spmv(self, x):
        return ell_spmv(self.ja, self.as_, x)[: self.nrows]

    def tree_flatten(self):
        return (self.ja, self.as_), (self.nrows, self.ncols, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


# Single device arrays beyond ~1.2 GB crash this runtime's TPU worker
# process outright (UNAVAILABLE — measured twice in the r2 sweep: the 120M
# xla_csr upload and the power-law ELL rectangle), killing every later
# device call in the process. Guard uploads; per-stage failure tolerance in
# the harness turns this into a clean skip.
_MAX_DEVICE_ARRAY_BYTES = 1200 * 1024 * 1024


def _check_upload(nbytes: int, what: str):
    if nbytes > _MAX_DEVICE_ARRAY_BYTES:
        raise MemoryError(
            f"{what} is {nbytes/2**20:.0f} MiB > "
            f"{_MAX_DEVICE_ARRAY_BYTES/2**20:.0f} MiB — uploads this large "
            "crash the tunneled TPU worker; stage skipped"
        )


def device_put_csr(csr, dtype=None, device=None) -> DeviceCSR:
    from ..formats.csr import CSRMatrix  # noqa: F401 (typing aid)

    vals = csr.values if dtype is None else csr.values.astype(dtype)
    # nnz*12 ≈ the kernel's EXECUTION working set (x-gather output +
    # product + values): the r2 worker crash hit at 119M nnz = 1.43 GB,
    # exactly this bound — per-array upload sizes alone (476 MB) pass
    _check_upload(max(vals.nbytes, csr.col_idx.nbytes, csr.nnz * 12),
                  "xla_csr array")
    return DeviceCSR(
        jax.device_put(jnp.asarray(vals), device),
        jax.device_put(jnp.asarray(csr.col_idx), device),
        jax.device_put(jnp.asarray(csr.row_ids()), device),
        csr.nrows,
        csr.ncols,
    )


def device_put_ell(hll, dtype=None, device=None, max_elements: int = 1 << 31) -> DeviceELL:
    ja, as_ = hll.to_rect(max_elements=max_elements)
    if dtype is not None:
        as_ = as_.astype(dtype)
    _check_upload(max(ja.nbytes, as_.nbytes), "xla_ell rectangle")
    return DeviceELL(
        jax.device_put(jnp.asarray(ja), device),
        jax.device_put(jnp.asarray(as_), device),
        hll.nrows,
        hll.ncols,
        hll.nnz,
    )
