"""Multi-device Pallas SpMV — data-parallel dispatch of the flagship kernel.

`parallel/sharding.py` scales the XLA kernels through jit shardings /
shard_map (compiler-partitioned). The Pallas kernels are custom calls without
partitioning rules, so this module scales them the explicit way: rows are
split into per-device contiguous group ranges balanced by nnz
(:func:`.scheduler.balanced_partition` — the chip-level generalization of the
reference's per-thread nnz balancing, csr_matrix.c:167-266), each device gets
its own SELL shard and x replica, and JAX's async dispatch runs all shards
concurrently. y is reassembled host-side (or by the caller from the shards).
"""

from __future__ import annotations

import numpy as np

from ..formats.csr import CSRMatrix
from ..formats.sell import GROUP_ROWS, SellMatrix
from .scheduler import balanced_partition

__all__ = ["MultiDeviceSell", "shard_sell_rows"]


class MultiDeviceSell:
    """Per-device SELL shards over contiguous row ranges."""

    def __init__(self, shards, row_starts, nrows, ncols, nnz, dtype):
        self.shards = shards          # [(device, DeviceSell, x_slice_info)]
        self.row_starts = row_starts  # (n+1,) global row offsets per shard
        self.nrows = nrows
        self.ncols = ncols
        self.nnz = nnz
        self.dtype = dtype

    @property
    def num_shards(self) -> int:
        return len(self.shards)

    def spmv(self, x, *, interpret: bool = False):
        """y = A @ x across all shards; returns a host numpy array.

        x is replicated to every device (the DP layout: no hot-loop
        collectives, SURVEY §2.4 row-sharding row). Dispatch is async so
        shards execute concurrently; the concatenation forces completion.
        """
        import jax
        import jax.numpy as jnp

        from ..ops.pallas_sell import sell_spmv_pallas

        ys = []
        for device, dsell in self.shards:
            xd = jax.device_put(jnp.asarray(x, self.dtype), device)
            ys.append(sell_spmv_pallas(dsell, xd, interpret=interpret))
        return np.concatenate([np.asarray(y) for y in ys])


def shard_sell_rows(
    csr: CSRMatrix,
    devices=None,
    *,
    dtype=None,
    sell_kwargs=None,
) -> MultiDeviceSell:
    """Split a CSR matrix into per-device row shards (group-aligned,
    nnz-balanced) and upload each as an independent SELL structure."""
    import jax
    import jax.numpy as jnp

    from ..ops.pallas_sell import device_put_sell

    devices = list(devices if devices is not None else jax.devices())
    dtype = dtype or jnp.float32
    sell_kwargs = sell_kwargs or {}

    num_groups = -(-csr.nrows // GROUP_ROWS) if csr.nrows else 0
    n_dev = max(1, min(len(devices), max(num_groups, 1)))

    # nnz per group -> balanced contiguous group ranges per device
    row_nnz = np.zeros(num_groups * GROUP_ROWS, dtype=np.int64)
    row_nnz[: csr.nrows] = csr.row_nnz()
    group_nnz = row_nnz.reshape(num_groups, GROUP_ROWS).sum(axis=1) if num_groups else np.zeros(0, np.int64)
    part = balanced_partition(group_nnz, n_dev)

    shards = []
    row_starts = [0]
    for i, (gs, ge, _load) in enumerate(part):
        r0 = gs * GROUP_ROWS
        r1 = min(ge * GROUP_ROWS, csr.nrows)
        # slice the CSR rows [r0, r1)
        p0, p1 = int(csr.row_ptr[r0]), int(csr.row_ptr[r1])
        sub = CSRMatrix(
            nrows=r1 - r0,
            ncols=csr.ncols,
            row_ptr=(csr.row_ptr[r0 : r1 + 1] - p0).astype(np.int64),
            col_idx=csr.col_idx[p0:p1],
            values=csr.values[p0:p1],
        )
        sell = SellMatrix.from_csr(sub, **sell_kwargs)
        dev = devices[i % len(devices)]
        shards.append((dev, device_put_sell(sell, dtype=dtype, device=dev)))
        row_starts.append(r1)
    return MultiDeviceSell(shards, np.asarray(row_starts), csr.nrows, csr.ncols,
                           csr.nnz, dtype)
