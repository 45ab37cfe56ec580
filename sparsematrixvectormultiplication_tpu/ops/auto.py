"""Automatic format/kernel selection — the one-call user surface.

The reference makes the user pick a kernel (serial/OpenMP/CUDA × CSR/HLL,
main.c / main_cuda.cu); this framework has three performance layouts with
disjoint winning regimes (measured across round 2-3, RESULTS.md):

* ``sell``  — banded / clustered / moderate-locality matrices (SELL-C-128
  with the per-group cost model; fem3d 88 GF class)
* ``split`` — band + scattered tail (road/circuit class; the tail would
  otherwise multiply every group's slab scans ~13x)
* ``pr``    — zero/low locality (power-law webs, uniform random; every
  broadcast-scan kernel sits at the diffuse floor there)

``choose_format`` applies the same host-side profile rules the round-3
benchmarks validated; ``auto_device_op`` converts, uploads, and returns a
callable op. For very large matrices prefer the explicit stage APIs
(pallas_sell / pallas_split / pallas_pr) which expose paneling knobs.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..formats.csr import CSRMatrix
from ..formats.split import _MAX_FAR_FRAC, split_stats

__all__ = ["choose_format", "auto_device_op", "AutoOp"]

# beyond this many distinct (group, slab) pairs per entry the broadcast-
# scan kernels pay >= ~1 vector-op per pair (the diffuse floor,
# docs/DESIGN.md round-3) and PR wins
_PR_SLABS_PER_ENTRY = 0.02


def choose_format(csr: CSRMatrix) -> tuple:
    """Returns ``(kind, stats)`` with kind in {"sell", "split", "pr"}."""
    if csr.nnz == 0:
        return "sell", {"reason": "empty matrix"}
    st1 = split_stats(csr, 1)
    ng = max(-(-csr.nrows // 1024), 1)
    slabs_per_entry = st1["gslabs_all"] * ng / csr.nnz
    # band + tail: removing the tail collapses the per-group slab count
    for d in (1, 2, 4, 8, 16, 32):
        st = split_stats(csr, d) if d != 1 else st1
        if (st["far_frac"] <= _MAX_FAR_FRAC
                and st["gslabs_near"] <= 0.5 * st["gslabs_all"]
                and st["far_frac"] > 0.005):
            return "split", {**st, "reason": "band + scattered tail"}
        if st["far_frac"] <= 0.005:
            break  # already (near-)pure band at this threshold
    if slabs_per_entry > _PR_SLABS_PER_ENTRY:
        return "pr", {"slabs_per_entry": slabs_per_entry,
                      "reason": "zero/low locality (diffuse floor)"}
    return "sell", {"slabs_per_entry": slabs_per_entry,
                    "reason": "banded/clustered locality"}


@dataclass
class AutoOp:
    """Uploaded SpMV operator. ``matvec(x)`` takes/returns numpy arrays
    (host round-trip included); ``kind`` says which layout won. The device
    structure rides in ``device`` for composition with the jit solvers —
    pass it as a jit ARGUMENT (closure capture ships it inside the
    remote-compile request on this runtime, docs/DESIGN.md)."""

    kind: str
    stats: dict
    nrows: int
    ncols: int
    device: object
    host: object       # the host conversion product (oracle .spmv)
    row_perm: np.ndarray | None = None  # pr: kernel output is sigma order
    seg_ids: np.ndarray | None = None   # pr after heavy-row split: kernel
                                        # row -> original row (host reduce)
    dtype: object = jnp.float32
    interpret: bool = False

    def matvec(self, x) -> np.ndarray:
        from .pallas_sell import device_put_x

        xt = device_put_x(np.asarray(x, np.float64), self.ncols, self.dtype)
        y = np.asarray(self._call(xt), np.float64)
        if self.seg_ids is not None:  # heavy-split segments, host-exact
            return np.bincount(self.seg_ids, weights=y,
                               minlength=self.nrows)[: self.nrows]
        if self.row_perm is not None:
            out = np.empty(self.nrows, np.float64)
            out[self.row_perm] = y[: self.nrows]
            return out
        return y[: self.nrows]

    def _call(self, xt):
        if self.kind == "sell":
            from .pallas_sell import sell_spmv_pallas
            return sell_spmv_pallas(self.device, xt,
                                    interpret=self.interpret)
        if self.kind == "split":
            from .pallas_split import split_spmv_pallas
            return split_spmv_pallas(self.device, xt,
                                     interpret=self.interpret)
        from .pallas_pr import pr_spmv_pallas
        return pr_spmv_pallas(self.device, xt, interpret=self.interpret)


def auto_device_op(csr: CSRMatrix, dtype=jnp.float32, *,
                   interpret: bool | None = None, log=None) -> AutoOp:
    """Profile -> convert -> upload -> callable op, in one call."""
    import jax

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    kind, stats = choose_format(csr)
    if log:
        log(f"auto_device_op: {kind} ({stats.get('reason')})")
    row_perm = None
    seg_ids = None
    if kind == "split":
        from ..formats.split import SplitMatrix
        from .pallas_split import device_put_split

        host = SplitMatrix.from_csr(csr)
        dev = device_put_split(host, dtype=dtype)
    elif kind == "pr":
        from ..formats.pr import pr_from_csr
        from .pallas_pr import device_put_pr

        try:
            host = pr_from_csr(csr)
            row_perm = host.row_perm
        except ValueError:
            # dense rows force k*8 Beneš dest rows each — split them into
            # strided segments first (the harness's own recipe) and reduce
            # host-side in matvec
            csr_k, seg = csr.split_heavy_rows(16, strided=True)
            host = pr_from_csr(csr_k)
            seg_ids = np.asarray(seg)[host.row_perm]
        dev = device_put_pr(host, dtype=dtype)
    else:
        from ..formats.sell import SellMatrix
        from .pallas_sell import device_put_sell

        host = SellMatrix.from_csr(csr)
        dev = device_put_sell(host, dtype=dtype)
    return AutoOp(kind=kind, stats=stats, nrows=csr.nrows, ncols=csr.ncols,
                  device=dev, host=host, row_perm=row_perm, seg_ids=seg_ids,
                  dtype=dtype, interpret=interpret)
