"""PR kernel phase-cost breakdown on the real TPU.

Slope-times the powerlaw_web PR kernel in three trims (gather-only,
gather+route, full) to attribute milliseconds to the gather, Beneš and
reduce phases — the optimization map for the zero-locality engine.
Run manually after the r3 chain completes (ONE TPU process at a time).
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import numpy as np  # noqa: E402

from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix  # noqa: E402
from sparsematrixvectormultiplication_tpu.formats.pr import pr_from_csr  # noqa: E402
from sparsematrixvectormultiplication_tpu.formats.coo import COOMatrix  # noqa: E402
from sparsematrixvectormultiplication_tpu.ops.pallas_pr import (  # noqa: E402
    device_put_pr,
    pr_spmv_pallas,
)
from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (  # noqa: E402
    device_put_x,
)
from sparsematrixvectormultiplication_tpu.utils.timing import (  # noqa: E402
    time_device_fn_slope,
)


def main() -> None:
    import jax
    _ = np.asarray(jax.device_put(np.ones(1024, np.float32)) + 1)
    path = os.path.join(REPO, "suite_mtx", "powerlaw_web.mtx")
    csr = CSRMatrix.from_coo(COOMatrix.from_mtx(path))
    pr = pr_from_csr(csr)
    dpr = device_put_pr(pr)
    x = np.random.default_rng(0).standard_normal(csr.ncols)
    xd = device_put_x(x, csr.ncols)
    gf = lambda s: 2 * csr.nnz / s / 1e9
    for impl in ("roll", "swap"):
        for ph in ("gather", "route", "all"):
            fn = lambda d, xx, _p=ph, _i=impl: pr_spmv_pallas(
                d, xx, phases=_p, stage_impl=_i)
            _ = np.asarray(fn(dpr, xd))  # compile
            sec, pts = time_device_fn_slope(fn, dpr, xd, reps=32, rounds=2)
            print(f"{impl}/{ph:>6}: {sec*1e3:.3f} ms "
                  f"({gf(sec):.2f} GF-equivalent)", flush=True)


if __name__ == "__main__":
    main()
