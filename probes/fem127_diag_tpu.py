"""Bisect the fem3d_large (127M) Mosaic compile 500 with ABSTRACT compiles.

No data uploads: every case lowers from jax.ShapeDtypeStruct avals and
calls .compile(), so each attempt costs only helper time. Cases isolate
(a) the big wl sub-bin as a single-kernel program, (b) the x-table row
count, (c) the multi-kernel program, (d) the cube control.

Output: probes/fem127_diag_r5.out with one PASS/FAIL(+error head) per case.
"""
from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sparsematrixvectormultiplication_tpu.formats.sell import (
        LANES, SUBLANES)
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        DeviceSellBin, _bin_call)

    t0 = time.time()
    _ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
    print(f"warm-up {time.time()-t0:.0f}s", flush=True)

    SDS = jax.ShapeDtypeStruct
    i32, f32 = jnp.int32, jnp.float32

    def wl_case(K, ng, NW, L, R, num_groups, n_kernels=1, contig=0):
        """(n_kernels x the same wl bin) in one jit program."""
        kb = K * SUBLANES

        def fn(gids, sl, cnt, x, ja, as_):
            y = jnp.zeros((num_groups * SUBLANES, LANES), f32)
            for _ in range(n_kernels):
                b = DeviceSellBin(
                    k=K, n_groups=ng, layout="wl", span=L,
                    group_ids=gids, ja=ja, as_=as_, slab_list=sl,
                    slab_count=cnt, contig_start=contig, chunk_k=NW)
                y = _bin_call(b, x, y, num_groups, False)
            return y

        avals = [SDS((ng,), i32), SDS((ng, SUBLANES * NW * 8), i32),
                 SDS((ng,), i32), SDS((R, LANES), f32),
                 SDS((ng * kb, LANES), i32), SDS((ng * kb, LANES), f32)]
        return fn, avals

    cases = [
        # control: the cube big bin (proven 96.9 GF config)
        ("cube-K144-ng612-R5063", wl_case(144, 612, 6, 3, 5063, 633)),
        # fem127 big sub-bin after the 3-way split, alone
        ("large-sub-K168-ng526-R12923", wl_case(168, 526, 7, 3, 12923, 1616)),
        # same but with cube's x-table rows (isolates R)
        ("large-sub-smallR-K168-ng526-R5063", wl_case(168, 526, 7, 3, 5063, 1616)),
        # the small fem127 bin (NW=13, L=1) alone
        ("large-K104-ng38-R12923", wl_case(104, 38, 13, 1, 12923, 1616)),
        # the UNSPLIT big bin (r4-equivalent failing shape)
        ("large-unsplit-K168-ng1576", wl_case(168, 1576, 7, 3, 12923, 1616)),
        # two big sub-bins in ONE program (program-size probe)
        ("large-2xsub-K168", wl_case(168, 526, 7, 3, 12923, 1616,
                                     n_kernels=2)),
    ]
    for name, (fn, avals) in cases:
        t0 = time.time()
        try:
            jax.jit(fn).lower(*avals).compile()
            print(f"[{name}] PASS ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            head = str(e).replace("\n", " | ")[:600]
            print(f"[{name}] FAIL ({time.time()-t0:.0f}s): "
                  f"{type(e).__name__}: {head}", flush=True)
            tb = traceback.format_exc()
            for line in tb.splitlines():
                if any(k in line.lower() for k in
                       ("vmem", "smem", "memory", "exceed", "limit")):
                    print("   >>", line.strip()[:300], flush=True)


if __name__ == "__main__":
    main()
