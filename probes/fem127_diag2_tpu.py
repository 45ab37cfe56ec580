"""Second fem127 compile-500 bisect: vary (K, NW, L, ng, packed, R)
one axis at a time with ABSTRACT compiles (ShapeDtypeStruct avals; no
device transfers, so the post-exit tunnel wedge cannot stall this probe).

Eliminated so far (round-5 measurements): SMEM table size (918 KB
compiles, 910-924 KB parts fail), grid steps (264-step parts fail, 306
proven passing), multi-kernel program size (single-kernel fails), x-table
rows alone (K=104 bin compiles at R=12923).
Remaining suspects: the K=168 / NW=7 kernel geometry itself, its
interaction with ng (all failures had ng >= 520), or packed-ja.
"""
from __future__ import annotations

import os
import sys
import time

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

    SDS = jax.ShapeDtypeStruct
    i32, i16, f32 = jnp.int32, jnp.int16, jnp.float32

    def wl_case(K, ng, NW, L, R, num_groups, packed, contig=40):
        kb = K * SUBLANES
        Tp = -(-(SUBLANES * NW * L) // 4)
        ja_rows = (ng * Tp * 8) if packed else ng * kb

        def fn(gids, sl, cnt, x, ja, as_):
            y = jnp.zeros((num_groups * SUBLANES, LANES), f32)
            b = DeviceSellBin(
                k=K, n_groups=ng, layout="wl", span=L,
                group_ids=gids, ja=ja, as_=as_, slab_list=sl,
                slab_count=cnt, contig_start=contig, chunk_k=NW,
                ja_packed=packed)
            return _bin_call(b, x, y, num_groups, False)

        avals = [SDS((ng,), i32), SDS((ng, SUBLANES * NW * 8), i32),
                 SDS((ng,), i32), SDS((R, LANES), f32),
                 SDS((ja_rows, LANES), i32 if packed else i32),
                 SDS((ng * kb, LANES), f32)]
        return fn, avals

    cases = [
        ("A-cube-K144-NW6-ng612-R5063-packed",
         wl_case(144, 612, 6, 3, 5063, 633, True, 20)),
        ("B-K168-NW7-ng16-R12923-packed",
         wl_case(168, 16, 7, 3, 12923, 1616, True)),
        ("C-K168-NW7-ng16-R12923-unpacked",
         wl_case(168, 16, 7, 3, 12923, 1616, False)),
        ("D-K168-NW7-ng528-R5063-packed",
         wl_case(168, 528, 7, 3, 5063, 1616, True)),
        ("E-K144-NW6-ng528-R12923-packed",
         wl_case(144, 528, 6, 3, 12923, 1616, True)),
        ("F-K192-NW8-ng528-R12923-packed",
         wl_case(192, 528, 8, 3, 12923, 1616, True)),
        ("G-K168-NW7-ng128-R12923-packed",
         wl_case(168, 128, 7, 3, 12923, 1616, True)),
        ("H-K168-NW7-ng528-R12923-ngroups633-packed",
         wl_case(168, 528, 7, 3, 12923, 633, True)),
    ]
    for name, (fn, avals) in cases:
        t0 = time.time()
        try:
            jax.jit(fn).lower(*avals).compile()
            print(f"[{name}] PASS ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] FAIL ({time.time()-t0:.0f}s): "
                  f"{type(e).__name__}: "
                  f"{str(e).splitlines()[0][:300]}", flush=True)


if __name__ == "__main__":
    main()
