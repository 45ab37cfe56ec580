#!/usr/bin/env python
"""Probe 5: isolate the per-pass primitive costs that price the kernels.

Questions (post no-clamp sb-list):
  1. cost of one masked gather pass, sb-major style (qb+s static offsets)
  2. cost of one masked gather pass, sb-list style (scalar list read per pass)
  3. cost of the WL inner loop: W = stack of 8 dynamically-read x rows
     (list-driven), then ONE take_along_axis per layer tile — at L=1,2,4
     layers per window (amortizing the W build)
All at KB=512 blocks, 64 chunks/step, 16.8M entries, fully unrolled.
"""

import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, "/root/repo")
    from sparsematrixvectormultiplication_tpu.utils.timing import (
        time_device_fn_batched,
    )

    t0 = time.time()
    float(np.asarray(jnp.sum(jax.device_put(np.ones(1024, np.float32)))))
    log(f"warm-up {time.time()-t0:.0f}s")

    LANES, CK = 128, 8
    KB = 512
    NSTEPS = 256
    ENTRIES = NSTEPS * KB * LANES
    Rp = 2048
    NCH = KB // CK

    rng = np.random.default_rng(0)
    x_tab = rng.standard_normal((Rp, LANES), dtype=np.float32)
    x_dev = jax.device_put(jnp.asarray(x_tab))

    CPARAMS = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=128 * 1024 * 1024,
    )

    def call(kernel, lst_w, ja_dev, as_dev, lst_dev, x_dev):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NSTEPS,),
            in_specs=[
                pl.BlockSpec((Rp, LANES), lambda g, q: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((KB, LANES), lambda g, q: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((KB, LANES), lambda g, q: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CK, LANES), lambda g, q: (g, 0), memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((NSTEPS * CK, LANES), jnp.float32),
            compiler_params=CPARAMS,
        )(lst_dev, x_dev, ja_dev, as_dev)

    def k_sbmajor(span):
        def kernel(lst_ref, x_ref, ja_ref, as_ref, y_ref):
            g = pl.program_id(0)
            acc = jnp.zeros((CK, LANES), jnp.float32)
            for c in range(NCH):
                tile = ja_ref[c * CK : (c + 1) * CK, :]
                vals = as_ref[c * CK : (c + 1) * CK, :]
                qb = lst_ref[g, c * span]  # one scalar per chunk
                d = (tile >> 7) - qb
                m = tile & (LANES - 1)
                gath = jnp.zeros((CK, LANES), jnp.float32)
                for s in range(span):
                    xb = jnp.broadcast_to(x_ref[qb + s, :][None, :], (CK, LANES))
                    gath = gath + jnp.where(d == s, jnp.take_along_axis(xb, m, axis=1), 0)
                acc = acc + vals * gath
            y_ref[:] = acc

        return kernel

    def k_sblist(span):
        def kernel(lst_ref, x_ref, ja_ref, as_ref, y_ref):
            g = pl.program_id(0)
            acc = jnp.zeros((CK, LANES), jnp.float32)
            for c in range(NCH):
                tile = ja_ref[c * CK : (c + 1) * CK, :]
                vals = as_ref[c * CK : (c + 1) * CK, :]
                q = tile >> 7
                m = tile & (LANES - 1)
                gath = jnp.zeros((CK, LANES), jnp.float32)
                for s in range(span):
                    sq = lst_ref[g, c * span + s]  # scalar read PER PASS
                    xb = jnp.broadcast_to(x_ref[sq, :][None, :], (CK, LANES))
                    gath = gath + jnp.where(q == sq, jnp.take_along_axis(xb, m, axis=1), 0)
                acc = acc + vals * gath
            y_ref[:] = acc

        return kernel

    def k_wl(L):
        """window-layered: per window of L layer-tiles, build W (8 dynamic
        list-driven rows), one gather per layer tile. Chunks here = layer
        tiles; windows = NCH // L."""
        assert NCH % L == 0
        nwin = NCH // L

        def kernel(lst_ref, x_ref, ja_ref, as_ref, y_ref):
            g = pl.program_id(0)
            acc = jnp.zeros((CK, LANES), jnp.float32)
            for w in range(nwin):
                rows = [x_ref[lst_ref[g, w * 8 + s], :] for s in range(8)]
                W = jnp.stack(rows)
                for l in range(L):
                    c = w * L + l
                    m = ja_ref[c * CK : (c + 1) * CK, :]  # m stored directly
                    vals = as_ref[c * CK : (c + 1) * CK, :]
                    acc = acc + vals * jnp.take_along_axis(W, m, axis=1)
            y_ref[:] = acc

        return kernel

    results = []

    def run(name, kernel, ja, as_, lst, check, lst_w):
        try:
            ja_dev = jax.device_put(jnp.asarray(ja))
            as_dev = jax.device_put(jnp.asarray(as_))
            lst_dev = jax.device_put(jnp.asarray(lst))
            jfn = jax.jit(functools.partial(call, kernel, lst_w))
            t0 = time.time()
            y = np.asarray(jfn(ja_dev, as_dev, lst_dev, x_dev), np.float64)
            compile_s = time.time() - t0
            got = float(y.sum())
            rel = abs(got - check) / max(abs(check), 1e-30) if check is not None else 0.0
            sec, _ = time_device_fn_batched(
                jfn, ja_dev, as_dev, lst_dev, x_dev, reps=64, rounds=2
            )
            row = {"variant": name, "ms": round(sec * 1e3, 4),
                   "gnnz_s": round(ENTRIES / sec / 1e9, 3),
                   "ns_per_chunk": round(sec / (NSTEPS * NCH) * 1e9, 2),
                   "rel_err": rel, "compile_s": round(compile_s, 1)}
        except Exception as e:
            row = {"variant": name, "error": f"{type(e).__name__}: {e}"[:200]}
        results.append(row)
        print(json.dumps(row), flush=True)

    xf = x_tab.reshape(-1)

    # sb-major / sb-list shapes at spans 2,4,8
    for span in (2, 4, 8):
        qb = rng.integers(0, Rp - span, size=(NSTEPS, NCH)).astype(np.int32)
        d = rng.integers(0, span, size=(NSTEPS, NCH, CK, LANES))
        m = rng.integers(0, LANES, size=(NSTEPS, NCH, CK, LANES))
        ja = ((qb[:, :, None, None] + d) * LANES + m).astype(np.int32)
        as_ = rng.standard_normal(ja.shape, dtype=np.float32)
        chk = float((as_.astype(np.float64)
                     * xf[ja].astype(np.float64)).sum())
        ja2 = ja.reshape(NSTEPS * KB, LANES)
        as2 = as_.reshape(NSTEPS * KB, LANES)
        # sb-major: lst[g, c*span] = qb
        lst_sb = np.zeros((NSTEPS, NCH * span), np.int32)
        lst_sb[:, ::span] = qb
        run(f"sbmajor_s{span}", k_sbmajor(span), ja2, as2, lst_sb, chk, span)
        # sb-list: per-chunk DISTINCT list = qb..qb+span-1 (same data)
        lst_sl = (qb[:, :, None] + np.arange(span)[None, None, :]).reshape(
            NSTEPS, NCH * span).astype(np.int32)
        run(f"sblist_s{span}", k_sblist(span), ja2, as2, lst_sl, chk, span)

    # WL at L = 1, 2, 4: slabs per window are 8 ARBITRARY rows; entries'
    # sublane = slot
    for L in (1, 2, 4):
        nwin = NCH // L
        slabs = rng.integers(0, Rp, size=(NSTEPS, nwin, 8)).astype(np.int32)
        m = rng.integers(0, LANES, size=(NSTEPS, nwin, L, CK, LANES)).astype(np.int32)
        as_ = rng.standard_normal(m.shape, dtype=np.float32)
        # checksum: entry at (win w, layer l, slot s, lane j) reads
        # x[slabs[w,s]*128 + m]
        cols = slabs[:, :, None, :, None] * LANES + m
        chk = float((as_.astype(np.float64) * xf[cols].astype(np.float64)).sum())
        run(f"wl_L{L}", k_wl(L),
            m.reshape(NSTEPS * KB, LANES), as_.reshape(NSTEPS * KB, LANES),
            slabs.reshape(NSTEPS, nwin * 8), chk, 8)

    with open("/root/repo/probes/kernel_probe5.out.json", "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
