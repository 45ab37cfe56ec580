#!/usr/bin/env python
"""Probe 4: single-stream vs two-stream DMA — can the kernel beat 233 GB/s?

Round-1 bw_probe reported ~584 GB/s for single-stream Pallas grid reads;
probe 3 found the two-stream (JA+AS) floor stuck at ~233 GB/s aggregate for
every block size. If single-stream is really 2.5x faster, a fused layout
(JA block and bitcast-AS block inside ONE buffer) should recover it.

Variants (1 GB total read unless noted):
  read1_kb{2048,8192,32768} — ONE input stream, +1 op (the 584 claim)
  read2_kb8192              — two input streams (the 233 floor)
  read1_half_x2             — two chained pallas_calls, each one stream
  fused_pure_kb8192         — one buffer, alternating KB-row ja/as halves,
                              minimal compute (int add)
  fused_gather_kb8192       — fused buffer + real gather + fma (the
                              candidate production layout)
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
    TOT = 1 << 21            # rows: 2M x 128 x 4B = 1.07 GB per stream
    Rp = 2048

    rng = np.random.default_rng(0)
    x_tab = rng.standard_normal((Rp, LANES), dtype=np.float32)
    x_dev = jax.device_put(jnp.asarray(x_tab))

    CPARAMS = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=128 * 1024 * 1024,
    )

    results = []

    def run(name, fn, args, gbytes):
        try:
            jfn = jax.jit(fn)
            t0 = time.time()
            np.asarray(jfn(*args))
            compile_s = time.time() - t0
            sec, _ = time_device_fn_batched(jfn, *args, reps=32, rounds=2)
            row = {"variant": name, "ms": round(sec * 1e3, 4),
                   "GBps": round(gbytes / sec, 1), "compile_s": round(compile_s, 1)}
        except Exception as e:
            row = {"variant": name, "error": f"{type(e).__name__}: {e}"[:200]}
        results.append(row)
        print(json.dumps(row), flush=True)

    # ---- read1: one stream ----
    def mk_read1(KB, rows):
        def kernel(a_ref, y_ref):
            acc = jnp.zeros((8, LANES), jnp.float32)
            for c in range(KB // CK):
                acc = acc + a_ref[c * CK : (c + 1) * CK, :].reshape(1, CK, LANES).sum(axis=1)
            y_ref[:] = acc

        def fn(a):
            return pl.pallas_call(
                kernel,
                grid=(rows // KB,),
                in_specs=[pl.BlockSpec((KB, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, LANES), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
                compiler_params=CPARAMS,
            )(a)

        return fn

    A = jax.device_put(jnp.asarray(rng.standard_normal((TOT, LANES), dtype=np.float32)))
    B = jax.device_put(jnp.asarray(rng.standard_normal((TOT, LANES), dtype=np.float32)))
    GB1 = TOT * LANES * 4 / 1e9

    for KB in (2048, 8192, 32768):
        run(f"read1_kb{KB}", mk_read1(KB, TOT), (A,), GB1)

    # ---- read2: two streams ----
    def mk_read2(KB, rows):
        def kernel(a_ref, b_ref, y_ref):
            acc = jnp.zeros((8, LANES), jnp.float32)
            for c in range(KB // CK):
                acc = acc + (a_ref[c * CK : (c + 1) * CK, :]
                             + b_ref[c * CK : (c + 1) * CK, :]).reshape(1, CK, LANES).sum(axis=1)
            y_ref[:] = acc

        def fn(a, b):
            return pl.pallas_call(
                kernel,
                grid=(rows // KB,),
                in_specs=[
                    pl.BlockSpec((KB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((KB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, LANES), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
                compiler_params=CPARAMS,
            )(a, b)

        return fn

    run("read2_kb8192", mk_read2(8192, TOT), (A, B), 2 * GB1)

    # ---- two chained single-stream calls ----
    r1 = mk_read1(8192, TOT)

    def two_calls(a, b):
        return r1(a) + r1(b)

    run("read1_half_x2", two_calls, (A, B), 2 * GB1)

    # ---- fused: one buffer, ja-half then as-half per step ----
    def mk_fused_pure(KB, rows2):
        def kernel(f_ref, y_ref):
            acc = jnp.zeros((8, LANES), jnp.int32)
            for c in range(KB // CK):
                ja = f_ref[c * CK : (c + 1) * CK, :]
                as_ = f_ref[KB + c * CK : KB + (c + 1) * CK, :]
                acc = acc + (ja + as_).reshape(1, CK, LANES).sum(axis=1)
            y_ref[:] = acc.astype(jnp.float32)

        def fn(f):
            return pl.pallas_call(
                kernel,
                grid=(rows2 // (2 * KB),),
                in_specs=[pl.BlockSpec((2 * KB, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, LANES), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
                compiler_params=CPARAMS,
            )(f)

        return fn

    KB = 8192
    ja = rng.integers(0, Rp * LANES, size=(TOT, LANES)).astype(np.int32)
    as_ = rng.standard_normal((TOT, LANES), dtype=np.float32)
    nblk = TOT // KB
    fused = np.empty((2 * TOT, LANES), np.int32)
    for b in range(nblk):
        fused[2 * b * KB : (2 * b + 1) * KB] = ja[b * KB : (b + 1) * KB]
        fused[(2 * b + 1) * KB : (2 * b + 2) * KB] = (
            as_[b * KB : (b + 1) * KB].view(np.int32)
        )
    F = jax.device_put(jnp.asarray(fused))
    run("fused_pure_kb8192", mk_fused_pure(KB, 2 * TOT), (F,), 2 * GB1)

    # ---- fused + real gather + fma ----
    def mk_fused_gather(KB, rows2):
        def kernel(qb_ref, x_ref, f_ref, y_ref):
            g = pl.program_id(0)
            acc = jnp.zeros((8, LANES), jnp.float32)
            for c in range(KB // CK):
                tile = f_ref[c * CK : (c + 1) * CK, :]
                vals = jax.lax.bitcast_convert_type(
                    f_ref[KB + c * CK : KB + (c + 1) * CK, :], jnp.float32
                )
                m = tile & (LANES - 1)
                qb = qb_ref[g, c]
                xb = jnp.broadcast_to(x_ref[qb, :][None, :], (CK, LANES))
                acc = acc + vals * jnp.take_along_axis(xb, m, axis=1)
            y_ref[:] = acc

        def fn(qb, x, f):
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(rows2 // (2 * KB),),
                in_specs=[
                    pl.BlockSpec((Rp, LANES), lambda g, q: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2 * KB, LANES), lambda g, q: (g, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, LANES), lambda g, q: (g, 0),
                                       memory_space=pltpu.VMEM),
            )
            return pl.pallas_call(
                kernel,
                grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((rows2 // (2 * KB) * 8, LANES),
                                               jnp.float32),
                compiler_params=CPARAMS,
            )(qb, x, f)

        return fn

    qb = rng.integers(0, Rp, size=(nblk, KB // CK)).astype(np.int32)
    # rebuild fused with gatherable indices (d=0: slab == qb)
    ja_g = np.empty_like(ja)
    for b in range(nblk):
        for c in range(KB // CK):
            r0 = b * KB + c * CK
            m = rng.integers(0, LANES, size=(CK, LANES))
            ja_g[r0 : r0 + CK] = qb[b, c] * LANES + m
    fused2 = np.empty((2 * TOT, LANES), np.int32)
    for b in range(nblk):
        fused2[2 * b * KB : (2 * b + 1) * KB] = ja_g[b * KB : (b + 1) * KB]
        fused2[(2 * b + 1) * KB : (2 * b + 2) * KB] = (
            as_[b * KB : (b + 1) * KB].view(np.int32)
        )
    F2 = jax.device_put(jnp.asarray(fused2))
    qb_dev = jax.device_put(jnp.asarray(qb))
    run("fused_gather_kb8192",
        mk_fused_gather(KB, 2 * TOT), (qb_dev, x_dev, F2), 2 * GB1)

    # ---- span kernels: per-pass dynamic row read vs hoisted window --------
    KB = 512
    TOTS = 512 * 256  # 16.78M entries like probes 2/3
    ENT = TOTS * LANES

    def mk_span(span, hoist):
        nch = KB // CK

        def kernel(qb_ref, x_ref, ja_ref, as_ref, y_ref):
            g = pl.program_id(0)
            acc = jnp.zeros((8, LANES), jnp.float32)
            for c in range(nch):
                tile = ja_ref[c * CK : (c + 1) * CK, :]
                vals = as_ref[c * CK : (c + 1) * CK, :]
                qb = qb_ref[g, c]
                d = (tile >> 7) - qb
                m = tile & (LANES - 1)
                gath = jnp.zeros((CK, LANES), jnp.float32)
                if hoist:
                    W = x_ref[pl.ds(qb, span), :]
                    for s in range(span):
                        xb = jnp.broadcast_to(W[s][None, :], (CK, LANES))
                        gath = gath + jnp.where(
                            d == s, jnp.take_along_axis(xb, m, axis=1), 0)
                else:
                    for s in range(span):
                        xb = jnp.broadcast_to(x_ref[qb + s, :][None, :], (CK, LANES))
                        gath = gath + jnp.where(
                            d == s, jnp.take_along_axis(xb, m, axis=1), 0)
                acc = acc + vals * gath
            y_ref[:] = acc

        def fn(qb, x, ja, as_):
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(TOTS // KB,),
                in_specs=[
                    pl.BlockSpec((Rp, LANES), lambda g, q: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((KB, LANES), lambda g, q: (g, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((KB, LANES), lambda g, q: (g, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, LANES), lambda g, q: (g, 0),
                                       memory_space=pltpu.VMEM),
            )
            return pl.pallas_call(
                kernel,
                grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((TOTS // KB * 8, LANES), jnp.float32),
                compiler_params=CPARAMS,
            )(qb, x, ja, as_)

        return fn

    for span in (8, 16):
        nch = KB // CK
        nst = TOTS // KB
        qb2 = rng.integers(0, Rp - span, size=(nst, nch)).astype(np.int32)
        d = rng.integers(0, span, size=(nst, nch, CK, LANES))
        m = rng.integers(0, LANES, size=(nst, nch, CK, LANES))
        ja2 = ((qb2[:, :, None, None] + d) * LANES + m).astype(np.int32)
        av = rng.standard_normal(ja2.shape, dtype=np.float32)
        ja_dev = jax.device_put(jnp.asarray(ja2.reshape(TOTS, LANES)))
        as_dev = jax.device_put(jnp.asarray(av.reshape(TOTS, LANES)))
        qb_dev2 = jax.device_put(jnp.asarray(qb2))
        gbe = 8 * ENT / 1e9
        run(f"span{span}_base", mk_span(span, False),
            (qb_dev2, x_dev, ja_dev, as_dev), gbe)
        run(f"span{span}_hoist", mk_span(span, True),
            (qb_dev2, x_dev, ja_dev, as_dev), gbe)

    with open("/root/repo/probes/kernel_probe4.out.json", "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
