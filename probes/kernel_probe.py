#!/usr/bin/env python
"""Kernel-variant throughput probe (TPU, round 2).

Answers: is the sb-major SpMV kernel compute-bound (gather passes / span) or
bandwidth-bound (8 B/nnz streamed)?  And which redesign wins:

  * span{S}_i32   — current sb-major structure: S masked gather passes per
                    (8,128) chunk, int32 JA, dynamic x-row reads.
  * span{S}_i16   — same but JA stored int16 (m | delta<<7), 6 B/nnz.
  * span8_w       — span 8, but a single dynamic-slice window read
                    W = x[qb:qb+8] then static row indexing (vs per-pass
                    dynamic row reads).
  * layered_i32   — NEW slab-aligned layout: sublane = slab delta, so ONE
                    take_along_axis per (8,128) tile (no mask, no passes).
  * layered_i8    — layered with JA storing only m as int8 (5 B/nnz).
  * stream2op     — load JA+AS, 2 vector ops: pure streaming ceiling.

Every variant is validated against numpy on the same data (checksum), then
timed with the LICM-proof chained timer. Prints one JSON line per variant.
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
        force_readback,
        time_device_fn_batched,
    )

    t0 = time.time()
    float(np.asarray(jnp.sum(jax.device_put(np.ones(1024, np.float32)))))
    log(f"warm-up {time.time()-t0:.0f}s")

    LANES, CK = 128, 8
    NCHUNKS = 64            # chunks per grid step -> (512,128) JA/AS blocks
    KB = NCHUNKS * CK       # 512
    NSTEPS = 256            # grid steps -> 16.78M entries, 128 MB @ 8B
    ENTRIES = NSTEPS * KB * LANES
    Rp = 2048               # x-table rows (1 MB f32)

    rng = np.random.default_rng(0)
    x_tab = rng.standard_normal((Rp, LANES), dtype=np.float32)

    def qb_for(span):
        return rng.integers(0, Rp - span, size=(NSTEPS, NCHUNKS)).astype(np.int32)

    def mk_data(span, qb):
        """ja[col] = 128*(qb + d) + m with d in [0,span)."""
        d = rng.integers(0, span, size=(NSTEPS, NCHUNKS, CK, LANES))
        m = rng.integers(0, LANES, size=(NSTEPS, NCHUNKS, CK, LANES))
        ja = ((qb[:, :, None, None] + d) * LANES + m).astype(np.int32)
        as_ = rng.standard_normal(ja.shape, dtype=np.float32)
        return ja.reshape(NSTEPS * KB, LANES), as_.reshape(NSTEPS * KB, LANES)

    def ref_sum(ja, as_):
        xf = x_tab.reshape(-1)
        return float((as_.astype(np.float64) * xf[ja].astype(np.float64)).sum())

    grid_spec = lambda ja_dt: pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NSTEPS,),
        in_specs=[
            pl.BlockSpec((Rp, LANES), lambda g, q: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, LANES), lambda g, q: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, LANES), lambda g, q: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CK, LANES), lambda g, q: (g, 0), memory_space=pltpu.VMEM),
    )

    CPARAMS = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=128 * 1024 * 1024,
    )

    def call(kernel, ja_dev, as_dev, qb_dev, x_dev):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec(ja_dev.dtype),
            out_shape=jax.ShapeDtypeStruct((NSTEPS * CK, LANES), jnp.float32),
            compiler_params=CPARAMS,
        )(qb_dev, x_dev, ja_dev, as_dev)

    # ---- kernel builders ----------------------------------------------------

    def k_span(span, i16):
        def kernel(qb_ref, x_ref, ja_ref, as_ref, y_ref):
            g = pl.program_id(0)

            def body(c, acc):
                tile = ja_ref[pl.ds(c * CK, CK), :]
                vals = as_ref[pl.ds(c * CK, CK), :]
                qb = qb_ref[g, c]
                if i16:
                    d = (tile >> 7).astype(jnp.int32)
                    m = (tile & (LANES - 1)).astype(jnp.int32)
                else:
                    d = (tile >> 7) - qb
                    m = tile & (LANES - 1)
                gath = jnp.zeros((CK, LANES), jnp.float32)
                for s in range(span):
                    xrow = x_ref[qb + s, :]
                    xb = jnp.broadcast_to(xrow[None, :], (CK, LANES))
                    gat = jnp.take_along_axis(xb, m, axis=1)
                    gath = gath + jnp.where(d == s, gat, 0)
                return acc + vals * gath

            y_ref[:] = jax.lax.fori_loop(
                0, NCHUNKS, body, jnp.zeros((CK, LANES), jnp.float32), unroll=1
            )

        return kernel

    def k_span_window(span):
        """span passes but one dynamic-slice window read per chunk."""
        def kernel(qb_ref, x_ref, ja_ref, as_ref, y_ref):
            g = pl.program_id(0)

            def body(c, acc):
                tile = ja_ref[pl.ds(c * CK, CK), :]
                vals = as_ref[pl.ds(c * CK, CK), :]
                qb = qb_ref[g, c]
                d = (tile >> 7) - qb
                m = tile & (LANES - 1)
                W = x_ref[pl.ds(qb, span), :]
                gath = jnp.zeros((CK, LANES), jnp.float32)
                for s in range(span):
                    xb = jnp.broadcast_to(W[s][None, :], (CK, LANES))
                    gat = jnp.take_along_axis(xb, m, axis=1)
                    gath = gath + jnp.where(d == s, gat, 0)
                return acc + vals * gath

            y_ref[:] = jax.lax.fori_loop(
                0, NCHUNKS, body, jnp.zeros((CK, LANES), jnp.float32), unroll=1
            )

        return kernel

    def k_layered(m_only):
        """sublane = slab delta: ONE gather per (8,128) tile."""
        def kernel(qb_ref, x_ref, ja_ref, as_ref, y_ref):
            g = pl.program_id(0)

            def body(c, acc):
                tile = ja_ref[pl.ds(c * CK, CK), :]
                vals = as_ref[pl.ds(c * CK, CK), :]
                qb = qb_ref[g, c]
                m = tile.astype(jnp.int32) if m_only else (tile & (LANES - 1))
                W = x_ref[pl.ds(qb, CK), :]
                gat = jnp.take_along_axis(W, m, axis=1)
                return acc + vals * gat

            y_ref[:] = jax.lax.fori_loop(
                0, NCHUNKS, body, jnp.zeros((CK, LANES), jnp.float32), unroll=1
            )

        return kernel

    def k_stream():
        def kernel(qb_ref, x_ref, ja_ref, as_ref, y_ref):
            def body(c, acc):
                tile = ja_ref[pl.ds(c * CK, CK), :]
                vals = as_ref[pl.ds(c * CK, CK), :]
                return acc + vals * tile.astype(jnp.float32)

            y_ref[:] = jax.lax.fori_loop(
                0, NCHUNKS, body, jnp.zeros((CK, LANES), jnp.float32), unroll=1
            )

        return kernel

    # ---- run matrix ---------------------------------------------------------

    x_dev = jax.device_put(jnp.asarray(x_tab))
    results = []

    def run(name, kernel, ja, as_, qb, check, bytes_per_entry):
        try:
            ja_dev = jax.device_put(jnp.asarray(ja))
            as_dev = jax.device_put(jnp.asarray(as_))
            qb_dev = jax.device_put(jnp.asarray(qb))
            fn = functools.partial(call, kernel)
            jfn = jax.jit(fn)
            t0 = time.time()
            y = np.asarray(jfn(ja_dev, as_dev, qb_dev, x_dev), np.float64)
            compile_s = time.time() - t0
            got = float(y.sum())
            rel = abs(got - check) / max(abs(check), 1e-30) if check is not None else 0.0
            sec, _ = time_device_fn_batched(
                jfn, ja_dev, as_dev, qb_dev, x_dev, reps=64, rounds=2
            )
            row = {
                "variant": name,
                "ms": round(sec * 1e3, 4),
                "gnnz_s": round(ENTRIES / sec / 1e9, 3),
                "gflops": round(2 * ENTRIES / sec / 1e9, 2),
                "GBps": round(bytes_per_entry * ENTRIES / sec / 1e9, 1),
                "rel_err": rel,
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            row = {"variant": name, "error": f"{type(e).__name__}: {e}"[:300]}
        results.append(row)
        print(json.dumps(row), flush=True)

    # streaming ceiling
    qb0 = qb_for(1)
    ja0, as0 = mk_data(1, qb0)
    run("stream2op", k_stream(), ja0, as0, qb0, None, 8)

    for span in (1, 2, 4, 8, 16, 24, 32):
        qb = qb_for(span)
        ja, as_ = mk_data(span, qb)
        chk = ref_sum(ja, as_)
        run(f"span{span}_i32", k_span(span, False), ja, as_, qb, chk, 8)
        if span in (4, 8, 16, 24):
            # int16 JA: store (delta<<7)|m relative to qb
            d = (ja.reshape(NSTEPS, NCHUNKS, CK, LANES) >> 7) - qb[:, :, None, None]
            m = ja & (LANES - 1)
            ja16 = ((d.reshape(ja.shape) << 7) | m).astype(np.int16)
            run(f"span{span}_i16", k_span(span, True), ja16, as_, qb, chk, 6)
        if span == 8:
            run("span8_w", k_span_window(8), ja, as_, qb, chk, 8)

    # layered: d must equal the sublane index within the chunk
    qb = qb_for(CK)
    d = np.broadcast_to(
        np.arange(CK)[None, None, :, None], (NSTEPS, NCHUNKS, CK, LANES)
    )
    m = rng.integers(0, LANES, size=(NSTEPS, NCHUNKS, CK, LANES))
    ja = ((qb[:, :, None, None] + d) * LANES + m).astype(np.int32)
    as_ = rng.standard_normal(ja.shape, dtype=np.float32)
    ja = ja.reshape(NSTEPS * KB, LANES)
    as_ = as_.reshape(NSTEPS * KB, LANES)
    chk = ref_sum(ja, as_)
    run("layered_i32", k_layered(False), ja, as_, qb, chk, 8)
    m8 = (ja & (LANES - 1)).astype(np.int8)
    run("layered_i8", k_layered(True), m8, as_, qb, chk, 5)
    m16 = (ja & (LANES - 1)).astype(np.int16)
    run("layered_i16", k_layered(True), m16, as_, qb, chk, 6)

    log(f"total {time.time()-t0:.0f}s")
    with open("/root/repo/probes/kernel_probe.out.json", "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
