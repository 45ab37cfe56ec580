#!/usr/bin/env python
"""Bandwidth experiment matrix — verify or break the "~100 GB/s Pallas cap".

Round-1 probes measured XLA streaming ~490 GB/s vs Pallas ~100 GB/s on this
runtime (docs/DESIGN.md). Those numbers were taken with the pre-fix batched
timer whose scan body was hoistable (VERDICT.md weak #2): XLA reductions were
trivially LICM-hoistable (inflating XLA numbers up to reps x), while opaque
pallas_calls likely were not. This probe re-measures everything with the
LICM-proof timer (utils/timing.py) and explores the Pallas configuration
space the verdict asked for:

  * grid-pipelined reads at several block sizes
  * two-stream reads (the JA+AS shape)
  * read+write (copy)
  * manual double-buffered make_async_copy from an HBM ref
  * dimension_semantics parallel vs arbitrary
  * a miniature of the flagship kernel (VMEM x-table + decode + slab passes)
    with ablations: no-compute, no-alias, packed-16-bit indices
  * launch overhead, int16/int8 load feasibility

Every kernel folds a small ``seed`` input into its output so the chained
timer's carry perturbation reaches the kernel's own inputs (otherwise the
kernel itself would be loop-invariant and hoistable).

Usage: python probes/bw_probe.py [--quick]   (run on the real TPU)
Writes one JSON line per probe to stdout and a summary table to stderr.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

sys.path.insert(0, "/root/repo")
from sparsematrixvectormultiplication_tpu.utils.timing import (  # noqa: E402
    force_readback,
    time_device_fn_batched,
)

LANES = 128
CP = functools.partial(
    pltpu.CompilerParams, vmem_limit_bytes=128 * 1024 * 1024
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def report(name, seconds, gbytes, extra=None):
    gbps = gbytes / seconds
    rec = {"probe": name, "seconds": round(seconds, 6),
           "gbytes": round(gbytes, 4), "GBps": round(gbps, 2)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    log(f"{name:42s} {gbps:8.1f} GB/s   ({seconds*1e3:.3f} ms for {gbytes:.2f} GB)")
    return gbps


# ---------------------------------------------------------------------------
# probe kernels
# ---------------------------------------------------------------------------


def pallas_read(nrows, bk, semantics="arbitrary"):
    """Grid-pipelined read of (nrows,128) f32; accum into (8,128)."""

    def kernel(buf_ref, seed_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = seed_ref[:]

        out_ref[:] += buf_ref[0:8, :]

    def fn(buf, seed):
        return pl.pallas_call(
            kernel,
            grid=(nrows // bk,),
            in_specs=[
                pl.BlockSpec((bk, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
            compiler_params=CP(dimension_semantics=(semantics,)),
        )(buf, seed)

    return fn


def pallas_read2(nrows, bk):
    """Two-stream read: f32 values + int32 indices (the JA+AS shape)."""

    def kernel(as_ref, ja_ref, seed_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = seed_ref[:]

        out_ref[:] += as_ref[0:8, :] + ja_ref[0:8, :].astype(jnp.float32)

    def fn(as_, ja, seed):
        return pl.pallas_call(
            kernel,
            grid=(nrows // bk,),
            in_specs=[
                pl.BlockSpec((bk, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
            compiler_params=CP(dimension_semantics=("arbitrary",)),
        )(as_, ja, seed)

    return fn


def pallas_copy(nrows, bk):
    def kernel(buf_ref, seed_ref, out_ref):
        out_ref[:] = buf_ref[:] + seed_ref[0, 0]

    def fn(buf, seed):
        return pl.pallas_call(
            kernel,
            grid=(nrows // bk,),
            in_specs=[
                pl.BlockSpec((bk, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bk, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
            compiler_params=CP(dimension_semantics=("arbitrary",)),
        )(buf, seed)

    return fn


def pallas_manual_dma(nrows, chunk_rows, nbuf=2):
    """Whole input stays in HBM; kernel double-buffers make_async_copy."""
    nchunks = nrows // chunk_rows

    def kernel(buf_hbm, seed_ref, out_ref):
        def body(scratch, sems):
            def get_dma(slot, ci):
                return pltpu.make_async_copy(
                    buf_hbm.at[pl.ds(ci * chunk_rows, chunk_rows), :],
                    scratch.at[slot],
                    sems.at[slot],
                )

            for w in range(min(nbuf, nchunks)):
                get_dma(w, w).start()

            out_ref[:] = seed_ref[:]

            def loop(ci, _):
                slot = ci % nbuf
                get_dma(slot, ci).wait()
                out_ref[:] += scratch[slot, 0:8, :]

                # refill the slot we just consumed (up to nbuf-deep pipeline)
                @pl.when(ci + nbuf < nchunks)
                def _():
                    get_dma(slot, ci + nbuf).start()

                return 0

            jax.lax.fori_loop(0, nchunks, loop, 0)

        pl.run_scoped(
            body,
            pltpu.VMEM((nbuf, chunk_rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        )

    def fn(buf, seed):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
            compiler_params=CP(),
        )(buf, seed)

    return fn


def pallas_kernelsim(n_groups, k, xrows, span=4, compute=True, packed=False,
                     g_per=8):
    """Miniature flagship kernel: resident x-table + JA/AS streams + per-chunk
    decode + ``span`` slab gather passes + per-group (8,128) y tiles.

    packed=True reads 16-bit codes packed two-chunks-per-int32 (half JA bytes).
    """
    nchunks = k // 8
    KB = k * 8 * g_per
    ja_rows_per_group = (k * 8 // 2) if packed else k * 8
    JB = ja_rows_per_group * g_per

    def kernel(qb_ref, x_ref, ja_ref, as_ref, seed_ref, out_ref):
        step = pl.program_id(0)
        rows = []
        for gi in range(g_per):
            g = step * g_per + gi
            for sb in range(8):
                acc = jnp.zeros((8, LANES), jnp.float32)
                for c in range(nchunks):
                    off = gi * k * 8 + sb * k + c * 8
                    vals = as_ref[pl.ds(off, 8), :]
                    if not compute:
                        joff = (off // 2) if packed else off
                        acc = acc + vals + ja_ref[pl.ds(joff, 8), :].astype(jnp.float32)[0:8]
                        continue
                    if packed:
                        # two chunks share one int32 tile; this is chunk c's half
                        joff = gi * ja_rows_per_group + sb * (k // 2) + (c // 2) * 8
                        t = ja_ref[pl.ds(joff, 8), :]
                        code = (t & 0xFFFF) if c % 2 == 0 else ((t >> 16) & 0xFFFF)
                    else:
                        joff = gi * k * 8 + sb * k + c * 8
                        code = ja_ref[pl.ds(joff, 8), :]
                    sel = code >> 7
                    m = code & (LANES - 1)
                    qb = qb_ref[g, sb * nchunks + c]
                    gath = jnp.zeros((8, LANES), jnp.float32)
                    for s in range(span):
                        xrow = x_ref[qb + s, :]
                        xb = jnp.broadcast_to(xrow[None, :], (8, LANES))
                        gat = jnp.take_along_axis(xb, m, axis=1)
                        gath = gath + jnp.where(sel == s, gat, 0)
                    acc = acc + vals * gath
                rows.append(jnp.sum(acc, axis=0))
        out_ref[:] = jnp.stack(rows) + seed_ref[0, 0]

    def fn(qb, x, ja, as_, seed):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_groups // g_per,),
                in_specs=[
                    pl.BlockSpec((xrows, LANES), lambda i, r: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((JB, LANES), lambda i, r: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((KB, LANES), lambda i, r: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, LANES), lambda i, r: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (8 * g_per, LANES), lambda i, r: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((n_groups * 8, LANES), jnp.float32),
            compiler_params=CP(dimension_semantics=("arbitrary",)),
        )(qb, x, ja, as_, seed)

    return fn, JB


def int_load_probe(dtype, sub):
    """Feasibility: load a small int8/int16 tile and widen to f32."""

    def kernel(t_ref, seed_ref, out_ref):
        out_ref[:] = t_ref[:].astype(jnp.float32)[0:8, :] + seed_ref[:]

    def fn(t, seed):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
            compiler_params=CP(),
        )(t, seed)

    return fn


# ---------------------------------------------------------------------------


def main():
    quick = "--quick" in sys.argv
    t0 = time.time()
    # transfer warm-up (first H2D stalls minutes)
    float(np.asarray(jnp.sum(jax.device_put(np.ones(1024, np.float32)))))
    log(f"warm-up: {time.time()-t0:.0f}s; devices={jax.devices()}")

    NR = (1 << 19) if quick else (1 << 20)  # rows of 128 f32 = 256MB / 512MB
    GB = NR * LANES * 4 / 1e9
    reps, rounds = (4, 2) if quick else (8, 2)

    buf = jax.jit(lambda: jnp.ones((NR, LANES), jnp.float32))()
    ja = jax.jit(lambda: jnp.zeros((NR, LANES), jnp.int32))()
    seed = jax.jit(lambda: jnp.zeros((8, LANES), jnp.float32))()
    seedv = jax.jit(lambda: jnp.zeros((LANES,), jnp.float32))()

    tdf = functools.partial(time_device_fn_batched, reps=reps, rounds=rounds)

    def run_probe(name, fn, args, gb, extra=None):
        try:
            t_c = time.time()
            sec, _ = tdf(fn, *args)
            return report(name, sec, gb,
                          {**(extra or {}), "compile_s": round(time.time() - t_c, 1)})
        except Exception as e:  # noqa: BLE001
            log(f"{name:42s} FAIL {type(e).__name__}: {str(e)[:300]}")
            print(json.dumps({"probe": name, "error": type(e).__name__}), flush=True)
            return 0.0

    # --- XLA baselines (now LICM-proof) ---
    def xla_sum(b, s):
        return jnp.sum((b + s[0]) * 1.0000001, axis=0)

    run_probe("xla_sum_read", xla_sum, (buf, seedv), GB)

    def xla_copy(b, s):
        return b * 1.0000001 + s[0]

    run_probe("xla_copy_rw", xla_copy, (buf, seedv), 2 * GB)

    # --- Pallas grid reads ---
    for bk in ([2048] if quick else [512, 2048, 8192, 32768]):
        run_probe(f"pallas_read_bk{bk}", pallas_read(NR, bk), (buf, seed), GB,
                  {"block_mb": bk * LANES * 4 / 2**20})

    run_probe("pallas_read_bk2048_parallel",
              pallas_read(NR, 2048, semantics="parallel"), (buf, seed), GB)

    # --- two streams ---
    run_probe("pallas_read2_bk2048", pallas_read2(NR // 2, 2048),
              (buf[: NR // 2], ja[: NR // 2], seed), GB)

    # --- copy ---
    run_probe("pallas_copy_bk2048", pallas_copy(NR // 2, 2048),
              (buf[: NR // 2], seed), GB)

    # --- manual DMA ---
    for ch, nb in ([(4096, 2)] if quick else [(2048, 2), (4096, 2), (16384, 2), (4096, 3)]):
        run_probe(f"pallas_manualdma_ch{ch}_nb{nb}", pallas_manual_dma(NR, ch, nb),
                  (buf, seed), GB, {"chunk_mb": ch * LANES * 4 / 2**20})

    # --- kernel sim (flagship miniature) ---
    NG = 120 if quick else 240  # groups; K=64 -> 240*64*1024*8B = 126MB streamed
    K = 64
    XR = 2048  # 1MB x-table (quick) — small; realism probe below uses 8MB
    nch = K // 8
    qb = jax.jit(lambda: jnp.zeros((NG, 8 * nch), jnp.int32))()
    x = jax.jit(lambda: jnp.ones((XR, LANES), jnp.float32))()
    asb = jax.jit(lambda: jnp.ones((NG * K * 8, LANES), jnp.float32))()
    jab = jax.jit(lambda: jnp.zeros((NG * K * 8, LANES), jnp.int32))()
    japk = jax.jit(lambda: jnp.zeros((NG * K * 8 // 2, LANES), jnp.int32))()
    gb_full = (asb.size * 4 + jab.size * 4) / 1e9
    gb_pack = (asb.size * 4 + japk.size * 4) / 1e9

    nnz = NG * K * 1024
    for name, kwargs, jbuf, gb in [
        ("kernelsim_span4", dict(span=4, compute=True, packed=False), jab, gb_full),
        ("kernelsim_nocompute", dict(span=4, compute=False, packed=False), jab, gb_full),
        ("kernelsim_span4_packed16", dict(span=4, compute=True, packed=True), japk, gb_pack),
        ("kernelsim_span1", dict(span=1, compute=True, packed=False), jab, gb_full),
        ("kernelsim_span8", dict(span=8, compute=True, packed=False), jab, gb_full),
    ]:
        if quick and name not in ("kernelsim_span4", "kernelsim_span4_packed16"):
            continue
        fn, _ = pallas_kernelsim(NG, K, XR, g_per=8, **kwargs)
        run_probe(name, fn, (qb, x, jbuf, asb, seed), gb,
                  {"gflops_at_100pct": round(2 * nnz / 1e9, 2)})

    # g_per ablation
    if not quick:
        for gp in (1, 4, 16):
            if NG % gp:
                continue
            fn, _ = pallas_kernelsim(NG, K, XR, span=4, g_per=gp)
            run_probe(f"kernelsim_span4_gper{gp}", fn, (qb, x, jab, asb, seed), gb_full)
        # big x-table realism: 16384x128 = 8MB resident
        xbig = jax.jit(lambda: jnp.ones((16384, LANES), jnp.float32))()
        fn, _ = pallas_kernelsim(NG, K, 16384, span=4, g_per=8)
        run_probe("kernelsim_span4_xtab8mb", fn, (qb, xbig, jab, asb, seed), gb_full)

    # --- launch overhead ---
    tiny = pallas_read(64, 64)
    tb = jax.jit(lambda: jnp.ones((64, LANES), jnp.float32))()
    try:
        sec, _ = time_device_fn_batched(tiny, tb, seed, reps=100, rounds=2)
        report("launch_overhead", sec, 64 * LANES * 4 / 1e9, {"us_per_launch": sec * 1e6})
    except Exception as e:  # noqa: BLE001
        log(f"launch_overhead FAIL {e}")

    # --- narrow int loads ---
    for dt, sub, nm in [(jnp.int16, 16, "int16"), (jnp.int8, 32, "int8")]:
        try:
            t = jax.jit(lambda dt=dt, sub=sub: jnp.zeros((sub, LANES), dt))()
            fn = int_load_probe(dt, sub)
            force_readback(fn(t, seed))
            log(f"{nm} load+widen: OK")
            print(json.dumps({"probe": f"{nm}_load", "ok": True}), flush=True)
        except Exception as e:  # noqa: BLE001
            log(f"{nm} load+widen: FAIL {type(e).__name__}: {str(e)[:200]}")
            print(json.dumps({"probe": f"{nm}_load", "ok": False}), flush=True)

    log(f"total {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
