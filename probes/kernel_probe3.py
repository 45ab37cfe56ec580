#!/usr/bin/env python
"""Probe 3: raise the streaming floor.

Probe 2: fully-unrolled gather ≈ streaming floor, but the floor is only
~225 GB/s with 256 KB/stream/step blocks. Round-1 bw probes hit 584 GB/s
single-stream at ≥4 MB blocks. Sweep block sizes for the two-stream
(JA+AS) kernels and re-test int16 JA at the big-block floor.

Variants (KB = rows per grid-step block; per-stream block = KB*512 B):
  stream2_kb{512,2048,8192}     — two-stream load + fma floor
  stream_fused_kb{4096}         — JA and AS interleaved in ONE buffer
  gather_b_kb{2048,8192}        — gather at the bigger floor
  gatherb_i16_kb{8192}          — gather, int16 JA (6 B/nnz)
  span4_kb8192, span8_kb8192    — masked passes at the bigger floor
  span4_i16_kb8192              — passes + compression
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
    TOT_KB = 512 * 256          # total rows = 131072 -> 16.78M entries
    ENTRIES = TOT_KB * LANES
    Rp = 2048

    rng = np.random.default_rng(0)
    x_tab = rng.standard_normal((Rp, LANES), dtype=np.float32)
    x_dev = jax.device_put(jnp.asarray(x_tab))

    CPARAMS = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=128 * 1024 * 1024,
    )

    def call(kernel, KB, ja_dev, as_dev, qb_dev, x_dev, ja_rows=None):
        nsteps = TOT_KB // KB
        ja_kb = ja_rows if ja_rows is not None else KB
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((Rp, LANES), lambda g, q: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ja_kb, LANES), lambda g, q: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((KB, LANES), lambda g, q: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, LANES), lambda g, q: (g, 0), memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((nsteps * 8, LANES), jnp.float32),
            compiler_params=CPARAMS,
        )(qb_dev, x_dev, ja_dev, as_dev)

    def k_stream(KB):
        nch = KB // CK

        def kernel(qb_ref, x_ref, ja_ref, as_ref, y_ref):
            acc = jnp.zeros((8, LANES), jnp.float32)
            for c in range(nch):
                tile = ja_ref[c * CK : (c + 1) * CK, :]
                vals = as_ref[c * CK : (c + 1) * CK, :]
                acc = acc + vals * tile.astype(jnp.float32)
            y_ref[:] = acc

        return kernel

    def k_fused(KB):
        """single interleaved buffer: even chunks = JA bits, odd = AS"""
        nch = KB // CK

        def kernel(qb_ref, x_ref, ja_ref, as_ref, y_ref):
            acc = jnp.zeros((8, LANES), jnp.float32)
            for c in range(nch):
                tile = ja_ref[2 * c * CK : (2 * c + 1) * CK, :]
                vals = ja_ref[(2 * c + 1) * CK : (2 * c + 2) * CK, :]
                acc = acc + jax.lax.bitcast_convert_type(vals, jnp.float32) * tile.astype(jnp.float32)
            y_ref[:] = acc

        return kernel

    def k_gather(KB, i16):
        nch = KB // CK

        def kernel(qb_ref, x_ref, ja_ref, as_ref, y_ref):
            g = pl.program_id(0)
            acc = jnp.zeros((8, LANES), jnp.float32)
            for c in range(nch):
                tile = ja_ref[c * CK : (c + 1) * CK, :]
                if i16:
                    tile = tile.astype(jnp.int32)
                vals = as_ref[c * CK : (c + 1) * CK, :]
                m = tile & (LANES - 1)
                qb = qb_ref[g, c]
                xb = jnp.broadcast_to(x_ref[qb, :][None, :], (CK, LANES))
                acc = acc + vals * jnp.take_along_axis(xb, m, axis=1)
            y_ref[:] = acc

        return kernel

    def k_span(KB, span, i16):
        nch = KB // CK

        def kernel(qb_ref, x_ref, ja_ref, as_ref, y_ref):
            g = pl.program_id(0)
            acc = jnp.zeros((8, LANES), jnp.float32)
            for c in range(nch):
                tile = ja_ref[c * CK : (c + 1) * CK, :]
                if i16:
                    tile = tile.astype(jnp.int32)
                vals = as_ref[c * CK : (c + 1) * CK, :]
                qb = qb_ref[g, c]
                d = (tile >> 7) if i16 else ((tile >> 7) - qb)
                m = tile & (LANES - 1)
                gath = jnp.zeros((CK, LANES), jnp.float32)
                for s in range(span):
                    xb = jnp.broadcast_to(x_ref[qb + s, :][None, :], (CK, LANES))
                    gat = jnp.take_along_axis(xb, m, axis=1)
                    gath = gath + jnp.where(d == s, gat, 0)
                acc = acc + vals * gath
            y_ref[:] = acc

        return kernel

    def mk(span, KB):
        nch = KB // CK
        nsteps = TOT_KB // KB
        qb = rng.integers(0, Rp - max(span, 1), size=(nsteps, nch)).astype(np.int32)
        d = rng.integers(0, span, size=(nsteps, nch, CK, LANES))
        m = rng.integers(0, LANES, size=(nsteps, nch, CK, LANES))
        ja = ((qb[:, :, None, None] + d) * LANES + m).astype(np.int32)
        as_ = rng.standard_normal(ja.shape, dtype=np.float32)
        return qb, ja.reshape(TOT_KB, LANES), as_.reshape(TOT_KB, LANES)

    def ref_sum(ja, as_):
        xf = x_tab.reshape(-1)
        return float((as_.astype(np.float64) * xf[ja].astype(np.float64)).sum())

    results = []

    def run(name, kernel, KB, qb, ja, as_, check, bpe=8, ja_rows=None):
        try:
            ja_dev = jax.device_put(jnp.asarray(ja))
            as_dev = jax.device_put(jnp.asarray(as_))
            qb_dev = jax.device_put(jnp.asarray(qb))
            jfn = jax.jit(functools.partial(call, kernel, KB, ja_rows=ja_rows))
            t0 = time.time()
            y = np.asarray(jfn(ja_dev, as_dev, qb_dev, x_dev), np.float64)
            compile_s = time.time() - t0
            got = float(y.sum())
            rel = abs(got - check) / max(abs(check), 1e-30) if check is not None else 0.0
            sec, _ = time_device_fn_batched(
                jfn, ja_dev, as_dev, qb_dev, x_dev, reps=64, rounds=2
            )
            row = {"variant": name, "ms": round(sec * 1e3, 4),
                   "gnnz_s": round(ENTRIES / sec / 1e9, 3),
                   "GBps": round(bpe * ENTRIES / sec / 1e9, 1),
                   "rel_err": rel, "compile_s": round(compile_s, 1)}
        except Exception as e:
            row = {"variant": name, "error": f"{type(e).__name__}: {e}"[:200]}
        results.append(row)
        print(json.dumps(row), flush=True)

    for KB in (512, 2048, 8192):
        qb, ja, as_ = mk(1, KB)
        run(f"stream2_kb{KB}", k_stream(KB), KB, qb, ja, as_, None)

    # fused single stream: interleave CK-row JA / AS blocks in one buffer
    KB = 4096
    qb, ja, as_ = mk(1, KB)
    nch = TOT_KB // CK
    jai = ja.reshape(nch, CK, LANES)
    asi = as_.reshape(nch, CK, LANES)
    fused = np.empty((nch * 2, CK, LANES), np.int32)
    fused[0::2] = jai
    fused[1::2] = asi.view(np.int32)
    run(f"stream_fused_kb{KB}", k_fused(KB), KB, qb,
        fused.reshape(TOT_KB * 2, LANES), as_, None, ja_rows=2 * KB)

    for KB in (2048, 8192):
        qb, ja, as_ = mk(1, KB)
        chk = ref_sum(ja, as_)
        run(f"gather_b_kb{KB}", k_gather(KB, False), KB, qb, ja, as_, chk)

    KB = 8192
    qb, ja, as_ = mk(1, KB)
    chk = ref_sum(ja, as_)
    ja16 = ((((ja.reshape(TOT_KB // KB, KB // CK, CK, LANES) >> 7)
              - qb[:, :, None, None]) << 7).reshape(TOT_KB, LANES)
            | (ja & (LANES - 1))).astype(np.int16)
    run(f"gatherb_i16_kb{KB}", k_gather(KB, True), KB, qb, ja16, as_, chk, bpe=6)

    for span, i16 in ((4, False), (8, False), (4, True)):
        qb, ja, as_ = mk(span, KB)
        chk = ref_sum(ja, as_)
        if i16:
            ja2 = ((((ja.reshape(TOT_KB // KB, KB // CK, CK, LANES) >> 7)
                     - qb[:, :, None, None]) << 7).reshape(TOT_KB, LANES)
                   | (ja & (LANES - 1))).astype(np.int16)
            run(f"span{span}_i16_kb{KB}", k_span(KB, span, True), KB, qb, ja2,
                as_, chk, bpe=6)
        else:
            run(f"span{span}_kb{KB}", k_span(KB, span, False), KB, qb, ja, as_, chk)

    with open("/root/repo/probes/kernel_probe3.out.json", "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
