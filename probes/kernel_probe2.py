#!/usr/bin/env python
"""Probe 2: where does the gather cost go?

Probe 1 found: span almost free (span1 1.89 ms vs span32 2.84 ms at 16.8M
entries), the fixed cost of the gather machinery (~1.26 ms over the 0.63 ms
streaming floor) dominates. Hypothesis: take_along_axis has a large
per-INSTRUCTION overhead, so gathering on taller tiles amortizes it.

Variants (all fully-unrolled chunk loops, like the real kernel):
  stream_u          — loads + fma only (floor)
  gather_b_ck{8..64}— broadcast-one-row + take_along_axis per (ck,128) chunk
  gather_w_ck{8..64}— W-window (distinct rows) take_along_axis per chunk
  span4_ck{8,32}    — 4 masked passes per chunk (the real sb-major shape)
  i16cast_span4     — int16 JA, cast to int32 BEFORE shift/and (probe-1 crash
                      used int16 shifts)
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

    LANES = 128
    KB = 512                # rows per grid-step block
    NSTEPS = 256            # 16.78M entries, 128 MB @ 8B
    ENTRIES = NSTEPS * KB * LANES
    Rp = 2048

    rng = np.random.default_rng(0)
    x_tab = rng.standard_normal((Rp, LANES), dtype=np.float32)

    def grid_spec():
        return pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NSTEPS,),
            in_specs=[
                pl.BlockSpec((Rp, LANES), lambda g, q: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((KB, LANES), lambda g, q: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((KB, LANES), lambda g, q: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, LANES), lambda g, q: (g, 0), memory_space=pltpu.VMEM),
        )

    CPARAMS = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=128 * 1024 * 1024,
    )

    def call(kernel, ja_dev, as_dev, qb_dev, x_dev):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec(),
            out_shape=jax.ShapeDtypeStruct((NSTEPS * 8, LANES), jnp.float32),
            compiler_params=CPARAMS,
        )(qb_dev, x_dev, ja_dev, as_dev)

    # ---- kernels (all: static unrolled chunk loop, acc (8,128)) ------------

    def k_stream(ck):
        nch = KB // ck

        def kernel(qb_ref, x_ref, ja_ref, as_ref, y_ref):
            acc = jnp.zeros((8, LANES), jnp.float32)
            for c in range(nch):
                tile = ja_ref[c * ck : (c + 1) * ck, :]
                vals = as_ref[c * ck : (c + 1) * ck, :]
                p = vals * tile.astype(jnp.float32)
                acc = acc + p.reshape(ck // 8, 8, LANES).sum(axis=0)
            y_ref[:] = acc

        return kernel

    def k_gather_b(ck):
        """one broadcast row, gather per (ck,128) chunk"""
        nch = KB // ck

        def kernel(qb_ref, x_ref, ja_ref, as_ref, y_ref):
            g = pl.program_id(0)
            acc = jnp.zeros((8, LANES), jnp.float32)
            for c in range(nch):
                tile = ja_ref[c * ck : (c + 1) * ck, :]
                vals = as_ref[c * ck : (c + 1) * ck, :]
                m = tile & (LANES - 1)
                qb = qb_ref[g, c]
                xb = jnp.broadcast_to(x_ref[qb, :][None, :], (ck, LANES))
                gat = jnp.take_along_axis(xb, m, axis=1)
                p = vals * gat
                acc = acc + p.reshape(ck // 8, 8, LANES).sum(axis=0)
            y_ref[:] = acc

        return kernel

    def k_gather_w(ck):
        """W-window distinct rows: out[i,j] = W[i, m[i,j]] (layered layout)"""
        nch = KB // ck

        def kernel(qb_ref, x_ref, ja_ref, as_ref, y_ref):
            g = pl.program_id(0)
            acc = jnp.zeros((8, LANES), jnp.float32)
            for c in range(nch):
                tile = ja_ref[c * ck : (c + 1) * ck, :]
                vals = as_ref[c * ck : (c + 1) * ck, :]
                m = tile & (LANES - 1)
                qb = qb_ref[g, c]
                W = x_ref[pl.ds(qb, ck), :]
                gat = jnp.take_along_axis(W, m, axis=1)
                p = vals * gat
                acc = acc + p.reshape(ck // 8, 8, LANES).sum(axis=0)
            y_ref[:] = acc

        return kernel

    def k_span4(ck, i16):
        nch = KB // ck

        def kernel(qb_ref, x_ref, ja_ref, as_ref, y_ref):
            g = pl.program_id(0)
            acc = jnp.zeros((8, LANES), jnp.float32)
            for c in range(nch):
                tile = ja_ref[c * ck : (c + 1) * ck, :]
                if i16:
                    tile = tile.astype(jnp.int32)  # cast BEFORE shifts
                vals = as_ref[c * ck : (c + 1) * ck, :]
                qb = qb_ref[g, c]
                d = (tile >> 7) if i16 else ((tile >> 7) - qb)
                m = tile & (LANES - 1)
                gath = jnp.zeros((ck, LANES), jnp.float32)
                for s in range(4):
                    xb = jnp.broadcast_to(x_ref[qb + s, :][None, :], (ck, LANES))
                    gat = jnp.take_along_axis(xb, m, axis=1)
                    gath = gath + jnp.where(d == s, gat, 0)
                p = vals * gath
                acc = acc + p.reshape(ck // 8, 8, LANES).sum(axis=0)
            y_ref[:] = acc

        return kernel

    # ---- data ---------------------------------------------------------------

    def mk(span, ck_for_w=None):
        """ja with delta in [0,span) relative to per-chunk qb (chunk=ck rows)."""
        ck = ck_for_w or 8
        nch = KB // ck
        qb = rng.integers(0, Rp - max(span, ck), size=(NSTEPS, nch)).astype(np.int32)
        d = rng.integers(0, span, size=(NSTEPS, nch, ck, LANES))
        m = rng.integers(0, LANES, size=(NSTEPS, nch, ck, LANES))
        ja = ((qb[:, :, None, None] + d) * LANES + m).astype(np.int32)
        as_ = rng.standard_normal(ja.shape, dtype=np.float32)
        return qb, ja.reshape(NSTEPS * KB, LANES), as_.reshape(NSTEPS * KB, LANES)

    def mk_w(ck):
        """layered: delta == sublane index within the ck-high chunk."""
        nch = KB // ck
        qb = rng.integers(0, Rp - ck, size=(NSTEPS, nch)).astype(np.int32)
        d = np.broadcast_to(np.arange(ck)[None, None, :, None],
                            (NSTEPS, nch, ck, LANES))
        m = rng.integers(0, LANES, size=(NSTEPS, nch, ck, LANES))
        ja = ((qb[:, :, None, None] + d) * LANES + m).astype(np.int32)
        as_ = rng.standard_normal(ja.shape, dtype=np.float32)
        return qb, ja.reshape(NSTEPS * KB, LANES), as_.reshape(NSTEPS * KB, LANES)

    def ref_sum(ja, as_):
        xf = x_tab.reshape(-1)
        return float((as_.astype(np.float64) * xf[ja].astype(np.float64)).sum())

    x_dev = jax.device_put(jnp.asarray(x_tab))
    results = []

    def run(name, kernel, qb, ja, as_, check, bpe=8):
        try:
            ja_dev = jax.device_put(jnp.asarray(ja))
            as_dev = jax.device_put(jnp.asarray(as_))
            qb_dev = jax.device_put(jnp.asarray(qb))
            jfn = jax.jit(functools.partial(call, kernel))
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

    qb, ja, as_ = mk(1)
    run("stream_u_ck8", k_stream(8), qb, ja, as_, None)

    for ck in (8, 16, 32, 64):
        qb, ja, as_ = mk(1, ck_for_w=ck)
        chk = ref_sum(ja, as_)
        run(f"gather_b_ck{ck}", k_gather_b(ck), qb, ja, as_, chk)
        qb, ja, as_ = mk_w(ck)
        chk = ref_sum(ja, as_)
        run(f"gather_w_ck{ck}", k_gather_w(ck), qb, ja, as_, chk)

    for ck in (8, 32):
        qb, ja, as_ = mk(4, ck_for_w=ck)
        chk = ref_sum(ja, as_)
        run(f"span4_ck{ck}", k_span4(ck, False), qb, ja, as_, chk)

    # int16 with cast-first
    ck = 8
    qb, ja, as_ = mk(4, ck_for_w=ck)
    chk = ref_sum(ja, as_)
    nch = KB // ck
    d = (ja.reshape(NSTEPS, nch, ck, LANES) >> 7) - qb[:, :, None, None]
    m = ja & (LANES - 1)
    ja16 = ((d.reshape(ja.shape) << 7) | m).astype(np.int16)
    run("i16cast_span4", k_span4(ck, True), qb, ja16, as_, chk, bpe=6)

    with open("/root/repo/probes/kernel_probe2.out.json", "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
