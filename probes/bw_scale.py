#!/usr/bin/env python
"""Size/reps scaling cross-check for the bandwidth probes.

Separates fixed per-call overhead from true streaming bandwidth:
  * tunnel RTT (force_readback of an already-computed scalar)
  * single-call wall time (readback-forced) at 128MB/512MB/2GB
  * chained-timer per-rep time at reps 2/8/32 (overhead amortization)
If per-call time scales ~linearly with bytes, the GB/s number is real; if it
is flat, a fixed overhead dominates and bigger-buffer numbers are the truth.
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, "/root/repo")
from probes.bw_probe import pallas_read  # noqa: E402
from sparsematrixvectormultiplication_tpu.utils.timing import (  # noqa: E402
    force_readback,
    time_device_fn_batched,
)

LANES = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    t0 = time.time()
    float(np.asarray(jnp.sum(jax.device_put(np.ones(1024, np.float32)))))
    log(f"warm-up {time.time()-t0:.0f}s")

    # tunnel RTT
    tiny = jax.jit(lambda: jnp.ones((8, LANES), jnp.float32))()
    force_readback(tiny)
    rtts = []
    for _ in range(20):
        t = time.perf_counter()
        force_readback(tiny)
        rtts.append(time.perf_counter() - t)
    rtt = min(rtts)
    print(json.dumps({"probe": "readback_rtt", "ms": round(rtt * 1e3, 3),
                      "median_ms": round(sorted(rtts)[10] * 1e3, 3)}), flush=True)

    seedv = jax.jit(lambda: jnp.zeros((LANES,), jnp.float32))()
    seed = jax.jit(lambda: jnp.zeros((8, LANES), jnp.float32))()

    def xla_sum(b, s):
        return jnp.sum((b + s[0]) * 1.0000001, axis=0)

    xla_sum_j = jax.jit(xla_sum)

    for nr in (1 << 18, 1 << 20, 1 << 22):  # 128MB, 512MB, 2GB
        gb = nr * LANES * 4 / 1e9
        buf = jax.jit(lambda nr=nr: jnp.ones((nr, LANES), jnp.float32))()

        # single-call wall time, readback-forced (min of 6)
        force_readback(xla_sum_j(buf, seedv))
        ts = []
        for _ in range(6):
            t = time.perf_counter()
            force_readback(xla_sum_j(buf, seedv))
            ts.append(time.perf_counter() - t)
        sec = min(ts) - rtt
        print(json.dumps({"probe": f"xla_sum_single_{gb:.2f}GB",
                          "ms": round(min(ts) * 1e3, 3),
                          "ms_minus_rtt": round(sec * 1e3, 3),
                          "GBps": round(gb / max(sec, 1e-9), 1)}), flush=True)

        # chained at several reps
        for reps in (2, 8, 32):
            s, _ = time_device_fn_batched(xla_sum, buf, seedv, reps=reps, rounds=2)
            print(json.dumps({"probe": f"xla_sum_chain_{gb:.2f}GB_r{reps}",
                              "ms_per_call": round(s * 1e3, 3),
                              "GBps": round(gb / s, 1)}), flush=True)

        # pallas grid read
        fnp = pallas_read(nr, 8192)
        yp = fnp(buf, seed)
        force_readback(yp)
        ts = []
        for _ in range(6):
            t = time.perf_counter()
            force_readback(fnp(buf, seed))
            ts.append(time.perf_counter() - t)
        sec = min(ts) - rtt
        print(json.dumps({"probe": f"pallas_read_single_{gb:.2f}GB",
                          "ms": round(min(ts) * 1e3, 3),
                          "ms_minus_rtt": round(sec * 1e3, 3),
                          "GBps": round(gb / max(sec, 1e-9), 1)}), flush=True)
        for reps in (2, 8):
            s, _ = time_device_fn_batched(fnp, buf, seed, reps=reps, rounds=2)
            print(json.dumps({"probe": f"pallas_read_chain_{gb:.2f}GB_r{reps}",
                              "ms_per_call": round(s * 1e3, 3),
                              "GBps": round(gb / s, 1)}), flush=True)
        del buf

    log(f"total {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
