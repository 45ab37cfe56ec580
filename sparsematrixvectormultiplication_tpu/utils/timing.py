"""Device timing utilities — the TPU analogue of omp_get_wtime / cudaEvents.

The reference brackets each kernel call with ``omp_get_wtime`` (main.c:109-112)
or cudaEvent pairs (main_cuda.cu:88-90,163-180). On TPU, dispatch is
asynchronous and — on tunneled runtimes — ``block_until_ready`` can return
before execution completes (measured: impossible 22 TB/s "timings"). The only
reliable wall-clock is to force a small readback to host. :func:`time_device_fn`
therefore times ``fn`` with a forced scalar readback, and
:func:`time_device_fn_batched` amortizes launch/tunnel overhead by chaining
``reps`` executions inside one jitted ``lax.scan`` — the framework equivalent
of the reference's 100-iteration loops (main.c:20 NUM_ITERATION).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "force_readback",
    "time_device_fn",
    "time_device_fn_batched",
    "ITERATION_SKIP",
]

ITERATION_SKIP = 5  # warm-up iterations to skip (≙ reference utility.h:7)


def force_readback(value) -> float:
    """Block until truly complete by pulling one scalar to host."""
    arr = jnp.asarray(value)
    if arr.ndim > 0:
        arr = arr.reshape(-1)[0]
    return float(np.asarray(arr))


def time_device_fn(fn, *args, iters: int = 10, skip: int = ITERATION_SKIP):
    """Per-call wall times with forced readback; returns list of seconds
    (first ``skip`` calls excluded, matching main.c:114)."""
    times = []
    for i in range(iters + skip):
        t0 = time.perf_counter()
        out = fn(*args)
        force_readback(out if not isinstance(out, tuple) else out[0])
        t1 = time.perf_counter()
        if i >= skip:
            times.append(t1 - t0)
    return times


def time_device_fn_batched(fn, *args, reps: int = 20, rounds: int = 3, checksum=None):
    """Amortized per-call time: ``reps`` chained calls inside one jit.

    ``fn(*args)`` must return an array; a scalar checksum of the last result
    is read back to force completion. Returns (best_seconds_per_call, rounds'
    times list).
    """

    @jax.jit
    def chained(*args):
        def body(carry, _):
            out = fn(*args)
            return carry, jnp.sum(out.reshape(-1)[:1])
        _, sums = jax.lax.scan(body, 0.0, None, length=reps)
        return jnp.sum(sums)

    # warm-up (compile)
    force_readback(chained(*args))
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        force_readback(chained(*args))
        times.append((time.perf_counter() - t0) / reps)
    return min(times), times
