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
    "run_device_validated",
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

    ``fn(*args)`` must return an array (or tuple of arrays); a scalar checksum
    of the results is read back to force completion. Returns
    (best_seconds_per_call, rounds' times list).

    Loop-invariant-code-motion guard: a naive ``scan`` whose body ignores the
    carry lets XLA legally hoist ``fn(*args)`` out of the loop, silently
    dividing the reported time by ``reps``. Each iteration therefore perturbs
    one input leaf by a carry that *data-depends on the previous iteration's
    output* but is zero at runtime: the carry is
    ``where(bitcast(out[0]) == IMPOSSIBLE_PATTERN, 1, 0)``. XLA cannot fold
    the comparison (the output bits are unknown at compile time), so the
    chain is irreducibly sequential, while the perturbation adds exactly
    ``0.0`` and leaves results bit-identical. Verified by
    tests/test_bench.py::test_batched_timer_not_hoisted.
    """
    flat, treedef = jax.tree_util.tree_flatten(args)
    # perturb the LAST inexact leaf (for (matrix, x) pytrees this is x —
    # the cheapest stream to touch); fall back to any numeric leaf (adding a
    # zero int is just as exact) so all-integer argument lists are still
    # LICM-chained rather than silently hoisted
    chain_idx = None
    for i in range(len(flat) - 1, -1, -1):
        leaf = flat[i]
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.inexact):
            chain_idx = i
            break
    if chain_idx is None:
        for i in range(len(flat) - 1, -1, -1):
            leaf = flat[i]
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.number):
                chain_idx = i
                break

    # a specific NaN payload no kernel produces; the compare is runtime-false
    _IMPOSSIBLE = jnp.int32(0x7F123457)

    @jax.jit
    def chained(*args):
        flat0, _ = jax.tree_util.tree_flatten(args)

        def body(carry, _):
            flat_i = list(flat0)
            if chain_idx is not None:
                leaf = flat_i[chain_idx]
                flat_i[chain_idx] = leaf + carry.astype(leaf.dtype)
            out = fn(*jax.tree_util.tree_unflatten(treedef, flat_i))
            out0 = out[0] if isinstance(out, tuple) else out
            s = out0.reshape(-1)[0]
            bits = jax.lax.bitcast_convert_type(s.astype(jnp.float32), jnp.int32)
            c = jnp.where(bits == _IMPOSSIBLE, 1.0, 0.0).astype(jnp.float32)
            return c, s

        c, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return jnp.sum(sums) + c

    # warm-up (compile)
    force_readback(chained(*args))
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        force_readback(chained(*args))
        times.append((time.perf_counter() - t0) / reps)
    return min(times), times


def run_device_validated(fn, *args, y_ref, reps: int = 16):
    """Per-iteration validation WITHOUT host readbacks (≙ the reference's
    in-loop `checkResult` on every timed iteration, main_cuda.cu:183-188 /
    main.c:145): run ``reps`` chained executions, accumulating the running
    max |out - y_ref| in-graph, and read ONE scalar back at the end.

    The reference pays a D2H copy + host compare per iteration; on this
    tunneled runtime that would cost ~32 ms/rep (the fixed invocation
    cost), so the accumulator is the TPU-native equivalent: the compare
    rides the chip, the chain stays irreducibly sequential (each
    iteration's carry data-depends on the previous output), and a single
    readback reports the worst iteration.

    Returns (max_abs_diff_across_reps, seconds_per_rep) — the seconds
    include the in-graph compare, so callers can quantify its overhead
    against the plain timed chain.
    """
    y_ref = jnp.asarray(y_ref)

    # LICM guard, same scheme as time_device_fn_batched: perturb one input
    # leaf by a carry-derived runtime-zero so fn(*args) itself data-depends
    # on the previous iteration (a max-only carry chain would NOT stop XLA
    # from hoisting the loop-invariant fn call out of the scan).
    flat, treedef = jax.tree_util.tree_flatten(args)
    chain_idx = None
    for i in range(len(flat) - 1, -1, -1):
        leaf = flat[i]
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.number):
            if chain_idx is None or jnp.issubdtype(leaf.dtype, jnp.inexact):
                chain_idx = i
                if jnp.issubdtype(leaf.dtype, jnp.inexact):
                    break

    def chained_fn(reps_):
        @jax.jit
        def chained(y_r, *args):
            flat0, _ = jax.tree_util.tree_flatten(args)

            def body(carry, _):
                flat_i = list(flat0)
                if chain_idx is not None:
                    leaf = flat_i[chain_idx]
                    # carry >= 0 always; the compare is runtime-false but
                    # not provably so (carry holds unknown device values)
                    z = jnp.where(carry < -1.0, 1.0, 0.0)
                    flat_i[chain_idx] = leaf + z.astype(leaf.dtype)
                out = fn(*jax.tree_util.tree_unflatten(treedef, flat_i))
                out0 = out[0] if isinstance(out, tuple) else out
                d = jnp.max(jnp.abs(out0.reshape(-1)[: y_r.size]
                                    - y_r.reshape(-1).astype(out0.dtype)))
                return jnp.maximum(carry, d.astype(jnp.float32)), ()

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps_)
            return acc

        return chained

    c1, c2 = chained_fn(reps), chained_fn(2 * reps)
    force_readback(c1(y_ref, *args))  # compile
    force_readback(c2(y_ref, *args))
    t0 = time.perf_counter()
    max_diff = force_readback(c1(y_ref, *args))
    t1 = time.perf_counter()
    force_readback(c2(y_ref, *args))
    t2 = time.perf_counter()
    # slope: the tunnel's fixed ~32 ms per chained invocation cancels, so
    # the per-rep time is comparable with the harness's slope-timed stage
    sec = max(((t2 - t1) - (t1 - t0)) / reps, 1e-9)
    return float(max_diff), sec


def time_device_fn_slope(fn, *args, reps: int = 64, rounds: int = 3):
    """Per-call time free of the tunnel's fixed per-invocation cost.

    A chained-jit invocation through the axon tunnel costs a FIXED ~32 ms
    regardless of rep count (measured: a trivial (8,128) add reads 504
    us/rep at 64 reps but 65 us/rep at 512 — the whole round is ~32 ms
    either way). One-point timing therefore inflates every sub-millisecond
    kernel by fixed/reps. This helper times rounds at ``reps`` and
    ``2*reps`` and returns the SLOPE ``(T2 - T1) / reps`` — the fixed cost
    cancels exactly. Returns (best_seconds_per_call, (t1_list, t2_list)).
    """
    t1_best, t1 = time_device_fn_batched(fn, *args, reps=reps, rounds=rounds)
    t2_best, t2 = time_device_fn_batched(fn, *args, reps=2 * reps,
                                         rounds=rounds)
    # totals: T1 = fixed + reps*t, T2 = fixed + 2*reps*t
    slope = (min(t2) * 2 * reps - min(t1) * reps) / reps
    if slope <= 0:
        # noise swamped the fixed-cost-dominated measurement (tiny fns /
        # CPU interpret): fall back to the lower per-rep estimate, which
        # still bounds the true time from above and stays positive
        slope = min(min(t1), min(t2))
    return slope, (t1, t2)
