"""Component timing for the road_like split composite (VERDICT r4 item 3).

Times, each with the slope timer (fixed tunnel cost cancels):
  1. full composite          split_spmv_pallas(ds, x_tab)
  2. near side only          sell_spmv_pallas(ds.near, x_tab)
  3. far side only           pr_spmv_pallas(ds.far, x_tab)
  4. the combining add       y_near + y_far[:nrows]
so the road time budget (per-call floors vs streaming) is measured, not
modeled — r3's modeled 0.4-0.5 ms composite came in at 0.94 ms and the gap
was never attributed. Also reports the near SellMatrix's bin structure
(n_groups, k, contig, layout, y_groups tail padding) to confirm the g_per
tail-pad fix (5efe05a) engaged.

Run: python probes/split_breakdown_tpu.py   (TPU; ~10 min with warm-up)
SPLIT_PROBE_INTERPRET=1: CPU dress-rehearsal (tiny generated road matrix,
interpret kernels; validates the probe code, NOT the timings).
"""
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REHEARSE = os.environ.get("SPLIT_PROBE_INTERPRET", "") == "1"


def log(*a):
    print(*a, flush=True)


def main():
    import jax

    if REHEARSE:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache_cpu"))
    else:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
    from sparsematrixvectormultiplication_tpu.formats.split import SplitMatrix
    from sparsematrixvectormultiplication_tpu.ops.pallas_pr import pr_spmv_pallas
    from sparsematrixvectormultiplication_tpu.ops.pallas_sell import (
        device_put_x, sell_spmv_pallas)
    from sparsematrixvectormultiplication_tpu.ops.pallas_split import (
        device_put_split, split_spmv_pallas)
    from sparsematrixvectormultiplication_tpu.utils.timing import (
        time_device_fn_slope)

    t0 = time.time()
    _ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
    log(f"warm-up transfer: {time.time()-t0:.0f}s")

    t0 = time.time()
    if REHEARSE:
        from sparsematrixvectormultiplication_tpu.models.synthetic import (
            road_network)
        coo = road_network(60_000, seed=5)
    else:
        path = os.path.join(REPO, "suite_mtx", "road_like.mtx")
        from sparsematrixvectormultiplication_tpu.formats.coo import COOMatrix
        coo = COOMatrix.from_mtx(path)
    csr = CSRMatrix.from_coo(coo)
    log(f"load: {time.time()-t0:.1f}s nnz={csr.nnz}")

    t0 = time.time()
    sm = SplitMatrix.from_csr(csr)
    log(f"split convert: {time.time()-t0:.1f}s slab_dist={sm.slab_dist} "
        f"far_frac={sm.far_frac:.4f}")
    for i, b in enumerate(sm.near.bins):
        gids = np.asarray(b.group_ids, np.int64)
        contig = (int(gids[0]) if gids.size and np.array_equal(
            gids, gids[0] + np.arange(gids.size)) else -1)
        log(f"  near bin {i}: k={b.k} n_groups={gids.size} "
            f"layout={b.layout} contig_start={contig} "
            f"span={getattr(b, 'span', '?')}")

    ds = device_put_split(sm)
    log(f"  device y_groups={ds.near.y_groups} (vs num_groups="
        f"{ds.near.num_groups}; tail pad engaged: "
        f"{ds.near.y_groups > ds.near.num_groups})")
    rng = np.random.default_rng(7)
    x = rng.standard_normal(csr.ncols).astype(np.float64)
    x_tab = device_put_x(x.astype(np.float32), csr.ncols)

    if REHEARSE:
        split_spmv_pallas = functools.partial(split_spmv_pallas,
                                              interpret=True)
        sell_spmv_pallas = functools.partial(sell_spmv_pallas,
                                             interpret=True)
        pr_spmv_pallas = functools.partial(pr_spmv_pallas, interpret=True)

    # correctness first (harness formulation: abs+rel significant diffs)
    from sparsematrixvectormultiplication_tpu.utils.validation import (
        difference_metrics)
    y = np.asarray(split_spmv_pallas(ds, x_tab))[: csr.nrows]
    ref = csr.spmv(x)
    dm = difference_metrics(ref, y.astype(np.float64))
    log(f"validate: sig_diffs={dm.significant_diffs} "
        f"max_abs={dm.max_abs_err:.2e}")

    flops = 2.0 * csr.nnz

    def bench(tag, fn, *args):
        t, _ = time_device_fn_slope(fn, *args, reps=128, rounds=3)
        log(f"{tag}: {t*1e3:.3f} ms = {flops/t/1e9:.3f} GF-equivalent")
        return t

    t_full = bench("composite", functools.partial(split_spmv_pallas, ds),
                   x_tab)
    t_near = bench("near only",
                   functools.partial(sell_spmv_pallas, ds.near), x_tab)
    t_far = bench("far only",
                  functools.partial(pr_spmv_pallas, ds.far), x_tab)

    y_near = sell_spmv_pallas(ds.near, x_tab)
    y_far = pr_spmv_pallas(ds.far, x_tab)

    @jax.jit
    def add(a, b):
        return a + b[: csr.nrows]

    t_add = bench("add only", add, y_near, y_far)
    log(f"sum of parts: {(t_near+t_far+t_add)*1e3:.3f} ms "
        f"(composite {t_full*1e3:.3f}; jit-merge saving "
        f"{(t_near+t_far+t_add-t_full)*1e3:.3f} ms)")
    log(f"GFLOPS composite: {flops/t_full/1e9:.3f}")


if __name__ == "__main__":
    main()
