"""TPU measurement: MXU block-sparse SpMM (ops/pallas_bsr.py).

The round-3+ capability probe: SpMM ``Y = A @ X`` on banded/FEM matrices
with B right-hand sides, f32 and bf16-in/f32-acc, slope-timed (fixed
tunnel cost cancels), validated against the fp64 host oracle. Reports
useful GFLOPS = 2*nnz*B / t — the MXU path's headroom over B independent
SpMV calls is the point of the feature.
"""
import os
import sys
sys.path.insert(0, "/root/repo")
import time

# BSR_PROBE_INTERPRET=1: CPU dress-rehearsal of this exact file (tiny
# shapes, interpret-mode kernel) — no TPU touched.
REHEARSE = os.environ.get("BSR_PROBE_INTERPRET", "") == "1"

import jax

if REHEARSE:
    jax.config.update("jax_platforms", "cpu")
# persistent compile cache: 12 distinct jit shapes under the watcher's hard
# timeout — a killed run must not lose its compiles (CLAUDE.md TPU rules)
jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache_cpu" if REHEARSE
                  else "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp

print("device:", jax.devices()[0], flush=True)
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
print("warm", flush=True)

import scipy.sparse as sp

from sparsematrixvectormultiplication_tpu.formats.bsr import BSRMatrix
from sparsematrixvectormultiplication_tpu.formats.csr import CSRMatrix
from sparsematrixvectormultiplication_tpu.models import synthetic as syn
from sparsematrixvectormultiplication_tpu.ops.pallas_bsr import (
    bsr_spmm_pallas, device_put_bsr, pad_rhs)
from sparsematrixvectormultiplication_tpu.utils.timing import (
    time_device_fn_slope)
from sparsematrixvectormultiplication_tpu.utils.validation import (
    difference_metrics)

rng = np.random.default_rng(7)

CASES = [
    # (name, coo builder) — narrow dense bands, where 128x128 blocks carry
    # real fill: width-129 band -> kb=2, fill = nnz_per_row*128/(2*128^2)
    ("band64_250k", lambda: syn.banded(250_000, 64, 64, seed=11)),   # 25% fill, 256 MiB f32
    ("band24_500k", lambda: syn.banded(500_000, 24, 40, seed=12)),   # ~9% fill, 512 MiB f32
]
B_LIST = [128, 512]
ROUTES = ["blockspec", "dma"]
if REHEARSE:
    CASES = [("band_tiny", lambda: syn.banded(3_000, 16, 20, seed=11))]
    B_LIST = [128]
    ROUTES = ["blockspec", "dma"]

for name, build in CASES:
    t0 = time.time()
    coo = build()
    csr = CSRMatrix.from_coo(coo)
    try:
        bsr = BSRMatrix.from_csr(csr, max_bytes=1 << 30)
    except ValueError as e:
        print(f"[{name}] SKIP: {e}", flush=True)
        continue
    print(f"[{name}] nnz={csr.nnz} blocks={bsr.n_real_blocks} kb={bsr.kb} "
          f"fill={bsr.fill:.4f} pad={bsr.pad_ratio:.2f} "
          f"bytes={bsr.nbytes/2**20:.0f}MiB conv={time.time()-t0:.1f}s",
          flush=True)
    smat = sp.csr_matrix((csr.values, csr.col_idx, csr.row_ptr),
                         shape=csr.shape)

    for dt, lab in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        try:
            d = device_put_bsr(bsr, dtype=dt)
        except MemoryError as e:
            print(f"[{name}] {lab} SKIP upload: {e}", flush=True)
            continue
        for B in B_LIST:
          for route in ROUTES:
            # A/B the X-slab delivery routes: "blockspec" (data-dependent
            # index map) showed significant diffs on real TPU in the
            # Aug 19 demo run; "dma" consumes the prefetch scalar inside
            # the kernel body (explicit make_async_copy) like the
            # TPU-validated sb-list kernel. Oracle-check BOTH.
            X = rng.standard_normal((csr.ncols, B)).astype(np.float32)
            xp = pad_rhs(X, csr.ncols, dtype=dt)
            fn = jax.jit(lambda dd, xx: bsr_spmm_pallas(
                dd, xx, interpret=REHEARSE, route=route))
            try:
                y = np.asarray(fn(d, xp))[:, :B]
            except Exception as e:
                print(f"[{name}] {lab} B={B} {route}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
            if lab == "f32":
                ref = smat @ X.astype(np.float64)
                m = difference_metrics(ref, y)
            else:
                # isolate KERNEL error from input quantization: fp64
                # oracle over the bf16-rounded operands the kernel saw
                sm_b = smat.copy()
                sm_b.data = sm_b.data.astype(jnp.bfloat16).astype(np.float64)
                ref = sm_b @ X.astype(jnp.bfloat16).astype(np.float64)
                m = difference_metrics(ref, y, abs_tol=1e-2, rel_tol=0.02)
            sec, _ = time_device_fn_slope(fn, d, xp, reps=16, rounds=3)
            gf = 2.0 * csr.nnz * B / sec / 1e9
            print(f"[{name}] {lab} B={B} {route}: {sec*1e3:.3f} ms = {gf:.1f} GF "
                  f"({gf/1000:.2f} TF/s) sig_diffs={m.significant_diffs} "
                  f"max_rel={m.max_rel_err:.2e}", flush=True)
        del d

print("BSR SPMM PROBE DONE", flush=True)
