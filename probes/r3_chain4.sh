#!/bin/sh
# Round-3 TPU recovery chain v4 (session of Aug 19, fresh VM).
#
# Same design as v3: re-gate before EVERY stage (stages only ever start
# with a live worker), budget each stage's timeout against the deadline,
# priority order: PR/scattered evidence first (the round's headline),
# then the autotuned full sweep, then ladders/A-Bs, then the BSR MXU
# SpMM probe, then the bf16 and multi-RHS SpMM A/Bs (folded in from
# watch_then_bf16.sh so only ONE gating chain exists).
#
# Only ONE TPU process ever runs at a time: stages are strictly
# sequential, and the gate probe exits before any stage starts.
cd /root/repo
LOG=/root/repo/sweep_r3.log
D=/root/repo/suite_mtx
END_TS=$(date -d "${CHAIN_END:-15:00 today}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 39000 ))

# let any orphaned gate probe (<=420 s) drain before touching the device
sleep 180

wait_tpu() {
  while :; do
    NOW=$(date +%s)
    [ "$NOW" -ge "$END_TS" ] && return 1
    if timeout 300 python -c "
import numpy as np, jax, jax.numpy as jnp
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
print('TPU OK')" >> /tmp/tpu_gate.log 2>&1; then
      echo "gate pass $(date)" >> /tmp/tpu_gate.log
      return 0
    fi
    sleep 120
  done
}

budget() {
  NOW=$(date +%s); LEFT=$((END_TS - NOW + 900))
  [ "$LEFT" -lt 120 ] && LEFT=120
  [ "$LEFT" -gt "$1" ] && LEFT=$1
  echo "$LEFT"
}

run_stage() {
  tag=$1; cap=$2; shift 2
  if ! wait_tpu; then
    echo "$tag SKIPPED (deadline) $(date)" >> "$LOG"
    return 1
  fi
  t=$(budget "$cap")
  echo "$tag START (budget ${t}s) $(date)" >> "$LOG"
  timeout "$t" sh -c "exec $*"
  rc=$?
  echo "$tag EXIT $rc $(date)" >> "$LOG"
  return $rc
}

# 0. wait until the suite corpus is fully regenerated (fresh VM)
while [ ! -f "$D/banded_fem_large.mtx" ] || ! grep -q "ALL DONE" /tmp/write_suite.log 2>/dev/null; do
  [ "$(date +%s)" -ge "$END_TS" ] && exit 1
  sleep 60
done

# 1. PR kernel compile smoke — surfaces Mosaic problems in minutes
run_stage SMOKE 1800 "python probes/pr_smoke.py > probes/pr_smoke_tpu.out 2>&1"

# 2. PR (permutation-routed) rows for the scattered suite — the round's
#    headline evidence (VERDICT r2 item 1). SEPARATE output dir so its
#    checkpoint can't starve the main sweep.
run_stage PRAPPEND 7200 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
  --matrix $D/road_like.mtx --matrix $D/dense_rows_mix.mtx \
  --matrix $D/random_uniform.mtx \
  --output-dir result_tpu_r3_pr --iterations 32 --rounds 2 \
  --kernels serial_csr,pallas_pr,pallas_pr_dd --resume >> $LOG 2>&1"

# 3. autotuned file-driven full sweep (resume-aware; giants last)
run_stage SWEEP 13000 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/thermal_like.mtx --matrix $D/road_like.mtx \
  --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
  --matrix $D/dense_rows_mix.mtx --matrix $D/banded_fem_medium.mtx \
  --matrix $D/random_uniform.mtx --matrix $D/ml_laplace_like.mtx \
  --matrix $D/fem3d_cube.mtx --matrix $D/banded_fem_large.mtx \
  --output-dir result_tpu_r3 --autotune --iterations 32 --rounds 2 \
  --kernels serial_csr,serial_hll,xla_csr,xla_ell,pallas_sell,pallas_hll,pallas_sell_sigma,pallas_sell_dd \
  --resume >> $LOG 2>&1"
rc=$?
# one resume pass if the sweep timed out mid-suite and time remains
if [ "$rc" -ne 0 ]; then
  run_stage SWEEPRESUME 13000 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
    --matrix $D/thermal_like.mtx --matrix $D/road_like.mtx \
    --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
    --matrix $D/dense_rows_mix.mtx --matrix $D/banded_fem_medium.mtx \
    --matrix $D/random_uniform.mtx --matrix $D/ml_laplace_like.mtx \
    --matrix $D/fem3d_cube.mtx --matrix $D/banded_fem_large.mtx \
    --output-dir result_tpu_r3 --autotune --iterations 32 --rounds 2 \
    --kernels serial_csr,serial_hll,xla_csr,xla_ell,pallas_sell,pallas_hll,pallas_sell_sigma,pallas_sell_dd \
    --resume >> $LOG 2>&1"
fi

# 4. SG on the real-size webbase-like matrix (vs reference webbase-1M)
run_stage SGWEBBASE 1200 "python probes/sg_tpu_r3.py webbase_full \
  > probes/sg_tpu_webbase.out 2> probes/sg_tpu_webbase.err"

# 5. K-ladder curves for every suite matrix (VERDICT r2 item 5)
run_stage LADDERS 10800 "python probes/run_r3_ladders.py > probes/ladders_r3.out 2>&1"

# 6. BSR MXU SpMM probe (dense-block matrices on the systolic array)
run_stage BSRPROBE 2400 "python probes/bsr_spmm_tpu.py \
  > probes/bsr_spmm_tpu.out 2> probes/bsr_spmm_tpu.err"

# 7. wl-shed vs auto vs wl A/B on the bench secondary matrix
run_stage WLSHED 3600 "python probes/wlshed_ab_tpu.py > probes/wlshed_ab_tpu.out 2>&1"

# 8. bf16 value-plane A/B
run_stage BF16AB 2400 "python probes/bf16_ab_tpu.py > probes/bf16_ab_tpu.out 2> probes/bf16_ab_tpu.err"

# 9. multi-RHS SELL SpMM A/B
run_stage SPMMAB 2400 "python probes/spmm_sell_tpu.py > probes/spmm_sell_tpu.out 2> probes/spmm_sell_tpu.err"

echo "PIPELINE DONE $(date)" >> "$LOG"
