#!/bin/sh
# Round-3 TPU chain v9 (Aug 19 ~22:55). Replaces chain v8 after two
# worker-side tune hangs (random_uniform default-sbmajor, then a 45-min
# sblist host conversion) forced manual kills: v8 had only one sweep
# resume pass and had moved on with 4 matrices unmeasured.
#
# Priority order (re-ranked vs v8 now that thermal 64.2 / banded_medium
# 59.0 cleared their bars at sweep timing):
#   1. SWEEPRESUME2  — finish the autotuned sweep (random_uniform tunes
#                      against the pruned .tune_skip candidate set)
#   2. LADDERS       — whole-suite K-ladder curves (VERDICT item 5)
#   3. SPLITROAD     — locality-split on road (the one unmet bar, >=8 GF)
#   4. PRF32         — f32 PR rows -> result_tpu_r3_pr2
#   5. STEADYPR      — PR flagships at 256 reps
#   6. STEADY256     — road/banded_medium/thermal steady re-times
#   7. BF16AB / SPMMAB / BSRPROBE / WLSHED probes
cd /root/repo
LOG=/root/repo/sweep_r3.log
D=/root/repo/suite_mtx
END_TS=$(date -d "${CHAIN9_END:-2026-08-20 05:45}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 24000 ))

wait_tpu() {
  while :; do
    NOW=$(date +%s)
    [ "$NOW" -ge "$END_TS" ] && return 1
    if timeout 420 python -c "
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
  NOW=$(date +%s); LEFT=$((END_TS - NOW + 600))
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

echo "CHAIN9 BOOT $(date) end=$(date -d @$END_TS)" >> "$LOG"

# 1. finish the autotuned sweep (checkpoint skips the 6 done matrices)
run_stage SWEEPRESUME2 10800 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/random_uniform.mtx --matrix $D/ml_laplace_like.mtx \
  --matrix $D/fem3d_cube.mtx --matrix $D/banded_fem_large.mtx \
  --output-dir result_tpu_r3 --autotune --iterations 32 --rounds 2 \
  --kernels serial_csr,serial_hll,xla_csr,xla_ell,pallas_sell,pallas_hll,pallas_sell_sigma,pallas_sell_dd \
  --resume >> $LOG 2>&1"

# 2. K-ladder curves for every suite matrix (VERDICT r2 item 5)
run_stage LADDERS 10800 "python probes/run_r3_ladders.py > probes/ladders_r3.out 2>&1"

# 3. locality-split composite on road (the one unmet scattered bar)
run_stage SPLITROAD 2400 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/road_like.mtx \
  --output-dir result_tpu_r3_split --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_split,pallas_split_dd --resume >> $LOG 2>&1"

# 4. f32 PR rows (harness falls back to 2^14-row panels on this worker)
run_stage PRF32 5400 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
  --matrix $D/road_like.mtx --matrix $D/dense_rows_mix.mtx \
  --matrix $D/random_uniform.mtx \
  --output-dir result_tpu_r3_pr2 --iterations 32 --rounds 2 \
  --kernels serial_csr,pallas_pr --resume >> $LOG 2>&1"

# 5. PR kernels at 256 reps on the two scattered flagships
run_stage STEADYPR 3600 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/powerlaw_web.mtx --matrix $D/road_like.mtx \
  --output-dir result_tpu_r3_steadypr --iterations 256 --rounds 2 \
  --kernels serial_csr,pallas_pr,pallas_pr_dd --resume >> $LOG 2>&1"

# 6. 256-rep steady re-times
run_stage STEADY256 7200 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/road_like.mtx --matrix $D/banded_fem_medium.mtx \
  --matrix $D/thermal_like.mtx \
  --output-dir result_tpu_r3_steady --autotune --iterations 256 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_hll,pallas_sell_dd \
  --resume >> $LOG 2>&1"

# 7. A/B probes
run_stage BF16AB 2400 "python probes/bf16_ab_tpu.py > probes/bf16_ab_tpu.out 2> probes/bf16_ab_tpu.err"
run_stage SPMMAB 2400 "python probes/spmm_sell_tpu.py > probes/spmm_sell_tpu.out 2> probes/spmm_sell_tpu.err"
run_stage BSRPROBE 2400 "python probes/bsr_spmm_tpu.py > probes/bsr_spmm_tpu.out 2> probes/bsr_spmm_tpu.err"
run_stage WLSHED 3000 "python probes/wlshed_ab_tpu.py > probes/wlshed_ab_tpu.out 2>&1"

echo "CHAIN9 DONE $(date)" >> "$LOG"
