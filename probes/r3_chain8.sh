#!/bin/sh
# Round-3 TPU chain v8 (session of Aug 19 evening, fresh VM after the
# day-4 VM died; TPU worker confirmed ALIVE 19:36).
#
# Everything the dead VM's chains v4-v7 measured into UNCOMMITTED dirs
# was lost; the committed evidence is result_tpu_r3_pr only. This chain
# re-produces the remaining round-3 artifacts in priority order:
#   1. SMOKE        — PR compile smoke (fast Mosaic-health check)
#   2. SWEEP        — autotuned file-driven full-suite sweep -> result_tpu_r3
#                     (VERDICT r2 items 3, 4, 8; incl. banded_fem_large dd)
#   3. STEADY256    — 256-rep steady re-times of the bar-adjacent matrices
#   4. STEADYPR     — PR flagships at 256 reps
#   5. LADDERS      — K-ladder curves for the whole suite (item 5)
#   6. PRF32        — f32 PR rows (2^14-row panel fallback) -> result_tpu_r3_pr2
#   7. SPLITROAD    — locality-split composite on road_like
#   8. BF16AB / SPMMAB / BSRPROBE / WLSHED — A/B probes
#
# Re-gates before EVERY stage; budgets each timeout against the deadline.
# Only ONE TPU process at a time (stages strictly sequential).
cd /root/repo
LOG=/root/repo/sweep_r3.log
D=/root/repo/suite_mtx
END_TS=$(date -d "${CHAIN8_END:-2026-08-20 05:45}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 36000 ))

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

echo "CHAIN8 BOOT $(date) end=$(date -d @$END_TS)" >> "$LOG"

# 1. PR smoke first (no suite dependency) — surfaces Mosaic problems fast
run_stage SMOKE 1500 "python probes/pr_smoke.py > probes/pr_smoke_tpu.out 2>&1"

# 0b. wait until the suite corpus is fully regenerated
while [ ! -f "$D/banded_fem_large.mtx" ] || ! grep -q "ALL DONE" /tmp/write_suite.log 2>/dev/null; do
  [ "$(date +%s)" -ge "$END_TS" ] && exit 1
  sleep 60
done

# 2. autotuned file-driven full sweep (resume-aware; giants last)
SWEEPCMD="python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/thermal_like.mtx --matrix $D/road_like.mtx \
  --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
  --matrix $D/dense_rows_mix.mtx --matrix $D/banded_fem_medium.mtx \
  --matrix $D/random_uniform.mtx --matrix $D/ml_laplace_like.mtx \
  --matrix $D/fem3d_cube.mtx --matrix $D/banded_fem_large.mtx \
  --output-dir result_tpu_r3 --autotune --iterations 32 --rounds 2 \
  --kernels serial_csr,serial_hll,xla_csr,xla_ell,pallas_sell,pallas_hll,pallas_sell_sigma,pallas_sell_dd \
  --resume >> $LOG 2>&1"
run_stage SWEEP 14400 "$SWEEPCMD"
rc=$?
if [ "$rc" -ne 0 ]; then
  run_stage SWEEPRESUME 10800 "$SWEEPCMD"
fi

# 3. 256-rep steady re-times of the matrices nearest their round-3 bars
run_stage STEADY256 7200 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/road_like.mtx --matrix $D/banded_fem_medium.mtx \
  --matrix $D/thermal_like.mtx \
  --output-dir result_tpu_r3_steady --autotune --iterations 256 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_hll,pallas_sell_dd \
  --resume >> $LOG 2>&1"

# 4. PR kernels at 256 reps on the two scattered flagships
run_stage STEADYPR 3600 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/powerlaw_web.mtx --matrix $D/road_like.mtx \
  --output-dir result_tpu_r3_steadypr --iterations 256 --rounds 2 \
  --kernels serial_csr,pallas_pr,pallas_pr_dd --resume >> $LOG 2>&1"

# 5. K-ladder curves for every suite matrix (VERDICT r2 item 5)
run_stage LADDERS 10800 "python probes/run_r3_ladders.py > probes/ladders_r3.out 2>&1"

# 6. f32 PR rows (harness falls back to 2^14-row panels on this worker)
run_stage PRF32 5400 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
  --matrix $D/road_like.mtx --matrix $D/dense_rows_mix.mtx \
  --matrix $D/random_uniform.mtx \
  --output-dir result_tpu_r3_pr2 --iterations 32 --rounds 2 \
  --kernels serial_csr,pallas_pr --resume >> $LOG 2>&1"

# 7. locality-split composite on the regime it exists for
run_stage SPLITROAD 1800 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/road_like.mtx \
  --output-dir result_tpu_r3_split --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_split,pallas_split_dd --resume >> $LOG 2>&1"

# 8. A/B probes
run_stage BF16AB 2400 "python probes/bf16_ab_tpu.py > probes/bf16_ab_tpu.out 2> probes/bf16_ab_tpu.err"
run_stage SPMMAB 2400 "python probes/spmm_sell_tpu.py > probes/spmm_sell_tpu.out 2> probes/spmm_sell_tpu.err"
run_stage BSRPROBE 2400 "python probes/bsr_spmm_tpu.py > probes/bsr_spmm_tpu.out 2> probes/bsr_spmm_tpu.err"
run_stage WLSHED 3000 "python probes/wlshed_ab_tpu.py > probes/wlshed_ab_tpu.out 2>&1"

echo "CHAIN8 DONE $(date)" >> "$LOG"
