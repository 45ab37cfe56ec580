#!/bin/sh
# Round-3 TPU chain v10 (Aug 20 ~09:00, VM #4). The day-5 VM died before
# chain v9 could run SPLITROAD / MLFIX / STEADYPR / LADDERS. This lean
# chain closes exactly the remaining gaps, highest-value first, and
# expects suite_mtx to be regenerated concurrently by
# probes/gen_suite_priority.py (each stage waits for its own input file).
#
#   1. SPLITROAD — locality-split composite on road (the one unmet bar, >=8 GF)
#   2. MLFIX     — recover ml_laplace pallas_sell/hll/sell_dd rows at the
#                  default ladder (lost to a transient remote-compile 500)
#   3. STEADYPR  — PR flagships at 256 reps
#   4. LADDERS   — whole-suite K-ladder curves (resume-aware, cheap-first)
#   5. merge + commit
#
# Usage: CHAIN10_END="2026-08-20 10:30" nohup sh probes/r3_chain10.sh &
cd /root/repo || exit 1
LOG=/root/repo/sweep_r3.log
D=/root/repo/suite_mtx
END_TS=$(date -d "${CHAIN10_END:-2026-08-20 10:30}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 4800 ))

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
    sleep 60
  done
}

wait_file() {
  while [ ! -f "$1" ]; do
    [ "$(date +%s)" -ge "$END_TS" ] && return 1
    sleep 20
  done
  return 0
}

budget() {
  NOW=$(date +%s); LEFT=$((END_TS - NOW + 600))
  [ "$LEFT" -lt 120 ] && LEFT=120
  [ "$LEFT" -gt "$1" ] && LEFT=$1
  echo "$LEFT"
}

run_stage() {
  tag=$1; cap=$2; need=$3; shift 3
  if [ -n "$need" ] && ! wait_file "$need"; then
    echo "$tag SKIPPED (input $need missing at deadline) $(date)" >> "$LOG"
    return 1
  fi
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

echo "CHAIN10 BOOT $(date) end=$(date -d @$END_TS)" >> "$LOG"

# 1. locality-split composite on road (the one unmet scattered bar)
run_stage SPLITROAD 2000 "$D/road_like.mtx" \
  "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/road_like.mtx \
  --output-dir result_tpu_r3_split --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_split,pallas_split_dd --resume >> $LOG 2>&1"

# 2. recover ml_laplace pallas rows at the default ladder (r2's 26 GF
#    config; the tuned wl-shed pick 500'd on the old worker build)
run_stage MLFIX 2400 "$D/ml_laplace_like.mtx" \
  "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/ml_laplace_like.mtx \
  --output-dir result_tpu_r3_mlfix --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_hll,pallas_sell_dd --resume >> $LOG 2>&1"

# 3. PR kernels at 256 reps on the two scattered flagships
run_stage STEADYPR 2400 "$D/powerlaw_web.mtx" \
  "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/powerlaw_web.mtx --matrix $D/road_like.mtx \
  --output-dir result_tpu_r3_steadypr --iterations 256 --rounds 2 \
  --kernels serial_csr,pallas_pr,pallas_pr_dd --resume >> $LOG 2>&1"

# 4. K-ladder curves (resume-aware, cheap-first; runs whatever files exist)
run_stage LADDERS 7200 "$D/random_uniform.mtx" \
  "python probes/run_r3_ladders.py > probes/ladders_r3.out 2>&1"

# 5. fold recovered rows into the main CSV + commit
python probes/merge_mlfix_rows.py >> "$LOG" 2>&1
python probes/merge_pr_rows.py >> "$LOG" 2>&1
git add -A result_tpu_r3 result_tpu_r3_mlfix result_tpu_r3_split \
  result_tpu_r3_steadypr suite_mtx/.gitignore 2>/dev/null
git diff --cached --quiet || git commit -q -m "Results: chain v10 rows (split road, ml_laplace recovery, steady PR, ladders)"

echo "CHAIN10 DONE $(date)" >> "$LOG"
