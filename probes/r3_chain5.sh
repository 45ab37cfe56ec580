#!/bin/sh
# Round-3 TPU chain v5 (Aug 19 evening): fill the TPU window after
# chain v4 (CHAIN_END=20:00) and the PR-f32 retry watcher (RETRY_END=20:30)
# finish. Reruns ONLY what v4 left unfinished — every stage is either
# resume-aware (sweep checkpoint, ladder CSV skip, --resume) or guarded by
# its v4 "TAG EXIT 0" line + non-empty output file.
#
# Only ONE TPU process at a time: waits for BOTH predecessor pids, then
# re-gates before every stage.
cd /root/repo
LOG=/root/repo/sweep_r3.log
D=/root/repo/suite_mtx
END_TS=$(date -d "${CHAIN5_END:-2026-08-20 00:45}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 32400 ))

CHAIN4_PID=$(cat /tmp/chain4.pid 2>/dev/null)
RETRY_PID=$(cat /tmp/pr_f32_retry.pid 2>/dev/null)
while :; do
  [ "$(date +%s)" -ge "$END_TS" ] && { echo "CHAIN5 deadline before predecessors $(date)" >> "$LOG"; exit 1; }
  alive=0
  [ -n "$CHAIN4_PID" ] && kill -0 "$CHAIN4_PID" 2>/dev/null && alive=1
  [ -n "$RETRY_PID" ] && kill -0 "$RETRY_PID" 2>/dev/null && alive=1
  [ "$alive" -eq 0 ] && break
  sleep 120
done
echo "CHAIN5 predecessors done $(date)" >> "$LOG"

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

# v4 stage done already? (EXIT 0 in log AND non-empty output file)
v4_done() {
  tag=$1; out=$2
  grep -q "^$tag EXIT 0" "$LOG" 2>/dev/null && [ -s "$out" ]
}

# 1. finish the autotuned full sweep (checkpoint skips completed matrices)
run_stage SWEEPRESUME2 10800 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/thermal_like.mtx --matrix $D/road_like.mtx \
  --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
  --matrix $D/dense_rows_mix.mtx --matrix $D/banded_fem_medium.mtx \
  --matrix $D/random_uniform.mtx --matrix $D/ml_laplace_like.mtx \
  --matrix $D/fem3d_cube.mtx --matrix $D/banded_fem_large.mtx \
  --output-dir result_tpu_r3 --autotune --iterations 32 --rounds 2 \
  --kernels serial_csr,serial_hll,xla_csr,xla_ell,pallas_sell,pallas_hll,pallas_sell_sigma,pallas_sell_dd \
  --resume >> $LOG 2>&1"

# 2. finish the f32 PR rows (retry watcher may have been cut at 20:30)
if ! grep -q "^PRF32RETRY EXIT 0" "$LOG" 2>/dev/null; then
  run_stage PRF32RESUME 5400 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
    --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
    --matrix $D/road_like.mtx --matrix $D/dense_rows_mix.mtx \
    --matrix $D/random_uniform.mtx \
    --output-dir result_tpu_r3_pr2 --iterations 32 --rounds 2 \
    --kernels serial_csr,pallas_pr --resume >> $LOG 2>&1"
fi

# 3. ladder curves for every suite matrix (CSV-resume-aware)
run_stage LADDERS2 9000 "python probes/run_r3_ladders.py >> probes/ladders_r3.out 2>&1"

# 4-8. v4 probe stages, only if v4 didn't complete them
v4_done SGWEBBASE probes/sg_tpu_webbase.out || \
  run_stage SGWEBBASE2 1200 "python probes/sg_tpu_r3.py webbase_full \
    > probes/sg_tpu_webbase.out 2> probes/sg_tpu_webbase.err"

v4_done BSRPROBE probes/bsr_spmm_tpu.out || \
  run_stage BSRPROBE2 2400 "python probes/bsr_spmm_tpu.py \
    > probes/bsr_spmm_tpu.out 2> probes/bsr_spmm_tpu.err"

v4_done WLSHED probes/wlshed_ab_tpu.out || \
  run_stage WLSHED2 3000 "python probes/wlshed_ab_tpu.py > probes/wlshed_ab_tpu.out 2>&1"

v4_done BF16AB probes/bf16_ab_tpu.out || \
  run_stage BF16AB2 2400 "python probes/bf16_ab_tpu.py \
    > probes/bf16_ab_tpu.out 2> probes/bf16_ab_tpu.err"

v4_done SPMMAB probes/spmm_sell_tpu.out || \
  run_stage SPMMAB2 2400 "python probes/spmm_sell_tpu.py \
    > probes/spmm_sell_tpu.out 2> probes/spmm_sell_tpu.err"

# 9. merge PR rows into the main result dir (host-side, no TPU)
python probes/merge_pr_rows.py >> "$LOG" 2>&1

echo "CHAIN5 DONE $(date)" >> "$LOG"
