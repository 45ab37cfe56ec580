#!/bin/sh
# Round-3 TPU chain v6: steady-state timing passes after chain v5.
#
# The sweep times at --iterations 32 (budget); r2 measured the SAME
# kernel/matrix 63.7 GF at 64 reps vs 88.3 GF at 256 (fem3d) — rep depth
# changes the steady-state estimate materially. This chain re-times the
# matrices sitting nearest their round-3 bars at 256 reps into a separate
# result dir (result_tpu_r3_steady), autotuned, so RESULTS.md can cite
# both the sweep-timing and steady-state numbers honestly.
cd /root/repo
LOG=/root/repo/sweep_r3.log
D=/root/repo/suite_mtx
END_TS=$(date -d "${CHAIN6_END:-2026-08-20 01:15}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 30000 ))

# wait for chain5 (marker line, or its pid gone)
C5=$(cat /tmp/chain5.pid 2>/dev/null)
while :; do
  [ "$(date +%s)" -ge "$END_TS" ] && { echo "CHAIN6 deadline before chain5 end $(date)" >> "$LOG"; exit 1; }
  grep -q "CHAIN5 DONE" "$LOG" 2>/dev/null && break
  [ -n "$C5" ] && ! kill -0 "$C5" 2>/dev/null && break
  sleep 120
done
echo "CHAIN6 predecessors done $(date)" >> "$LOG"

wait_tpu() {
  while :; do
    NOW=$(date +%s)
    [ "$NOW" -ge "$END_TS" ] && return 1
    if timeout 420 python -c "
import numpy as np, jax, jax.numpy as jnp
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
print('TPU OK')" >> /tmp/tpu_gate.log 2>&1; then
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

# steady-state (256-rep) re-times of the bar-adjacent matrices
run_stage STEADY256 7200 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/road_like.mtx --matrix $D/banded_fem_medium.mtx \
  --matrix $D/thermal_like.mtx \
  --output-dir result_tpu_r3_steady --autotune --iterations 256 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_hll,pallas_sell_dd \
  --resume >> $LOG 2>&1"

# PR kernels at 256 reps on the two scattered flagships
run_stage STEADYPR 3600 "python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/powerlaw_web.mtx --matrix $D/road_like.mtx \
  --output-dir result_tpu_r3_steadypr --iterations 256 --rounds 2 \
  --kernels serial_csr,pallas_pr,pallas_pr_dd --resume >> $LOG 2>&1"

echo "CHAIN6 DONE $(date)" >> "$LOG"
