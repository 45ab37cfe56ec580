#!/bin/sh
# Round-5 chain v5: takes over after v4's AMZSPLIT stage, replacing v4's
# remaining schedule with the fem127 compile bisect + per-bin measurement
# (the multi-kernel 127M program 500s even with split bins):
#
#   FEM127DIAG   — abstract compiles isolating the failing resource
#   FEM127PERBIN — per-bin-jit f32+dd measurement (sidesteps the program)
#   KKTI16       — kkt sb-list int16 A/B
#   NEWMAT3      — resume cop20k/cfd autotuned sweep
#   LADDERS      — remaining-suite ladder sweep
cd /root/repo || exit 1
LOG=/root/repo/sweep_r5.log
END_TS=$(date -d "${CHAIN_END:-2026-08-21 03:30}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 14400 ))

while ! grep -q "AMZSPLIT EXIT" "$LOG" 2>/dev/null; do
  [ "$(date +%s)" -ge "$END_TS" ] && exit 0
  sleep 45
done
V4=$(cat /tmp/chain_r5v4.pid 2>/dev/null)
[ -n "$V4" ] && kill "$V4" 2>/dev/null
sleep 5
while :; do
  [ "$(date +%s)" -ge "$END_TS" ] && exit 0
  ps ax -o cmd | grep -E "[b]ench\.cli --(suite-entry|matrix)|[r]un_r5_ladders\.py" \
    > /dev/null || break
  sleep 30
done
echo "CHAIN-R5v5 BOOT $(date)" >> "$LOG"

wait_tpu() {
  while :; do
    NOW=$(date +%s)
    [ "$NOW" -ge "$END_TS" ] && return 1
    if python - >> /tmp/tpu_gate.log 2>&1 <<'EOF'
import os, threading, time
def bail():
    time.sleep(840)
    print("gate self-deadline", flush=True)
    os._exit(3)
threading.Thread(target=bail, daemon=True).start()
import numpy as np, jax, jax.numpy as jnp
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
print("TPU OK", time.strftime("%F %T"), flush=True)
EOF
    then
      return 0
    fi
    sleep 240
  done
}

budget() {
  NOW=$(date +%s); LEFT=$((END_TS - NOW + 900))
  [ "$LEFT" -lt 120 ] && LEFT=120
  [ "$LEFT" -gt "$1" ] && LEFT=$1
  echo "$LEFT"
}

checkpoint() {
  for p in result_tpu_r5 result_tpu_r5_kkti16 result_tpu_r5_newmat \
           probes/fem127_diag_r5.out probes/fem127_perbin_r5.out \
           sweep_r5.log; do
    [ -e "$p" ] && git add -A "$p" 2>/dev/null
  done
  git diff --cached --quiet 2>/dev/null || \
    git commit -q -m "Results: round-5 chain checkpoint ($1)"
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
  checkpoint "$tag"
  return $rc
}

CLI="python -m sparsematrixvectormultiplication_tpu.bench.cli"

run_stage FEM127DIAG 2400 \
  "python probes/fem127_diag_tpu.py > probes/fem127_diag_r5.out 2>&1"

run_stage FEM127PERBIN 7200 \
  "python probes/fem127_perbin_tpu.py > probes/fem127_perbin_r5.out 2>&1"

run_stage KKTI16 3000 \
  "env SPMV_SB_I16=1 $CLI --suite-entry kkt_like --sell-layout sb-list \
  --output-dir result_tpu_r5_kkti16 --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_sell_dd --resume >> $LOG 2>&1"

run_stage NEWMAT3 4200 \
  "$CLI --suite-entry econ_like --suite-entry cop20k_like \
  --suite-entry cfd_like --autotune \
  --output-dir result_tpu_r5_newmat --iterations 64 --rounds 2 \
  --kernels serial_csr,serial_hll,xla_csr,pallas_sell,pallas_hll,pallas_sell_dd \
  --resume >> $LOG 2>&1"

run_stage LADDERS 5400 \
  "python probes/run_r5_ladders.py >> $LOG 2>&1"

echo "CHAIN-R5v5 DONE $(date)" >> "$LOG"
checkpoint FINAL5
