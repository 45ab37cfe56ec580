#!/bin/sh
# Round-5 chain v7: after the dd-first fem127 per-bin probe (pid in
# /tmp/perbin2.pid) finishes, run KKTI16 then whatever fits until
# CHAIN_END. Minimal tail chain for the last hours of round 5.
cd /root/repo || exit 1
LOG=/root/repo/sweep_r5.log
END_TS=$(date -d "${CHAIN_END:-2026-08-21 03:30}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 10800 ))

P=$(cat /tmp/perbin2.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do
  [ "$(date +%s)" -ge "$END_TS" ] && exit 0
  sleep 45
done
git add -A probes/fem127_perbin_r5.out 2>/dev/null
git diff --cached --quiet 2>/dev/null || \
  git commit -q -m "Results: fem127 per-bin probe output"
echo "CHAIN-R5v7 BOOT $(date)" >> "$LOG"

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
    sleep 180
  done
}

budget() {
  NOW=$(date +%s); LEFT=$((END_TS - NOW + 600))
  [ "$LEFT" -lt 120 ] && LEFT=120
  [ "$LEFT" -gt "$1" ] && LEFT=$1
  echo "$LEFT"
}

checkpoint() {
  for p in result_tpu_r5_kkti16 result_tpu_r5_newmat sweep_r5.log \
           probes/fem127_perbin_r5.out; do
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

run_stage KKTI16 2700 \
  "env SPMV_SB_I16=1 $CLI --suite-entry kkt_like --sell-layout sb-list \
  --output-dir result_tpu_r5_kkti16 --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_sell_dd --resume >> $LOG 2>&1"

run_stage NEWMAT3 3600 \
  "$CLI --suite-entry cop20k_like --suite-entry cfd_like --autotune \
  --output-dir result_tpu_r5_newmat --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_sell_dd --resume >> $LOG 2>&1"

echo "CHAIN-R5v7 DONE $(date)" >> "$LOG"
checkpoint FINAL7
