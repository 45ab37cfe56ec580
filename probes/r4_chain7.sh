#!/bin/sh
# Round-4 chain v7 — endgame recovery after FEM127: both NEWMAT attempts
# burned their budgets inside kkt_like's autotune (HTTP-500 ladders + a
# ~50-min sb-family host conversion; see .tune_skip). Measure the new
# matrices WITHOUT the pathological candidates:
#   KKTKM  — kkt_like, forced k-major (the one candidate measured working:
#            9.23 ms), no autotune
#   AMZ    — amazon_like, autotuned (wl/sb bans active via .tune_skip)
# then LADDERS / SPLITBRK / PR15DIAG second chances.
#
# Usage: CHAIN_END="2026-08-20 19:55" nohup sh probes/r4_chain7.sh &
cd /root/repo || exit 1
LOG=/root/repo/sweep_r4.log
D=/root/repo/suite_mtx
END_TS=$(date -d "${CHAIN_END:-2026-08-20 19:55}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 10000 ))

# ---- takeover: wait for FEM127's guard (or v6 death) ----
while :; do
  [ -e result_tpu_r4/.fem127_done ] && break
  if [ -f /tmp/chain_r4v6.pid ] && ! kill -0 "$(cat /tmp/chain_r4v6.pid)" 2>/dev/null; then
    echo "CHAIN-R4v7: v6 dead $(date)" >> "$LOG"; break
  fi
  [ "$(date +%s)" -ge "$END_TS" ] && exit 1
  sleep 20
done
P=$(cat /tmp/chain_r4v6.pid 2>/dev/null)
if [ -n "$P" ] && kill -0 "$P" 2>/dev/null; then
  sleep 8
  kill "$P" 2>/dev/null
  echo "CHAIN-R4v7: killed v6 ($P) $(date)" >> "$LOG"
fi
N=0
while [ "$N" -lt 90 ]; do
  if ps -eo args | grep -v grep | grep -Eq 'bench\.cli --(matrix|suite-entry)|_tpu\.py|run_r4_ladders\.py|pr15_diag\.py'; then
    sleep 30; N=$((N+1))
  else
    break
  fi
done

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
      echo "gate pass $(date)" >> /tmp/tpu_gate.log
      return 0
    fi
    sleep 240
  done
}

budget() {
  NOW=$(date +%s); LEFT=$((END_TS - NOW + 600))
  [ "$LEFT" -lt 120 ] && LEFT=120
  [ "$LEFT" -gt "$1" ] && LEFT=$1
  echo "$LEFT"
}

checkpoint() {
  for p in result_tpu_r4 result_tpu_r4_kkt result_tpu_r4_mlsteady \
           probes/ladders_r4.out probes/split_brk_r4.out probes/pr15_diag_r4.out \
           probes/bsr_fix_r4.out; do
    [ -e "$p" ] && git add -A "$p" 2>/dev/null
  done
  git diff --cached --quiet 2>/dev/null || \
    git commit -q -m "Results: round-4 chain checkpoint ($1)"
}

run_stage() {
  tag=$1; cap=$2; guard=$3; shift 3
  if [ -n "$guard" ] && [ -s "$guard" ]; then
    echo "$tag SKIPPED (already have $guard) $(date)" >> "$LOG"
    return 0
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
  checkpoint "$tag"
  return $rc
}

CLI="python -m sparsematrixvectormultiplication_tpu.bench.cli"
echo "CHAIN-R4v7 BOOT $(date) end=$(date -d @$END_TS)" >> "$LOG"

run_stage KKTKM 1500 "result_tpu_r4_kkt/spmv_results.csv" \
  "$CLI --suite-entry kkt_like --sell-layout k-major \
  --output-dir result_tpu_r4_kkt --iterations 64 --rounds 2 \
  --kernels serial_csr,serial_hll,xla_ell,pallas_sell,pallas_hll,pallas_sell_dd \
  >> $LOG 2>&1"

run_stage AMZ 1800 "result_tpu_r4/.amz_done" \
  "$CLI --suite-entry amazon_like --autotune \
  --output-dir result_tpu_r4 --iterations 64 --rounds 2 \
  --kernels serial_csr,serial_hll,xla_csr,xla_ell,pallas_sell,pallas_hll,pallas_sell_sigma,pallas_sell_dd \
  --resume >> $LOG 2>&1 && touch result_tpu_r4/.amz_done"

run_stage LADDERS 3600 "probes/ladders_r4.out" \
  "python probes/run_r4_ladders.py > probes/ladders_r4.out 2>&1"
run_stage SPLITBRK 1200 "probes/split_brk_r4.out" \
  "python probes/split_breakdown_tpu.py > probes/split_brk_r4.out 2>&1"
run_stage PR15DIAG 1200 "probes/pr15_diag_r4.out" \
  "python probes/pr15_diag.py > probes/pr15_diag_r4.out 2>&1"

checkpoint FINAL
echo "CHAIN-R4v7 DONE $(date)" >> "$LOG"
