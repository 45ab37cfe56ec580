#!/bin/sh
# Round-4 chain v9 — AMZPR: amazon_like on its production kernel class
# (PR; the autotuned SELL run measured 0.25 GF — moderate-locality
# scale-free is exactly the PR regime, webbase f32 15.27) + SPLITBRK. Lets v6's LADDERS run until TAKEOVER_TS
# (~60 min of cheap-first coverage), then preempts for the three remaining
# item-6 measurements:
#   FEM127B — fem3d_large (130.7M nnz) with --sell-layout k-major: pad
#             1.21 puts f32 (1.26 GB) AND dd (1.9 GB) under the
#             worker-crash upload guards that killed the default wl build
#             (pad 1.82 -> 3.1 GB, sweep_r4.log 18:03)
#   KKTKM   — kkt_like forced k-major (the only candidate that ran: tune
#             ladders 500 on this worker, sb-family conversions 40+ min)
#   AMZ     — amazon_like autotuned (wl/sb bans active via .tune_skip),
#             own outdir so the guard is a fresh file (the `exec $*`
#             run_stage idiom SWALLOWS `&& touch` markers — v6's
#             .fem127_done/.newmat_done never materialized)
#
# Usage: nohup sh probes/r4_chain7b.sh &
cd /root/repo || exit 1
LOG=/root/repo/sweep_r4.log
END_TS=$(date -d "2026-08-20 20:05" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 6600 ))
TAKEOVER_TS=$(date -d "2026-08-20 19:55" +%s 2>/dev/null || echo 0)
[ "$TAKEOVER_TS" -eq 0 ] && TAKEOVER_TS=$(( $(date +%s) + 3000 ))

while :; do
  NOW=$(date +%s)
  [ "$NOW" -ge "$TAKEOVER_TS" ] && break
  [ -s result_tpu_r4_fem127c/spmv_results.csv ] && { sleep 10; break; }
  if [ -f /tmp/chain_r4v8.pid ] && ! kill -0 "$(cat /tmp/chain_r4v8.pid)" 2>/dev/null; then
    echo "CHAIN-R4v9: v8 dead early $(date)" >> "$LOG"; break
  fi
  sleep 20
done
P=$(cat /tmp/chain_r4v8.pid 2>/dev/null)
if [ -n "$P" ] && kill -0 "$P" 2>/dev/null; then
  kill "$P" 2>/dev/null
  echo "CHAIN-R4v9: killed v6 ($P) $(date)" >> "$LOG"
fi
# Stop the LADDERS run: it checkpoints per matrix (8/10 cheap ones fit
# before takeover), and there is no between-matrix stop hook — kill its
# python by explicit pid and let wait_tpu absorb any post-kill tunnel
# wedge (~20 min worst case, overlapping FEM127B's host-side phase).
N=0
while [ "$N" -lt 20 ]; do
  if ps -eo args | grep -v grep | grep -Eq 'run_r4_ladders\.py|bench\.cli --(matrix|suite-entry)|_tpu\.py'; then
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
  for p in result_tpu_r4 result_tpu_r4_kkt result_tpu_r4_amz result_tpu_r4_fem127 result_tpu_r4_fem127c result_tpu_r4_amzpr \
           probes/ladders_r4.out probes/split_brk_r4.out probes/pr15_diag_r4.out; do
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
echo "CHAIN-R4v9 BOOT $(date) end=$(date -d @$END_TS)" >> "$LOG"

run_stage AMZPR 1200 "result_tpu_r4_amzpr/spmv_results.csv" \
  "$CLI --suite-entry amazon_like \
  --output-dir result_tpu_r4_amzpr --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_pr >> $LOG 2>&1"

run_stage SPLITBRK 1200 "probes/split_brk_r4.out" \
  "python probes/split_breakdown_tpu.py > probes/split_brk_r4.out 2>&1"

checkpoint FINAL
echo "CHAIN-R4v9 DONE $(date)" >> "$LOG"
