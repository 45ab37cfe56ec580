#!/bin/sh
# Round-4 chain v6c (drain cap 150x30s: outlasts an orphaned NEWMAT) — preempts v5 after SPLITROAD2 to promote MLSTEADY (the
# on-device validation of the span-resolved chunk fix c799e9e: default auto
# now rebuilds r2's winning ck8 structure; 256-rep pallas_sell + dd) ahead
# of the long NEWMAT/FEM127/LADDERS tail, then continues that tail guarded.
#
# Usage: CHAIN_END="2026-08-20 19:40" nohup sh probes/r4_chain6.sh &
cd /root/repo || exit 1
LOG=/root/repo/sweep_r4.log
D=/root/repo/suite_mtx
END_TS=$(date -d "${CHAIN_END:-2026-08-20 19:40}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 21000 ))

# ---- takeover: wait for SPLITROAD2's output (or v5 death) ----
while :; do
  [ -s result_tpu_r4_split/spmv_results.csv ] && break
  if [ -f /tmp/chain_r4v5.pid ] && ! kill -0 "$(cat /tmp/chain_r4v5.pid)" 2>/dev/null; then
    echo "CHAIN-R4v6: v5 already dead $(date)" >> "$LOG"; break
  fi
  [ "$(date +%s)" -ge "$END_TS" ] && exit 1
  sleep 20
done
P=$(cat /tmp/chain_r4v5.pid 2>/dev/null)
if [ -n "$P" ] && kill -0 "$P" 2>/dev/null; then
  sleep 8
  kill "$P" 2>/dev/null
  echo "CHAIN-R4v6: killed v5 ($P) $(date)" >> "$LOG"
fi
N=0
while [ "$N" -lt 150 ]; do
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

wait_file() {
  for f in "$@"; do
    while [ ! -f "$f" ]; do
      [ "$(date +%s)" -ge "$END_TS" ] && return 1
      sleep 20
    done
  done
  return 0
}

budget() {
  NOW=$(date +%s); LEFT=$((END_TS - NOW + 900))
  [ "$LEFT" -lt 120 ] && LEFT=120
  [ "$LEFT" -gt "$1" ] && LEFT=$1
  echo "$LEFT"
}

checkpoint() {
  for p in result_tpu_r4 result_tpu_r4_ml result_tpu_r4_mlab result_tpu_r4_mlr2 \
           result_tpu_r4_mld result_tpu_r4_mlck8 result_tpu_r4_mlsteady \
           result_tpu_r4_pr result_tpu_r4_road result_tpu_r4_split \
           probes/bf16_ab_r4.out probes/spmm_sell_r4.out probes/bsr_spmm_r4.out \
           probes/pr15_diag_r4.out probes/ladders_r4.out probes/split_brk_r4.out \
           probes/bsr_fix_r4.out; do
    [ -e "$p" ] && git add -A "$p" 2>/dev/null
  done
  git diff --cached --quiet 2>/dev/null || \
    git commit -q -m "Results: round-4 chain checkpoint ($1)"
}

run_stage() {
  tag=$1; cap=$2; need=$3; guard=$4; shift 4
  if [ -n "$guard" ] && [ -s "$guard" ]; then
    echo "$tag SKIPPED (already have $guard) $(date)" >> "$LOG"
    return 0
  fi
  if [ -n "$need" ] && ! wait_file $need; then
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
  checkpoint "$tag"
  return $rc
}

CLI="python -m sparsematrixvectormultiplication_tpu.bench.cli"
echo "CHAIN-R4v6 BOOT $(date) end=$(date -d @$END_TS)" >> "$LOG"

# the fixed-default on-device validation (f32 >=30 + dd >=15 bars)
run_stage MLSTEADY 1800 "$D/ml_laplace_like.mtx" "result_tpu_r4_mlsteady/spmv_results.csv" \
  "$CLI --matrix $D/ml_laplace_like.mtx \
  --output-dir result_tpu_r4_mlsteady --iterations 256 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_hll,pallas_sell_dd >> $LOG 2>&1"

# f32 BSR re-measure with the HIGHEST-precision dot fix (b4959ee) — the
# first BSR run measured 1.21 TF/s but with Mosaic's default bf16-pass f32
# matmul (31M sig_diffs); bf16 rows of that run remain honest
run_stage BSRFIX 2400 "" "probes/bsr_fix_r4.out" \
  "python probes/bsr_spmm_tpu.py > probes/bsr_fix_r4.out 2>&1"

run_stage NEWMAT 3600 "" "result_tpu_r4/.newmat_done" \
  "$CLI --suite-entry kkt_like --suite-entry amazon_like --autotune \
  --output-dir result_tpu_r4 --iterations 64 --rounds 2 \
  --kernels serial_csr,serial_hll,xla_csr,xla_ell,pallas_sell,pallas_hll,pallas_sell_sigma,pallas_sell_dd \
  --resume >> $LOG 2>&1 && touch result_tpu_r4/.newmat_done"
run_stage FEM127 5400 "" "result_tpu_r4/.fem127_done" \
  "$CLI --suite-entry fem3d_large \
  --output-dir result_tpu_r4 --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_sell_dd --resume >> $LOG 2>&1 \
  && touch result_tpu_r4/.fem127_done"
run_stage LADDERS 5400 "$D/random_uniform.mtx" "probes/ladders_r4.out" \
  "python probes/run_r4_ladders.py > probes/ladders_r4.out 2>&1"
run_stage SPLITBRK 1500 "$D/road_like.mtx" "probes/split_brk_r4.out" \
  "python probes/split_breakdown_tpu.py > probes/split_brk_r4.out 2>&1"
run_stage PR15DIAG 1500 "$D/powerlaw_web.mtx" "probes/pr15_diag_r4.out" \
  "python probes/pr15_diag.py > probes/pr15_diag_r4.out 2>&1"

checkpoint FINAL
echo "CHAIN-R4v6 DONE $(date)" >> "$LOG"
