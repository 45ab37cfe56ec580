#!/bin/sh
# Round-4 chain v5 — preempts v3/v4 after the MLDEFAULT stage to run the two
# ml_laplace bisect stages the v2 `exec`-bug killed (VERDICT r4 item 1):
#
#   MLABR2 — the LITERAL r2-sweep code (.r2tree @ 8acf498) on today's
#            matrix + worker: separates code regression from environment.
#   MLCK8  — today's code, sb-major + no-merge + --chunk-k 8: tests the
#            r3 "K>64 -> ck16" wide-bin rule as the regression cause
#            (r2 ran ck=8/span=20; r4 auto runs ck=16/span=24 at 18.4 GF).
#
# Then the remaining round-4 stages in VERDICT-priority order, all guarded.
# Subsumes v4 (kills it before it can race on v3's death).
# Drain needles are suffix-anchored: the autocommit watcher's command
# line contains 'probes/bf16_ab_r4.out' etc. and matched the v3/v4
# prefix needles, pinning their drain loops at the 30-min cap.
#
# Usage: CHAIN_END="2026-08-20 19:40" nohup sh probes/r4_chain5.sh &
cd /root/repo || exit 1
LOG=/root/repo/sweep_r4.log
D=/root/repo/suite_mtx
END_TS=$(date -d "${CHAIN_END:-2026-08-20 19:40}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 25000 ))

# ---- takeover: wait for MLDEFAULT's output (or v3 death), then preempt ----
while :; do
  [ -s result_tpu_r4_mld/spmv_results.csv ] && break
  if [ -f /tmp/chain_r4v3.pid ] && ! kill -0 "$(cat /tmp/chain_r4v3.pid)" 2>/dev/null; then
    echo "CHAIN-R4v5: v3 already dead $(date)" >> "$LOG"; break
  fi
  [ "$(date +%s)" -ge "$END_TS" ] && exit 1
  sleep 20
done
for pf in /tmp/chain_r4v4.pid /tmp/chain_r4v3.pid; do
  P=$(cat "$pf" 2>/dev/null)
  if [ -n "$P" ] && kill -0 "$P" 2>/dev/null; then
    sleep 5
    kill "$P" 2>/dev/null
    echo "CHAIN-R4v5: killed $pf ($P) $(date)" >> "$LOG"
  fi
done
N=0
while [ "$N" -lt 60 ]; do
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
           probes/pr15_diag_r4.out probes/ladders_r4.out probes/split_brk_r4.out; do
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
echo "CHAIN-R4v5 BOOT $(date) end=$(date -d @$END_TS)" >> "$LOG"

# --- VERDICT item 1: ml_laplace bisect ---
run_stage MLABR2 2000 "$D/ml_laplace_like.mtx" "result_tpu_r4_mlr2/spmv_results.csv" \
  "sh probes/mlab_r2.sh >> $LOG 2>&1"

run_stage MLCK8 2000 "$D/ml_laplace_like.mtx" "result_tpu_r4_mlck8/spmv_results.csv" \
  "$CLI --matrix $D/ml_laplace_like.mtx --sell-layout sb-major --sell-no-merge \
  --chunk-k 8 --output-dir result_tpu_r4_mlck8 --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_sell >> $LOG 2>&1"

# --- VERDICT item 2: the three unmeasured kernels ---
run_stage BF16AB 2400 "" "probes/bf16_ab_r4.out" \
  "python probes/bf16_ab_tpu.py > probes/bf16_ab_r4.out 2>&1"
run_stage SPMM 2400 "" "probes/spmm_sell_r4.out" \
  "python probes/spmm_sell_tpu.py > probes/spmm_sell_r4.out 2>&1"
run_stage BSR 2400 "" "probes/bsr_spmm_r4.out" \
  "python probes/bsr_spmm_tpu.py > probes/bsr_spmm_r4.out 2>&1"

# --- VERDICT item 4: f32 PR rows ---
run_stage PRF32 2400 "$D/powerlaw_web.mtx $D/webbase_like.mtx" "result_tpu_r4_pr/spmv_results.csv" \
  "$CLI --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
  --output-dir result_tpu_r4_pr --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_pr --resume >> $LOG 2>&1"

# --- VERDICT item 3: road ---
run_stage ROAD256 2000 "$D/road_like.mtx" "result_tpu_r4_road/spmv_results.csv" \
  "$CLI --matrix $D/road_like.mtx --sell-layout sb-list \
  --output-dir result_tpu_r4_road --iterations 256 --rounds 2 \
  --kernels serial_csr,pallas_sell --resume >> $LOG 2>&1"
run_stage SPLITROAD2 2400 "$D/road_like.mtx" "result_tpu_r4_split/spmv_results.csv" \
  "$CLI --matrix $D/road_like.mtx \
  --output-dir result_tpu_r4_split --iterations 256 --rounds 2 \
  --kernels serial_csr,pallas_split,pallas_split_dd >> $LOG 2>&1"

# --- VERDICT item 6: new matrix classes + 127M flagship ---
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

# --- VERDICT item 5: ladder observability (resume-aware, cheap-first) ---
run_stage LADDERS 5400 "$D/random_uniform.mtx" "probes/ladders_r4.out" \
  "python probes/run_r4_ladders.py > probes/ladders_r4.out 2>&1"

# --- steady re-times + diagnostics ---
run_stage MLSTEADY 1500 "$D/ml_laplace_like.mtx" "result_tpu_r4_mlsteady/spmv_results.csv" \
  "$CLI --matrix $D/ml_laplace_like.mtx \
  --output-dir result_tpu_r4_mlsteady --iterations 256 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_sell_dd >> $LOG 2>&1"
run_stage SPLITBRK 1500 "$D/road_like.mtx" "probes/split_brk_r4.out" \
  "python probes/split_breakdown_tpu.py > probes/split_brk_r4.out 2>&1"
run_stage PR15DIAG 1500 "$D/powerlaw_web.mtx" "probes/pr15_diag_r4.out" \
  "python probes/pr15_diag.py > probes/pr15_diag_r4.out 2>&1"

checkpoint FINAL
echo "CHAIN-R4v5 DONE $(date)" >> "$LOG"
