#!/bin/sh
# Round-4 TPU measurement chain — stages ordered by VERDICT r3 priority:
#
#   1. MLSB     — ml_laplace forced sb-major (r2's winning layout; the r3
#                 auto/wl pick regressed 26 -> 16 GF)           [VERDICT 1]
#   2. BF16AB   — bf16 value-plane A/B on fem3d + banded        [VERDICT 2]
#   3. SPMM     — multi-RHS SELL SpMM R in {1,8,16}             [VERDICT 2]
#   4. BSR      — MXU block-sparse SpMM                         [VERDICT 2]
#   5. PRF32    — f32 PR rows, powerlaw + webbase (2^14 panels) [VERDICT 4]
#   6. NEWMAT   — kkt_like + amazon_like autotuned sweep        [VERDICT 6]
#   7. ROAD256  — road sblist + default at 256 reps             [VERDICT 3]
#   8. FEM127   — fem3d_large 127M realistic FEM                [VERDICT 6]
#   9. LADDERS  — whole-suite K-ladder curves (resume-aware)    [VERDICT 5]
#  10. PR15DIAG — one 2^15-row PR panel compile, capture error  [VERDICT 9]
#
# ADVICE r3 fixes baked in: per-directory git add (one bad pathspec can't
# abort staging), gate deadline enforced INSIDE the python process (no
# SIGTERM mid-transfer) with a long backoff after failures, and wait_file
# on every input a stage reads.
#
# Usage: CHAIN_END="2026-08-20 18:30" nohup sh probes/r4_chain.sh &
cd /root/repo || exit 1
LOG=/root/repo/sweep_r4.log
D=/root/repo/suite_mtx
END_TS=$(date -d "${CHAIN_END:-2026-08-20 18:30}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 25200 ))

wait_tpu() {
  while :; do
    NOW=$(date +%s)
    [ "$NOW" -ge "$END_TS" ] && return 1
    # the gate process enforces its own deadline (clean os._exit AFTER the
    # transfer API returns control, never a signal mid-transfer — killing a
    # TPU process mid-flight wedges the tunnel for ~20 min, CLAUDE.md)
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
  for p in result_tpu_r4 result_tpu_r4_ml result_tpu_r4_pr result_tpu_r4_road \
           probes/bf16_ab_r4.out probes/spmm_sell_r4.out probes/bsr_spmm_r4.out \
           probes/pr15_diag_r4.out probes/ladders_r4.out; do
    [ -e "$p" ] && git add -A "$p" 2>/dev/null
  done
  git diff --cached --quiet 2>/dev/null || \
    git commit -q -m "Results: round-4 chain checkpoint ($1)"
}

run_stage() {
  tag=$1; cap=$2; need=$3; shift 3
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
echo "CHAIN-R4 BOOT $(date) end=$(date -d @$END_TS)" >> "$LOG"

# 1. ml_laplace at the r2-winning forced sb-major layout (auto's wl pick
#    measured 16 GF in r3 vs 26 GF for r2's sb-major conversion)
run_stage MLSB 2400 "$D/ml_laplace_like.mtx" \
  "$CLI --matrix $D/ml_laplace_like.mtx --sell-layout sb-major \
  --output-dir result_tpu_r4_ml --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_hll,pallas_sell_dd --resume >> $LOG 2>&1"

# 2-4. the three round-3 kernels with zero TPU numbers
run_stage BF16AB 2400 "" \
  "python probes/bf16_ab_tpu.py > probes/bf16_ab_r4.out 2>&1"
run_stage SPMM 2400 "" \
  "python probes/spmm_sell_tpu.py > probes/spmm_sell_r4.out 2>&1"
run_stage BSR 2400 "" \
  "python probes/bsr_spmm_tpu.py > probes/bsr_spmm_r4.out 2>&1"

# 5. f32 PR rows for the two scattered flagships (TPU path now goes
#    straight to the known-good 2^14-row panels)
run_stage PRF32 2400 "$D/powerlaw_web.mtx $D/webbase_like.mtx" \
  "$CLI --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
  --output-dir result_tpu_r4_pr --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_pr --resume >> $LOG 2>&1"

# 6. the two new reference matrix classes, autotuned
run_stage NEWMAT 3600 "" \
  "$CLI --suite-entry kkt_like --suite-entry amazon_like --autotune \
  --output-dir result_tpu_r4 --iterations 64 --rounds 2 \
  --kernels serial_csr,serial_hll,xla_csr,xla_ell,pallas_sell,pallas_hll,pallas_sell_sigma,pallas_sell_dd \
  --resume >> $LOG 2>&1"

# 7. road at 256-rep steady timing: tuned sblist vs default, f32
run_stage ROAD256 2000 "$D/road_like.mtx" \
  "$CLI --matrix $D/road_like.mtx --sell-layout sb-list \
  --output-dir result_tpu_r4_road --iterations 256 --rounds 2 \
  --kernels serial_csr,pallas_sell --resume >> $LOG 2>&1"

# 8. the 127M realistic FEM (reference Cube_Coup_dt0 size), built in-process
run_stage FEM127 5400 "" \
  "$CLI --suite-entry fem3d_large \
  --output-dir result_tpu_r4 --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_sell_dd --resume >> $LOG 2>&1"

# 9. whole-suite ladder curves (resume-aware; writes result_tpu_r4 CSV)
run_stage LADDERS 7200 "$D/random_uniform.mtx" \
  "python probes/run_r4_ladders.py > probes/ladders_r4.out 2>&1"

# 10. diagnose the 2^15-row PR panel compile-helper 500
run_stage PR15DIAG 1800 "$D/powerlaw_web.mtx" \
  "python probes/pr15_diag.py > probes/pr15_diag_r4.out 2>&1"

checkpoint FINAL
echo "CHAIN-R4 DONE $(date)" >> "$LOG"
