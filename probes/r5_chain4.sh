#!/bin/sh
# Round-5 chain v3 (replaces the v2 waiter): takes over as soon as chain
# v1's FEM127 stage exits, kills the v1 driver (so its NEWMAT3/LADDERS
# caps cannot starve the high-value packed stages), drains the TPU, then
# runs the remaining round-5 stages in value order:
#
#   PKSMOKE   — packed-wl TPU lowering gate
#   BF16PK    — fem3d_cube packed bf16/f32/dd A/B (>=85% STREAM target)
#   FEM127PK  — fem3d_large packed wl f32+dd (dd >= 47.1 GF target)
#   AMZSPLIT  — amazon split composite f32+dd (>=8 GF target)
#   NEWMAT3   — econ/cop20k/cfd autotuned sweep
#   KKTI16    — kkt sb-list int16-index A/B (f32+dd)
#   LADDERS   — remaining-suite ladder sweep (split-guarded)
#   KKTSB     — kkt sb-major guarded attempt (hang class; LAST)
cd /root/repo || exit 1
LOG=/root/repo/sweep_r5.log
END_TS=$(date -d "${CHAIN_END:-2026-08-21 03:30}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 21600 ))

# 1. wait for the FEM127 stage to finish (log line "FEM127 EXIT")
while ! grep -q "FEM127 EXIT" "$LOG" 2>/dev/null; do
  [ "$(date +%s)" -ge "$END_TS" ] && exit 0
  sleep 60
done
# 2. stop the v1 driver before it launches its next stage
V1=$(cat /tmp/chain_r5.pid 2>/dev/null)
[ -n "$V1" ] && kill "$V1" 2>/dev/null
sleep 5
# 3. drain: wait until no v1 stage python holds the TPU (suffix-anchored
#    needle per CLAUDE.md drain-needle trap; [b] avoids self-match)
while :; do
  [ "$(date +%s)" -ge "$END_TS" ] && exit 0
  ps ax -o cmd | grep -E "[b]ench\.cli --(suite-entry|matrix)" > /dev/null || break
  sleep 30
done
echo "CHAIN-R5v3 BOOT $(date)" >> "$LOG"

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
  for p in result_tpu_r5 result_tpu_r5_amzsplit result_tpu_r5_fem127 \
           result_tpu_r5_fem127pk result_tpu_r5_bf16pk result_tpu_r5_kktsb \
           result_tpu_r5_kkti16 result_tpu_r5_newmat probes/pk_smoke_r5.out \
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

run_stage PKSMOKE 2400 \
  "python probes/pk_smoke.py > probes/pk_smoke_r5.out 2>&1"
PK_OK=$?

if [ "$PK_OK" -eq 0 ]; then
  run_stage BF16PK 3600 \
    "env SPMV_WL_PACK=1 $CLI --suite-entry fem3d_cube --sell-no-merge --chunk-k 8 \
    --output-dir result_tpu_r5_bf16pk --iterations 64 --rounds 2 \
    --kernels serial_csr,pallas_sell,pallas_sell_bf16,pallas_sell_dd --resume >> $LOG 2>&1"

  run_stage FEM127PK 9000 \
    "env SPMV_WL_PACK=1 SPMV_MAX_UPLOAD_MB=3300 $CLI --suite-entry fem3d_large \
    --output-dir result_tpu_r5_fem127pk --iterations 64 --rounds 2 \
    --kernels serial_csr,pallas_sell,pallas_sell_dd --resume >> $LOG 2>&1"
else
  echo "PKSMOKE FAILED — packed stages skipped $(date)" >> "$LOG"
fi

run_stage AMZSPLIT 3600 \
  "$CLI --suite-entry amazon_like \
  --output-dir result_tpu_r5_amzsplit --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_split,pallas_split_dd --resume >> $LOG 2>&1"

run_stage NEWMAT3 5400 \
  "$CLI --suite-entry econ_like --suite-entry cop20k_like \
  --suite-entry cfd_like --autotune \
  --output-dir result_tpu_r5_newmat --iterations 64 --rounds 2 \
  --kernels serial_csr,serial_hll,xla_csr,pallas_sell,pallas_hll,pallas_sell_dd \
  --resume >> $LOG 2>&1"

run_stage KKTI16 3000 \
  "env SPMV_SB_I16=1 $CLI --suite-entry kkt_like --sell-layout sb-list \
  --output-dir result_tpu_r5_kkti16 --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_sell_dd --resume >> $LOG 2>&1"

run_stage LADDERS 7200 \
  "python probes/run_r5_ladders.py >> $LOG 2>&1"

run_stage KKTSB 2700 \
  "$CLI --suite-entry kkt_like --sell-layout sb-major \
  --output-dir result_tpu_r5_kktsb --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_sell_dd --resume >> $LOG 2>&1"

echo "CHAIN-R5v3 DONE $(date)" >> "$LOG"
checkpoint FINAL3
