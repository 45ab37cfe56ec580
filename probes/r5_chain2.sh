#!/bin/sh
# Round-5 chain v2 — waits for chain v1 (pid file /tmp/chain_r5.pid) to
# exit, then measures the NEW levers built while v1 ran:
#
#   1. PKSMOKE  — packed-wl TPU lowering gate (bit-equality vs unpacked)
#   2. BF16PK   — fem3d_cube bf16 packed vs unpacked (>=85% STREAM target)
#   3. FEM127PK — fem3d_large packed wl f32+dd (dd >= 47.1 GF target)
#   4. AMZSPLIT — amazon locality-split composite f32+dd (>=8 GF target)
#   5. KKTSB    — kkt sb-major guarded attempt (r4 device-hang class; LAST)
#
# Every packed stage is gated on PKSMOKE's exit code.
cd /root/repo || exit 1
LOG=/root/repo/sweep_r5.log
END_TS=$(date -d "${CHAIN_END:-2026-08-21 03:30}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 21600 ))

# wait for chain v1 to finish (its pid is the sh driver)
V1=$(cat /tmp/chain_r5.pid 2>/dev/null)
while [ -n "$V1" ] && kill -0 "$V1" 2>/dev/null; do
  [ "$(date +%s)" -ge "$END_TS" ] && exit 0
  sleep 60
done
echo "CHAIN-R5v2 BOOT $(date) (v1 done)" >> "$LOG"

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
  for p in result_tpu_r5 result_tpu_r5_amzsplit result_tpu_r5_fem127pk \
           result_tpu_r5_bf16pk result_tpu_r5_kktsb probes/pk_smoke_r5.out \
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
  # bf16 A/B: packed (the 16%-STREAM-gap lever) — fem3d_cube built in-process
  run_stage BF16PK 3600 \
    "env SPMV_WL_PACK=1 $CLI --suite-entry fem3d_cube --sell-no-merge --chunk-k 8 \
    --output-dir result_tpu_r5_bf16pk --iterations 64 --rounds 2 \
    --kernels serial_csr,pallas_sell,pallas_sell_bf16,pallas_sell_dd --resume >> $LOG 2>&1"

  # the dd-at-127M shot: packed wl cuts dd upload ~2.9 -> ~2.1 GB and
  # streamed bytes 12 -> 9 B/slot
  run_stage FEM127PK 9000 \
    "env SPMV_WL_PACK=1 SPMV_MAX_UPLOAD_MB=3300 $CLI --suite-entry fem3d_large \
    --sell-no-merge --chunk-k 8 \
    --output-dir result_tpu_r5_fem127pk --iterations 64 --rounds 2 \
    --kernels serial_csr,pallas_sell,pallas_sell_dd --resume >> $LOG 2>&1"
else
  echo "PKSMOKE FAILED — packed stages skipped $(date)" >> "$LOG"
fi

# amazon locality-split composite (80% links within +-1000 cols: the
# split's near SELL should beat pure PR's 6.84)
run_stage AMZSPLIT 3600 \
  "$CLI --suite-entry amazon_like \
  --output-dir result_tpu_r5_amzsplit --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_split,pallas_split_dd --resume >> $LOG 2>&1"

# kkt sb-major — the r4 device-hang candidate, guarded by the stage
# timeout; LAST so a wedged tunnel can't eat other stages
run_stage KKTSB 2700 \
  "$CLI --suite-entry kkt_like --sell-layout sb-major \
  --output-dir result_tpu_r5_kktsb --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_sell_dd --resume >> $LOG 2>&1"

echo "CHAIN-R5v2 DONE $(date)" >> "$LOG"
checkpoint FINAL2
