#!/bin/sh
# Round-5 TPU measurement chain — stages ordered by VERDICT r4 priority:
#
#   1. AMZDD    — amazon_like pallas_pr + pallas_pr_dd (the missing fp64-
#                 class row; ref amazon0302 fp64 = 28.02)      [VERDICT 3]
#   2. KKT      — kkt_like forced sb-list f32+dd (conversion now ~18 s
#                 after the r5 host micro-opts; .tune_skip moot) [VERDICT 2]
#   3. FEM127   — fem3d_large at the fem3d_cube-winning config
#                 (auto layout, nomerge, ck8 -> wl bins) f32+dd with the
#                 upload guard raised to 3.3 GB (dd wl ~2.9 GB) [VERDICT 1]
#   4. NEWMAT3  — econ_like/cop20k_like/cfd_like autotuned      [VERDICT 7]
#   5. LADDERS  — remaining 8 matrices, split-guarded sweep     [VERDICT 4]
#
# Chain discipline (CLAUDE.md): gate before every stage with in-process
# deadline; per-stage timeout from the global deadline budget; checkpoint
# commit after every stage; drain needles suffix-anchored.
cd /root/repo || exit 1
LOG=/root/repo/sweep_r5.log
END_TS=$(date -d "${CHAIN_END:-2026-08-21 03:30}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 23400 ))

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
  NOW=$(date +%s); LEFT=$((END_TS - NOW + 900))
  [ "$LEFT" -lt 120 ] && LEFT=120
  [ "$LEFT" -gt "$1" ] && LEFT=$1
  echo "$LEFT"
}

checkpoint() {
  for p in result_tpu_r5 result_tpu_r5_amz result_tpu_r5_kkt \
           result_tpu_r5_fem127 result_tpu_r5_newmat sweep_r5.log; do
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
echo "CHAIN-R5 BOOT $(date) end=$(date -d @$END_TS)" >> "$LOG"

# 1. amazon fp64-class rows (PR f32 + PR dd; ref fp64 28.02 thread/row)
run_stage AMZDD 2400 \
  "$CLI --suite-entry amazon_like \
  --output-dir result_tpu_r5_amz --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_pr,pallas_pr_dd --resume >> $LOG 2>&1"

# 2. kkt sb-list (the layout the .tune_skip bans kept from dd; conversion
#    is now seconds). dd target >= 15 GF (ref nlpkkt80 fp64 25.23).
run_stage KKT 3600 \
  "$CLI --suite-entry kkt_like --sell-layout sb-list \
  --output-dir result_tpu_r5_kkt --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_sell_dd --resume >> $LOG 2>&1"

# 3. fem3d_large at the cube-winning config: auto layout + nomerge + ck8
#    (r3 tile config: wl bins, pad 1.82, f32 96.9 / dd 65.0 on cube).
#    Upload guard raised for the dd wl structure (~2.9 GB, arrays < 1 GB);
#    ~70 MB/s measured tonight -> ~70 min of upload in this stage.
run_stage FEM127 10800 \
  "env SPMV_MAX_UPLOAD_MB=3300 $CLI --suite-entry fem3d_large \
  --sell-no-merge --chunk-k 8 \
  --output-dir result_tpu_r5_fem127 --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_sell,pallas_sell_dd --resume >> $LOG 2>&1"

# 4. the three new reference matrix classes, autotuned
run_stage NEWMAT3 5400 \
  "$CLI --suite-entry econ_like --suite-entry cop20k_like \
  --suite-entry cfd_like --autotune \
  --output-dir result_tpu_r5_newmat --iterations 64 --rounds 2 \
  --kernels serial_csr,serial_hll,xla_csr,pallas_sell,pallas_hll,pallas_sell_dd \
  --resume >> $LOG 2>&1"

# 5. ladder-sweep the 8 uncovered matrices (split-guarded now)
run_stage LADDERS 7200 \
  "python probes/run_r5_ladders.py >> $LOG 2>&1"

echo "CHAIN-R5 DONE $(date)" >> "$LOG"
checkpoint FINAL
