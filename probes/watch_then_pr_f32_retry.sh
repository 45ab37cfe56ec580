#!/bin/sh
# Post-chain watcher (Aug 19): once r3_chain4.sh finishes (PIPELINE DONE
# or its PID is gone), re-gate the TPU and rerun the f32 PR rows for the
# scattered suite into a fresh dir. The chain's PRAPPEND ran with the
# pre-retry harness, where 2^15-row panels crash the worker's compile
# helper (HTTP 500); the harness now retries at the dd 2^14 cap, so this
# rerun should produce pallas_pr f32 rows for every matrix.
#
# Only ONE TPU process at a time: this never starts while the chain runs.
cd /root/repo
LOG=/root/repo/sweep_r3.log
D=/root/repo/suite_mtx
CHAIN_PID=$(cat /tmp/chain4.pid 2>/dev/null)
END_TS=$(date -d "${RETRY_END:-20:30 today}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 36000 ))

while :; do
  [ "$(date +%s)" -ge "$END_TS" ] && { echo "PRF32RETRY deadline before chain end $(date)" >> "$LOG"; exit 1; }
  grep -q "PIPELINE DONE" "$LOG" 2>/dev/null && break
  [ -n "$CHAIN_PID" ] && ! kill -0 "$CHAIN_PID" 2>/dev/null && break
  sleep 120
done

# re-gate (chain exit may coincide with a worker wobble)
while :; do
  NOW=$(date +%s)
  [ "$NOW" -ge "$END_TS" ] && { echo "PRF32RETRY deadline at gate $(date)" >> "$LOG"; exit 1; }
  if timeout 420 python -c "
import numpy as np, jax, jax.numpy as jnp
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
print('TPU OK')" >> /tmp/tpu_gate.log 2>&1; then break; fi
  sleep 120
done

LEFT=$(( END_TS - $(date +%s) + 600 ))
[ "$LEFT" -lt 300 ] && LEFT=300
[ "$LEFT" -gt 5400 ] && LEFT=5400
echo "PRF32RETRY START (budget ${LEFT}s) $(date)" >> "$LOG"
timeout "$LEFT" python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
  --matrix $D/road_like.mtx --matrix $D/dense_rows_mix.mtx \
  --matrix $D/random_uniform.mtx \
  --output-dir result_tpu_r3_pr2 --iterations 32 --rounds 2 \
  --kernels serial_csr,pallas_pr --resume >> "$LOG" 2>&1
echo "PRF32RETRY EXIT $? $(date)" >> "$LOG"
