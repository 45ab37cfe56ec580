#!/bin/sh
# Post-chain watcher: once r3_chain2.sh exits, if the TPU worker is alive
# and the clock allows, run the BSR MXU SpMM probe (probes/bsr_spmm_tpu.py).
# One-TPU-process rule: starts only after the chain PID is gone, and
# re-gates before touching the device.
cd /root/repo
END_TS=$(date -d "${BSR_END:-00:40 tomorrow}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 39000 ))

# chain-alive test: pid file read EVERY loop (restarts rewrite it), and the
# pid must still be the chain (guards stale files / PID reuse) — checked
# read-only via /proc cmdline, never by pattern-kill.
chain_alive() {
  CP=$(cat /tmp/chain2.pid 2>/dev/null)
  [ -n "$CP" ] || return 1
  grep -q "r3_chain2" "/proc/$CP/cmdline" 2>/dev/null
}

while chain_alive; do
  [ "$(date +%s)" -ge "$END_TS" ] && exit 0
  sleep 120
done

# chain gone — gate once (worker may be mid-outage; don't loop for hours)
while :; do
  NOW=$(date +%s)
  [ "$NOW" -ge "$END_TS" ] && exit 0
  if timeout 300 python -c "
import numpy as np, jax, jax.numpy as jnp
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
print('TPU OK')" >> /tmp/tpu_gate.log 2>&1; then
    break
  fi
  sleep 120
done

LEFT=$(( END_TS - $(date +%s) + 600 ))
[ "$LEFT" -lt 120 ] && LEFT=120
[ "$LEFT" -gt 2400 ] && LEFT=2400
timeout "$LEFT" python probes/bsr_spmm_tpu.py \
  > probes/bsr_spmm_tpu.out 2> probes/bsr_spmm_tpu.err
echo "BSR WATCHER EXIT $? $(date)" >> /root/repo/sweep_r3.log
