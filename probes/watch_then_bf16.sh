#!/bin/sh
# Post-chain watcher: once r3_chain3.sh exits, if the TPU worker is alive
# and the clock allows, run the bf16 A/B probe (probes/bf16_ab_tpu.py).
# One-TPU-process rule: starts only after the chain PID is gone, and
# re-gates before touching the device.
cd /root/repo
END_TS=$(date -d "${BF16_END:-09:00 tomorrow}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 40000 ))

chain_alive() {
  CP=$(cat /tmp/chain3.pid 2>/dev/null)
  [ -n "$CP" ] || return 1
  grep -q "r3_chain3" "/proc/$CP/cmdline" 2>/dev/null
}

while chain_alive; do
  [ "$(date +%s)" -ge "$END_TS" ] && exit 0
  sleep 120
done

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
timeout "$LEFT" python probes/bf16_ab_tpu.py \
  > probes/bf16_ab_tpu.out 2> probes/bf16_ab_tpu.err
echo "BF16 WATCHER EXIT $? $(date)" >> /root/repo/sweep_r3.log
