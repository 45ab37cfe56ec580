#!/bin/sh
# Post-chain watcher: once r3_chain3.sh exits, if the TPU worker is alive
# and the clock allows, run the round's late probes sequentially:
#   1. bf16 value-plane A/B   (probes/bf16_ab_tpu.py)
#   2. multi-RHS SELL SpMM A/B (probes/spmm_sell_tpu.py)
# One-TPU-process rule: starts only after the chain PID is gone, and
# re-gates before each probe.
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

gate() {
  while :; do
    NOW=$(date +%s)
    [ "$NOW" -ge "$END_TS" ] && return 1
    if timeout 300 python -c "
import numpy as np, jax, jax.numpy as jnp
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
print('TPU OK')" >> /tmp/tpu_gate.log 2>&1; then
      return 0
    fi
    sleep 120
  done
}

run_probe() {
  tag=$1; script=$2
  gate || return 1
  LEFT=$(( END_TS - $(date +%s) + 600 ))
  [ "$LEFT" -lt 120 ] && LEFT=120
  [ "$LEFT" -gt 2400 ] && LEFT=2400
  timeout "$LEFT" python "$script" \
    > "probes/${tag}.out" 2> "probes/${tag}.err"
  echo "$tag WATCHER EXIT $? $(date)" >> /root/repo/sweep_r3.log
}

run_probe bf16_ab_tpu probes/bf16_ab_tpu.py
run_probe spmm_sell_tpu probes/spmm_sell_tpu.py
