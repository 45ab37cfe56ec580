#!/bin/sh
# Round-3 TPU chain v7: first on-device measurement of the locality-split
# composite (formats/split.py — near-band SELL + natural-order PR far
# tail) on the regime it exists for. Runs after chain v6 (or its deadline
# exit); short and hard-capped so the driver's end-of-round bench.py still
# gets the device.
cd /root/repo
LOG=/root/repo/sweep_r3.log
D=/root/repo/suite_mtx
END_TS=$(date -d "${CHAIN7_END:-2026-08-20 02:00}" +%s 2>/dev/null || echo 0)
[ "$END_TS" -eq 0 ] && END_TS=$(( $(date +%s) + 28800 ))

C5=$(cat /tmp/chain5.pid 2>/dev/null)
C6=$(cat /tmp/chain6.pid 2>/dev/null)
while :; do
  [ "$(date +%s)" -ge "$END_TS" ] && { echo "CHAIN7 deadline before chain6 end $(date)" >> "$LOG"; exit 1; }
  grep -q "CHAIN6 DONE" "$LOG" 2>/dev/null && break
  alive=0
  [ -n "$C5" ] && kill -0 "$C5" 2>/dev/null && alive=1
  [ -n "$C6" ] && kill -0 "$C6" 2>/dev/null && alive=1
  [ "$alive" -eq 0 ] && break
  sleep 90
done
echo "CHAIN7 predecessors done $(date)" >> "$LOG"

# gate
while :; do
  NOW=$(date +%s)
  [ "$NOW" -ge "$END_TS" ] && { echo "CHAIN7 deadline at gate $(date)" >> "$LOG"; exit 1; }
  if timeout 420 python -c "
import numpy as np, jax, jax.numpy as jnp
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
print('TPU OK')" >> /tmp/tpu_gate.log 2>&1; then break; fi
  sleep 90
done

LEFT=$(( END_TS - $(date +%s) + 300 ))
[ "$LEFT" -lt 300 ] && LEFT=300
[ "$LEFT" -gt 1800 ] && LEFT=1800
echo "SPLITROAD START (budget ${LEFT}s) $(date)" >> "$LOG"
timeout "$LEFT" python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/road_like.mtx \
  --output-dir result_tpu_r3_split --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_split,pallas_split_dd --resume >> "$LOG" 2>&1
echo "SPLITROAD EXIT $? $(date)" >> "$LOG"
echo "CHAIN7 DONE $(date)" >> "$LOG"
