#!/bin/sh
# Supervisor for probes/r3_chain.sh. Keyed on the chain PID passed as $1:
# waits for the chain to exit, and if it produced no Pallas results
# (TPU down through its whole window), re-launches the chain — whose own
# gate loop waits for TPU recovery before touching the device, so this
# never creates a second concurrent TPU process.
CHAIN_PID="$1"
cd /root/repo
for i in $(seq 1 200); do
  sleep 300
  if kill -0 "$CHAIN_PID" 2>/dev/null; then
    continue  # chain still running (gating or sweeping)
  fi
  # chain exited: did it produce device results?
  if grep -q "pallas" /root/repo/result_tpu_r3/spmv_results.csv 2>/dev/null; then
    echo "chain done with results $(date)" >> /tmp/supervise_chain.log
    exit 0
  fi
  echo "chain died without results; relaunching $(date)" >> /tmp/supervise_chain.log
  # clear a dead-run resume checkpoint (matrices marked done with only
  # serial rows would be skipped by --resume)
  rm -f /root/repo/result_tpu_r3/.sweep_checkpoint 2>/dev/null
  nohup sh probes/r3_chain.sh > /dev/null 2>&1 &
  CHAIN_PID=$!
  echo "new chain pid $CHAIN_PID" >> /tmp/supervise_chain.log
done
