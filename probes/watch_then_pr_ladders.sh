#!/bin/sh
# After the queued mini-sweep pipeline finishes: (1) PR-kernel probe on the
# scattered matrices (the round-3 headline), (2) full-suite ladder sweep.
# Only ever starts a TPU process after the pipeline's own are done.
cd /root/repo
for i in $(seq 1 160); do
  if grep -q "PIPELINE DONE" /root/repo/sweep_r3.log 2>/dev/null; then
    echo "pipeline done after $i polls $(date)" >> /tmp/ladder_watch.log
    timeout 7200 python probes/pr_tpu_probe.py \
      > /root/repo/probes/pr_tpu_probe.out 2>&1
    echo "PR PROBE EXIT $? $(date)" >> /tmp/ladder_watch.log
    timeout 10800 python probes/run_r3_ladders.py \
      > /root/repo/probes/ladders_r3.out 2>&1
    echo "LADDERS EXIT $? $(date)" >> /tmp/ladder_watch.log
    exit 0
  fi
  sleep 300
done
echo "gave up waiting $(date)" >> /tmp/ladder_watch.log
