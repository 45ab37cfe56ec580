#!/bin/sh
# Waits for the queued mini-sweep pipeline (run_r3_pipeline_mini.sh) to
# finish, then runs the full-suite ladder sweep. Safe to leave running:
# only ever starts ONE TPU process after the pipeline's own are done.
cd /root/repo
for i in $(seq 1 140); do
  if grep -q "PIPELINE DONE" /root/repo/sweep_r3.log 2>/dev/null; then
    echo "pipeline done after $i polls $(date)" >> /tmp/ladder_watch.log
    timeout 10800 python probes/run_r3_ladders.py \
      > /root/repo/probes/ladders_r3.out 2>&1
    echo "LADDERS EXIT $? $(date)" >> /tmp/ladder_watch.log
    exit 0
  fi
  sleep 300
done
echo "gave up waiting $(date)" >> /tmp/ladder_watch.log
