#!/bin/sh
# Auto-commit TPU result artifacts while the measurement chain runs.
#
# Round-3 lesson: two VM deaths (Aug 19 ~07:00 and ~19:25) destroyed every
# UNCOMMITTED artifact — an autotuned full sweep, steady-state re-times,
# ladders, and f32 PR rows each had to be re-measured from scratch. This
# watcher makes the window of loss <= INTERVAL: every cycle it stages the
# known result/probe artifact paths and commits if anything changed.
#
# Usage: sh probes/autocommit_results.sh [end_ts] &   (defaults: +12 h)
cd /root/repo || exit 1
END_TS=${1:-$(( $(date +%s) + 43200 ))}
INTERVAL=${AUTOCOMMIT_INTERVAL:-600}

PATHS="result_tpu_r3 result_tpu_r3_pr result_tpu_r3_pr2 result_tpu_r3_split \
result_tpu_r3_steady result_tpu_r3_steadypr result_cpu_mesh_r3 \
probes/ladders_r3.out probes/bf16_ab_tpu.out probes/spmm_sell_tpu.out \
probes/bsr_spmm_tpu.out probes/wlshed_ab_tpu.out probes/pr_smoke_tpu.out"
# (sweep_r3.log is committed manually at milestones — auto-adding it would
# make a commit every cycle just because the log grew.)

while [ "$(date +%s)" -lt "$END_TS" ]; do
  sleep "$INTERVAL"
  for p in $PATHS; do
    [ -e "$p" ] && git add -A "$p" 2>/dev/null
  done
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -q -m "Results: auto-checkpoint of in-flight TPU sweep artifacts" \
      && echo "committed $(date)" >> /tmp/autocommit.log
  fi
done
echo "autocommit watcher done $(date)" >> /tmp/autocommit.log
