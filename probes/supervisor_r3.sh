#!/bin/sh
# Round-3 recovery supervisor. If the mini-sweep pipeline finished without
# producing results (TPU was down through its whole gate window), restart
# the chain once the TPU answers. Checks every 10 min for up to ~14h.
cd /root/repo
for i in $(seq 1 84); do
  sleep 600
  # chain still pending or results already produced -> nothing to do
  grep -q "PIPELINE DONE" /root/repo/sweep_r3.log 2>/dev/null || continue
  # real results = at least one Pallas stage row (a sweep against a dead
  # TPU still writes serial-oracle rows and checkpoints matrices as done)
  if grep -q "pallas" /root/repo/result_tpu_r3/spmv_results.csv 2>/dev/null; then
    exit 0
  fi
  # pipeline done but no results: is any pipeline/probe still running?
  if ps -ef | grep -v grep | grep -q "run_r3_pipeline_mini\|pr_tpu_probe\|run_r3_ladders"; then
    continue
  fi
  # probe the TPU (cheap transfer)
  if timeout 300 python -c "
import numpy as np, jax, jax.numpy as jnp
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
print('TPU OK')" >> /tmp/supervisor_r3.log 2>&1; then
    echo "restarting pipeline $(date)" >> /tmp/supervisor_r3.log
    # reset the completion marker so the follow-on watcher waits for the
    # NEW pipeline run (both greps key on PIPELINE DONE), and clear the
    # dead-run artifacts: the resume checkpoint marked matrices done even
    # though every device stage failed
    mv /root/repo/sweep_r3.log /root/repo/sweep_r3.log.stale 2>/dev/null
    mv /root/repo/result_tpu_r3 \
       /root/repo/result_tpu_r3.stale.$(date +%s) 2>/dev/null
    nohup sh probes/run_r3_pipeline_mini.sh > /dev/null 2>&1 &
    sleep 5
    nohup sh probes/watch_then_pr_ladders.sh > /dev/null 2>&1 &
    exit 0
  fi
done
