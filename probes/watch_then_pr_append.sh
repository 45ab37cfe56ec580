#!/bin/sh
# After the r3 chain finishes WITH real device results, append the PR
# (permutation-routed) kernel rows for the scattered matrices into
# result_tpu_r3 — the official CSV evidence for the zero-locality regime
# (VERDICT r2 item 1). Never runs while another TPU pipeline is alive.
cd /root/repo
for i in $(seq 1 600); do
  sleep 120
  grep -q "PIPELINE DONE" /root/repo/sweep_r3.log 2>/dev/null || continue
  # only after a real sweep (device rows present)
  grep -q "pallas" /root/repo/result_tpu_r3/spmv_results.csv 2>/dev/null || continue
  # never start while a chain / sweep / probe still runs (one TPU process)
  if ps -ef | grep -v grep | grep -q "r3_chain\|bench.cli\|pr_tpu_probe\|run_r3_ladders\|sg_tpu"; then
    continue
  fi
  break
done
grep -q "pallas" /root/repo/result_tpu_r3/spmv_results.csv 2>/dev/null || exit 1
D=/root/repo/suite_mtx
timeout 9000 python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
  --matrix $D/road_like.mtx --matrix $D/dense_rows_mix.mtx \
  --matrix $D/random_uniform.mtx \
  --output-dir result_tpu_r3 --iterations 32 --rounds 2 \
  --kernels serial_csr,pallas_pr,pallas_pr_dd \
  >> /root/repo/sweep_r3.log 2>&1
echo "PR APPEND EXIT $? $(date)" >> /root/repo/sweep_r3.log
