#!/bin/sh
# After the r3 chain finishes WITH real device results:
#   1. if the main sweep timed out (nonzero SWEEP EXIT), re-run it with
#      --resume so the remaining matrices get their stages
#   2. append the PR (permutation-routed) kernel rows for the scattered
#      matrices into result_tpu_r3 (official CSV evidence for the
#      zero-locality regime, VERDICT r2 item 1)
# Never runs while another TPU pipeline is alive (one TPU process rule).
cd /root/repo
D=/root/repo/suite_mtx
while :; do
  sleep 120
  grep -q "PIPELINE DONE" /root/repo/sweep_r3.log 2>/dev/null || continue
  # only after a real sweep (device rows present)
  grep -q "pallas" /root/repo/result_tpu_r3/spmv_results.csv 2>/dev/null || continue
  # never start while a chain / sweep / probe still runs
  if ps -ef | grep -v grep | grep -q "r3_chain\|bench.cli\|pr_tpu_probe\|run_r3_ladders\|sg_tpu"; then
    continue
  fi
  break
done

last_sweep_exit=$(grep "SWEEP EXIT" /root/repo/sweep_r3.log | tail -1 | awk '{print $3}')
if [ -n "$last_sweep_exit" ] && [ "$last_sweep_exit" != "0" ]; then
  echo "RESUME SWEEP (prior exit $last_sweep_exit) $(date)" >> /root/repo/sweep_r3.log
  timeout 13000 python -m sparsematrixvectormultiplication_tpu.bench.cli \
    --matrix $D/thermal_like.mtx --matrix $D/road_like.mtx \
    --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
    --matrix $D/dense_rows_mix.mtx --matrix $D/banded_fem_medium.mtx \
    --matrix $D/random_uniform.mtx --matrix $D/ml_laplace_like.mtx \
    --matrix $D/fem3d_cube.mtx --matrix $D/banded_fem_large.mtx \
    --output-dir result_tpu_r3 --autotune --iterations 32 --rounds 2 \
    --kernels serial_csr,serial_hll,xla_csr,xla_ell,pallas_sell,pallas_hll,pallas_sell_sigma,pallas_sell_dd \
    --resume >> /root/repo/sweep_r3.log 2>&1
  echo "RESUME SWEEP EXIT $? $(date)" >> /root/repo/sweep_r3.log
fi

timeout 9000 python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
  --matrix $D/road_like.mtx --matrix $D/dense_rows_mix.mtx \
  --matrix $D/random_uniform.mtx \
  --output-dir result_tpu_r3 --iterations 32 --rounds 2 \
  --kernels serial_csr,pallas_pr,pallas_pr_dd \
  >> /root/repo/sweep_r3.log 2>&1
echo "PR APPEND EXIT $? $(date)" >> /root/repo/sweep_r3.log

timeout 3600 python probes/wlshed_ab_tpu.py > probes/wlshed_ab_tpu.out 2>&1
echo "WLSHED AB EXIT $? $(date)" >> /root/repo/sweep_r3.log
