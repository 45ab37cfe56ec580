#!/bin/sh
# Round-3 TPU recovery chain (single process tree, strict ordering — only
# ONE TPU process ever runs at a time):
#   1. gate on TPU recovery (cheap probe, up to ~14h)
#   2. PR kernel compile smoke (2 min) — surfaces Mosaic issues early
#   3. priority-ordered autotuned file-driven mini sweep (resume-aware)
#   4. PR probe on the scattered suite
#   5. full-suite ladder sweep
cd /root/repo
for i in $(seq 1 140); do
  if timeout 300 python -c "
import numpy as np, jax, jax.numpy as jnp
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
print('TPU OK')" >> /tmp/tpu_gate.log 2>&1; then
    echo "TPU recovered after $i attempts $(date)" >> /tmp/tpu_gate.log
    break
  fi
  sleep 60
done

timeout 1800 python probes/pr_smoke.py > probes/pr_smoke_tpu.out 2>&1
echo "SMOKE EXIT $? $(date)" >> /root/repo/sweep_r3.log

D=/root/repo/suite_mtx
timeout 13000 python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/thermal_like.mtx --matrix $D/road_like.mtx \
  --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
  --matrix $D/dense_rows_mix.mtx --matrix $D/banded_fem_medium.mtx \
  --matrix $D/random_uniform.mtx --matrix $D/ml_laplace_like.mtx \
  --matrix $D/fem3d_cube.mtx --matrix $D/banded_fem_large.mtx \
  --output-dir result_tpu_r3 --autotune --iterations 32 --rounds 2 \
  --kernels serial_csr,serial_hll,xla_csr,xla_ell,pallas_sell,pallas_hll,pallas_sell_sigma,pallas_sell_dd \
  --resume >> /root/repo/sweep_r3.log 2>&1
echo "SWEEP EXIT $? $(date)" >> /root/repo/sweep_r3.log

timeout 9000 python probes/pr_tpu_probe.py \
  > probes/pr_tpu_probe.out 2>&1
echo "PR PROBE EXIT $? $(date)" >> /root/repo/sweep_r3.log

timeout 1200 python probes/sg_tpu_r3.py webbase_full \
  > probes/sg_tpu_webbase.out 2> probes/sg_tpu_webbase.err
echo "SG WEBBASE EXIT $? $(date)" >> /root/repo/sweep_r3.log

timeout 10800 python probes/run_r3_ladders.py \
  > probes/ladders_r3.out 2>&1
echo "LADDERS EXIT $? $(date)" >> /root/repo/sweep_r3.log
echo "PIPELINE DONE $(date)" >> /root/repo/sweep_r3.log
