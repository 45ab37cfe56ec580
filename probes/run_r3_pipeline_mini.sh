#!/bin/sh
# Priority-ordered mini sweep for a late-window TPU recovery: cheap and
# high-signal matrices first, giants last; resume-compatible.
cd /root/repo
for i in $(seq 1 90); do
  if timeout 300 python -c "
import numpy as np, jax, jax.numpy as jnp
_ = np.asarray(jax.device_put(jnp.ones((1024,), jnp.float32)) + 1)
print('TPU OK')" >> /tmp/tpu_gate.log 2>&1; then
    echo "TPU recovered after $i attempts $(date)" >> /tmp/tpu_gate.log
    break
  fi
  sleep 60
done
D=/root/repo/suite_mtx
timeout 13000 python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix $D/thermal_like.mtx --matrix $D/road_like.mtx \
  --matrix $D/powerlaw_web.mtx --matrix $D/webbase_like.mtx \
  --matrix $D/dense_rows_mix.mtx --matrix $D/banded_fem_medium.mtx \
  --matrix $D/random_uniform.mtx --matrix $D/ml_laplace_like.mtx \
  --matrix $D/fem3d_cube.mtx --matrix $D/banded_fem_large.mtx \
  --output-dir result_tpu_r3 --autotune --iterations 32 --rounds 2 \
  --kernels serial_csr,serial_hll,xla_csr,xla_ell,pallas_sell,pallas_hll,pallas_sell_sigma,pallas_sell_dd \
  --resume > /root/repo/sweep_r3.log 2>&1
echo "SWEEP EXIT $?" >> /root/repo/sweep_r3.log
timeout 1200 python probes/sg_tpu_r3.py webbase_full \
  > probes/sg_tpu_webbase.out 2> probes/sg_tpu_webbase.err
echo "PIPELINE DONE $(date)" >> /root/repo/sweep_r3.log
