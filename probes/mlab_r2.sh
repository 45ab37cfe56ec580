#!/bin/sh
# MLABR2 stage body: run the LITERAL r2-sweep code (worktree .r2tree @
# 8acf498) on today's ml_laplace_like.mtx — separates code regression from
# worker/environment drift. A standalone script because run_stage wraps its
# command in `sh -c "exec $*"`, which cannot exec a `cd ... && ...` compound
# (chain v2's MLABR2 died with 127 this way).
cd /root/repo/.r2tree || exit 1
exec python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix /root/repo/suite_mtx/ml_laplace_like.mtx \
  --output-dir /root/repo/result_tpu_r4_mlr2 --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_sell
