#!/bin/sh
# Parametrized ml_laplace bisect stage: run the sweep CLI AS OF <commit> on
# today's matrix + worker. Usage:
#   sh probes/mlab_commit.sh <commit> <outdir> [extra CLI args...]
# Creates/reuses a worktree at /root/repo/.bisect_<commit>. Old revisions
# may lack newer flags — pass only flags that exist at that commit.
C=$1; OUT=$2; shift 2
[ -n "$C" ] && [ -n "$OUT" ] || { echo "usage: mlab_commit.sh <commit> <outdir>"; exit 2; }
W=/root/repo/.bisect_$C
if [ ! -d "$W" ]; then
  git -C /root/repo worktree add --detach "$W" "$C" || exit 1
fi
cd "$W" || exit 1
exec python -m sparsematrixvectormultiplication_tpu.bench.cli \
  --matrix /root/repo/suite_mtx/ml_laplace_like.mtx \
  --output-dir "$OUT" --iterations 64 --rounds 2 \
  --kernels serial_csr,pallas_sell "$@"
