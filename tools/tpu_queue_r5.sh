#!/bin/bash
# Round-5 TPU measurement queue (fresh VM: /tmp compile cache is cold).
#
# Ordered by value:
#   1. main batch  - fwd/substep (official bench program -> warms the
#      driver's bench.py cache; includes the round-4 SVD elision),
#      fwd/withsvd (elision ablation), fwd/step:1 (persistent binning
#      m=1 with pin_rowmajor), grad/w0, smoke trilerp corner vs zpair.
#   2. hardware numerics check (round-4 state).
#   3. dot-precision sweep (fwd + grad at FL_DOT_PREC=high).
#   4. LatteArt solve re-measure (merged grid phase).
# Each under the wedge-aware retry supervisor.  Partial completion is
# fine - every compile lands in the persistent cache.
cd "$(dirname "$0")/.." || exit 1

LOG=/tmp/batch_r5.log INIT_T=420 TOTAL_T=7200 TRIES=30 \
    FL_BATCH=fwd/substep,fwd/withsvd,fwd/step:1,grad/w0,smoke/tl \
    FL_BATCH_MARGINS=1 FL_BATCH_TRILERP=corner,zpair \
    tools/tpu_retry.sh python -u tools/tpu_bench_batch.py

LOG=/tmp/check_r5.log INIT_T=420 TOTAL_T=3600 TRIES=15 MARKER="ran" \
    tools/tpu_retry.sh python -u tools/tpu_check_transfers.py

LOG=/tmp/dot_r5.log INIT_T=420 TOTAL_T=5400 TRIES=15 \
    FL_BATCH=fwd/dot FL_BATCH_DOTPREC=high \
    tools/tpu_retry.sh python -u tools/tpu_bench_batch.py

LOG=/tmp/grad_dot_r5.log INIT_T=420 TOTAL_T=5400 TRIES=15 \
    FL_BATCH=grad/w0 FL_DOT_PREC=high \
    tools/tpu_retry.sh python -u tools/tpu_bench_batch.py

LOG=/tmp/latteart_r5.log INIT_T=420 TOTAL_T=5400 TRIES=15 MARKER="env:" \
    tools/tpu_retry.sh python -u tools/tpu_latteart_solve.py

echo "QUEUE_R5 DONE" >> /tmp/queue_r5.log
