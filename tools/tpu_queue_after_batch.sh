#!/bin/bash
# Chain: wait for the batch supervisor (log $1) to finish, then run the
# LatteArt solve re-measure under the retry supervisor.
BATCHLOG="${1:-/tmp/batch_r4.log}"
while ! grep -qE "exited rc=|all .* attempts wedged|total timeout" "$BATCHLOG"; do
    sleep 60
done
LOG=/tmp/latteart_r4.log INIT_T=420 TOTAL_T=5400 TRIES=20 MARKER="env:" \
    "$(dirname "$0")/tpu_retry.sh" python "$(dirname "$0")/tpu_latteart_solve.py"
LOG=/tmp/trace_grad_r4.log INIT_T=420 TOTAL_T=5400 TRIES=20 \
    "$(dirname "$0")/tpu_retry.sh" python -u "$(dirname "$0")/tpu_trace_grad.py"
LOG=/tmp/smoke_tl_r4.log INIT_T=420 TOTAL_T=5400 TRIES=20 \
    FL_BATCH=smoke/tl FL_BATCH_TRILERP=corner,zpair \
    "$(dirname "$0")/tpu_retry.sh" python "$(dirname "$0")/tpu_bench_batch.py"
LOG=/tmp/grad_dot_r4.log INIT_T=420 TOTAL_T=5400 TRIES=20 \
    FL_BATCH=grad/w0 FL_DOT_PREC=default \
    "$(dirname "$0")/tpu_retry.sh" python "$(dirname "$0")/tpu_bench_batch.py"
LOG=/tmp/probe_gather_r4.log INIT_T=420 TOTAL_T=3600 TRIES=20 \
    "$(dirname "$0")/tpu_retry.sh" python "$(dirname "$0")/tpu_probe_gather.py"
LOG=/tmp/dot_high_r4.log INIT_T=420 TOTAL_T=5400 TRIES=20 \
    FL_BATCH=fwd/dot FL_BATCH_DOTPREC=high \
    "$(dirname "$0")/tpu_retry.sh" python "$(dirname "$0")/tpu_bench_batch.py"
LOG=/tmp/grad_dot_high_r4.log INIT_T=420 TOTAL_T=5400 TRIES=20 \
    FL_BATCH=grad/w0 FL_DOT_PREC=high \
    "$(dirname "$0")/tpu_retry.sh" python "$(dirname "$0")/tpu_bench_batch.py"
LOG=/tmp/check_dot_r4.log INIT_T=420 TOTAL_T=5400 TRIES=20 MARKER="ran" \
    FL_DOT_PREC=high \
    "$(dirname "$0")/tpu_retry.sh" python "$(dirname "$0")/tpu_check_transfers.py"
