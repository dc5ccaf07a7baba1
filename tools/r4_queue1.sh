#!/bin/bash
# r4 queue 1: the validation r3 queued but never ran — FL_KORIENT=cols
# on hardware: numerical transfer parity, bench fwd + grad, profiler
# trace.  Results land in /tmp/check_cols.log /tmp/bench_cols.log
# /tmp/trace_cols.log.
cd /root/repo
D="$(dirname "$0")"
LOG=/tmp/check_cols.log INIT_T=420 TOTAL_T=5400 TRIES=20 MARKER="ran" \
    FL_KORIENT=cols \
    "$D/tpu_retry.sh" python "$D/tpu_check_transfers.py"
LOG=/tmp/bench_cols.log INIT_T=420 TOTAL_T=7200 TRIES=20 \
    FL_KORIENT=cols FL_BATCH=fwd/substep,grad/w0 \
    "$D/tpu_retry.sh" python "$D/tpu_bench_batch.py"
LOG=/tmp/trace_cols.log INIT_T=420 TOTAL_T=5400 TRIES=12 \
    FL_KORIENT=cols \
    "$D/tpu_retry.sh" python -u "$D/tpu_trace_grad.py" 65536 5 0 /tmp/fluidlab_trace_cols
echo "R4 QUEUE1 DONE" >> /tmp/r4_queue1.log
