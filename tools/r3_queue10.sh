#!/bin/bash
# r3 queue 10: after the circulation solve, validate FL_KORIENT=cols
# (transposed kernel I/O) on hardware: numerical parity, bench fwd +
# grad, and a profiler trace of the new glue profile.
cd /root/repo
D="$(dirname "$0")"
while ! grep -qE "exited rc=|all .* attempts wedged|total timeout" /tmp/r3_circ150.log 2>/dev/null; do
    sleep 60
done
LOG=/tmp/check_cols.log INIT_T=420 TOTAL_T=5400 TRIES=12 MARKER="ran" \
    FL_KORIENT=cols \
    "$D/tpu_retry.sh" python "$D/tpu_check_transfers.py"
LOG=/tmp/bench_cols.log INIT_T=420 TOTAL_T=7200 TRIES=12 \
    FL_KORIENT=cols FL_BATCH=fwd/substep,grad/w0 \
    "$D/tpu_retry.sh" python "$D/tpu_bench_batch.py"
LOG=/tmp/trace_cols.log INIT_T=420 TOTAL_T=5400 TRIES=12 \
    FL_KORIENT=cols \
    "$D/tpu_retry.sh" python -u "$D/tpu_trace_grad.py" 65536 5 0 /tmp/fluidlab_trace_cols
echo "R3 QUEUE10 DONE" >> /tmp/r3_queue10.log
