#!/bin/bash
# r3 queue 9: after the bench batch, capture a fwd+bwd profiler trace
# (directs the backward perf work), then the 150-iteration Circulation
# solve at H=500 (VERDICT #7).
cd /root/repo
D="$(dirname "$0")"
while ! grep -qE "exited rc=|all .* attempts wedged|total timeout" /tmp/bench_r3d.log 2>/dev/null; do
    sleep 30
done
LOG=/tmp/trace_grad_r3d.log INIT_T=420 TOTAL_T=5400 TRIES=12 \
    "$D/tpu_retry.sh" python -u "$D/tpu_trace_grad.py" 65536 5 0 /tmp/fluidlab_trace_grad_r3d
mkdir -p artifacts
LOG=/tmp/r3_circ150.log INIT_T=1200 TOTAL_T=28800 TRIES=8 MARKER="env built" \
    FL_CIRC_H=500 FL_SEGLEN=50 FL_SOLVE_ITERS=150 \
    FL_SOLVE_POLICY_OUT=artifacts/circulation_solve_r3_policy.pkl \
    "$D/tpu_retry.sh" python "$D/tpu_circulation_solve.py"
echo "R3 QUEUE9 DONE" >> /tmp/r3_queue9.log
