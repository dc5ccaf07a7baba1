#!/bin/bash
# r3 queue 8: after the in-flight transfer parity check, re-baseline
# bench fwd + grad with the fully-batched z-contraction kernels, then a
# 150-iteration Circulation solve at H=500 (VERDICT #7: demonstrate
# >=10% loss reduction; 20 iters gave -2.3% wobble-dominated).
cd /root/repo
D="$(dirname "$0")"
while ! grep -qE "exited rc=|all .* attempts wedged|total timeout" /tmp/check_r3d.log 2>/dev/null; do
    sleep 30
done
LOG=/tmp/bench_r3d.log INIT_T=420 TOTAL_T=5400 TRIES=12 \
    FL_BATCH=fwd/substep,grad/w0 \
    "$D/tpu_retry.sh" python "$D/tpu_bench_batch.py"
mkdir -p artifacts
LOG=/tmp/r3_circ150.log INIT_T=1200 TOTAL_T=28800 TRIES=8 MARKER="env built" \
    FL_CIRC_H=500 FL_SEGLEN=50 FL_SOLVE_ITERS=150 \
    FL_SOLVE_POLICY_OUT=artifacts/circulation_solve_r3_policy.pkl \
    "$D/tpu_retry.sh" python "$D/tpu_circulation_solve.py"
echo "R3 QUEUE8 DONE" >> /tmp/r3_queue8.log
