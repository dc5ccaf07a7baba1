#!/bin/bash
# r3 queue 7: validate the fully-batched z-contraction kernels on
# hardware, re-baseline bench numbers, then continue the full-spec
# LatteArt solve to 60 total iterations (warm start from iter-30 pkl).
cd /root/repo
D="$(dirname "$0")"
LOG=/tmp/check_r3d.log INIT_T=420 TOTAL_T=3600 TRIES=12 MARKER="ran" \
    "$D/tpu_retry.sh" python "$D/tpu_check_transfers.py"
LOG=/tmp/bench_r3d.log INIT_T=420 TOTAL_T=5400 TRIES=12 \
    FL_BATCH=fwd/substep,grad/w0 \
    "$D/tpu_retry.sh" python "$D/tpu_bench_batch.py"
mkdir -p artifacts/latteart_solve_r3b
LOG=/tmp/r3_latte_cont.log INIT_T=1500 TOTAL_T=14400 TRIES=8 MARKER="env: N=" \
    FL_LATTE_DENSITY=1e6 FL_LATTE_H=330 FL_LATTE_HA=250 FL_SOLVE_ITERS=30 \
    FL_SKIP_RECORD=1 FL_SOLVE_WARMSTART=artifacts/latteart_solve_r3/policy.pkl \
    FL_SOLVE_POLICY_OUT=artifacts/latteart_solve_r3b/policy.pkl \
    FL_SOLVE_ARTIFACT=artifacts/latteart_solve_r3b \
    "$D/tpu_retry.sh" python "$D/tpu_latteart_solve.py"
echo "R3 QUEUE7 DONE" >> /tmp/r3_queue7.log
