#!/bin/bash
# r4 queue 2b: COLD-start circulation chain with the plateau-lr
# schedule (the warm start from the r3 diverged end-state converged to
# a worse basin, ~4700 — artifacts/circulation_r4_warmstart_course.log),
# then the rollouts K-sweep.  Writes queue2's completion marker so
# queue3 proceeds.
cd /root/repo
D="$(dirname "$0")"
CIRC_ITERS="${CIRC_ITERS:-120}"
SEG="${SEG:-40}"

done_iters() {
    python - <<'PY'
import os, pickle
p = "/tmp/circ_cold_state.pkl"
print(pickle.load(open(p, "rb"))["iteration"] if os.path.exists(p) else 0)
PY
}
while [ "$(done_iters)" -lt "$CIRC_ITERS" ]; do
    LOG=/tmp/circ_cold.log INIT_T=420 TOTAL_T=4000 TRIES=10 \
        MARKER="env built|resuming at iteration" \
        FL_CIRC_H=500 FL_SEGLEN=50 FL_SOLVE_ITERS="$SEG" \
        FL_CHAIN_STATE=/tmp/circ_cold_state.pkl \
        FL_CHAIN_COURSE=/tmp/circ_cold_course.log \
        FL_SOLVE_POLICY_OUT=artifacts/circulation_solve_r4_policy.pkl \
        "$D/tpu_retry.sh" python "$D/tpu_circulation_solve.py" || break
done
echo "CIRC COLD DONE at $(done_iters) iters" >> /tmp/r4_queue2.log

for KN in "1 8192" "2 8192" "4 8192" "8 8192" "1 65536" "2 65536"; do
    set -- $KN
    LOG=/tmp/rollouts_r4.log INIT_T=420 TOTAL_T=3600 TRIES=8 \
        MARKER="rollouts/s" \
        "$D/tpu_retry.sh" python "$D/bench_rollouts.py" "$1" "$2" 20
done
echo "ROLLOUTS SWEEP DONE" >> /tmp/r4_queue2.log
echo "R4 QUEUE2 DONE" >> /tmp/r4_queue2.log
