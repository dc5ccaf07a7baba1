#!/bin/bash
# r4 queue 2: borrow the chip from the LatteArt chain for (a) the
# Circulation chained solve with the new plateau-lr schedule
# (warm-started from the r3 end-state policy), (b) the single-chip
# rollouts/s K-sweep re-measure at r4 kernel speed.  Resumes the
# LatteArt chain when done (removes the pause file).
cd /root/repo
D="$(dirname "$0")"
CIRC_ITERS="${CIRC_ITERS:-150}"
SEG="${SEG:-50}"

touch /tmp/latte_chain_pause
# wait for the in-flight latte segment to finish (the supervisor holds
# while the pause file exists); poll for the chain process by exact
# name match via pgrep -f but NEVER kill it
while pgrep -f "tpu_latteart_chain.py" > /dev/null; do
    sleep 20
done

# --- circulation chain (H=500, reference scene, plateau-lr schedule)
done_iters() {
    python - <<'EOF'
import os, pickle
p = "/tmp/circ_chain_state.pkl"
print(pickle.load(open(p, "rb"))["iteration"] if os.path.exists(p) else 0)
EOF
}
while [ "$(done_iters)" -lt "$CIRC_ITERS" ]; do
    LOG=/tmp/circ_chain.log INIT_T=420 TOTAL_T=4000 TRIES=10 \
        MARKER="env built|resuming at iteration" \
        FL_CIRC_H=500 FL_SEGLEN=50 FL_SOLVE_ITERS="$SEG" \
        FL_CHAIN_STATE=/tmp/circ_chain_state.pkl \
        FL_CHAIN_COURSE=/tmp/circ_chain_course.log \
        FL_SOLVE_WARMSTART=artifacts/circulation_solve_r3_policy.pkl \
        FL_SOLVE_POLICY_OUT=artifacts/circulation_solve_r4_policy.pkl \
        "$D/tpu_retry.sh" python "$D/tpu_circulation_solve.py" || break
done
echo "CIRC CHAIN DONE at $(done_iters) iters" >> /tmp/r4_queue2.log

# --- single-chip rollouts/s K-sweep (fwd+bwd through the planner)
for KN in "1 8192" "2 8192" "4 8192" "8 8192" "1 65536" "2 65536"; do
    set -- $KN
    LOG=/tmp/rollouts_r4.log INIT_T=420 TOTAL_T=3600 TRIES=8 \
        MARKER="rollouts/s" \
        "$D/tpu_retry.sh" python "$D/bench_rollouts.py" "$1" "$2" 20
done
echo "ROLLOUTS SWEEP DONE" >> /tmp/r4_queue2.log

rm -f /tmp/latte_chain_pause
echo "R4 QUEUE2 DONE" >> /tmp/r4_queue2.log
