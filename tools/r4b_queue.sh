#!/bin/bash
# r4b (resumed round-4 session, fresh VM): the hardware evidence queue.
# /tmp was wiped (chain states, compile cache, r4 queue logs) — this
# queue re-runs the outstanding VERDICT items with ALL state and course
# files written under artifacts/r4b/ so nothing is lost again and round
# 5 can resume the chains from git.
#
# Stages (each with its own wall-clock window; DEADLINE_TS is the hard
# stop that frees the chip for the driver's end-of-round bench):
#   0. bench.py            — tunnel sanity + warms the compile cache
#   1. circulation cold chain, plateau-lr patience 20 (VERDICT #4)
#   2. task solves: pouring, gathering_easy, icecream_static (VERDICT #5)
#   3. rollouts/s K-sweep re-measure (VERDICT #6)
#   4. LatteArt full-spec chain segments until DEADLINE_TS (VERDICT #3)
cd /root/repo
D="$(dirname "$0")"
A=/root/repo/artifacts/r4b
mkdir -p "$A"
DEADLINE_TS="${DEADLINE_TS:?set DEADLINE_TS (epoch seconds)}"

left() { echo $(( DEADLINE_TS - $(date +%s) )); }
# cap a job's TOTAL_T so nothing holds the chip past DEADLINE_TS
capped() { l=$(( $(left) - 300 )); echo $(( l < $1 ? l : $1 )); }
stage_done() { grep -q "^$1$" "$A/stages.done" 2>/dev/null; }
mark_done() { echo "$1" >> "$A/stages.done"; }

# ---- stage 0: bench (sanity + cache warm) --------------------------
if ! stage_done bench && [ "$(left)" -gt 3000 ]; then
    BENCH_TOTAL_TIMEOUT=2400 BENCH_ATTEMPTS=6 \
        python bench.py > "$A/bench.json" 2> /tmp/bench_r4b.err
    cat "$A/bench.json" >> /tmp/r4b.log
    mark_done bench
fi

# ---- stage 1: circulation cold chain (120 iters, seg 40) -----------
circ_iters() {
    python - <<'PY'
import os, pickle
p = "/root/repo/artifacts/r4b/circ_chain_state.pkl"
print(pickle.load(open(p, "rb"))["iteration"] if os.path.exists(p) else 0)
PY
}
CIRC_TARGET="${CIRC_TARGET:-120}"
if ! stage_done circ; then
    while [ "$(circ_iters)" -lt "$CIRC_TARGET" ] && [ "$(left)" -gt 3000 ]; do
        LOG=/tmp/circ_cold.log INIT_T=420 TOTAL_T="$(capped 3600)" TRIES=8 \
            STALL_T=300 MARKER="env built|resuming at iteration" \
            FL_CIRC_H=500 FL_SEGLEN=50 FL_SOLVE_ITERS=20 \
            FL_CHAIN_STATE="$A/circ_chain_state.pkl" \
            FL_CHAIN_COURSE="$A/circ_cold_course.log" \
            FL_SOLVE_POLICY_OUT="$A/circulation_solve_r4b_policy.pkl" \
            "$D/tpu_retry.sh" python -u "$D/tpu_circulation_solve.py" || break
    done
    echo "CIRC at $(circ_iters) iters" >> /tmp/r4b.log
    [ "$(circ_iters)" -ge "$CIRC_TARGET" ] && mark_done circ
fi

# ---- stage 2: three task solves (20 iters each, segments of 5) -----
task_iters() {
    python - <<PY
import os, pickle
p = "/root/repo/artifacts/r4b/${1}_chain_state.pkl"
print(pickle.load(open(p, "rb"))["iteration"] if os.path.exists(p) else 0)
PY
}
# order: the task that FAULTS the worker (pouring, r2-class
# agent+collector+grad fault — see RESULTS.md r4b) goes LAST with a
# conservative forced segment; a crashed worker poisons the next
# launch, so give it 120s to restart between tasks.
for TASK in gathering_easy icecream_static pouring; do
    if stage_done "task_$TASK"; then continue; fi
    sleep 120
    EXTRA_ENV=""
    [ "$TASK" = pouring ] && EXTRA_ENV="FL_SEGLEN=50"
    T_END=$(( $(date +%s) + 4500 ))
    [ "$T_END" -gt $(( DEADLINE_TS - 600 )) ] && T_END=$(( DEADLINE_TS - 600 ))
    while [ "$(task_iters $TASK)" -lt 20 ] && [ "$(date +%s)" -lt "$T_END" ] \
          && [ "$(left)" -gt 1200 ]; do
        LOG=/tmp/task_${TASK}.log INIT_T=600 TOTAL_T="$(capped 3600)" TRIES=6 \
            STALL_T=1200 MARKER="env:" \
            FL_TASK=$TASK FL_TASK_FRAC=0.25 FL_SOLVE_ITERS=5 \
            FL_CHAIN_STATE="$A/${TASK}_chain_state.pkl" \
            FL_CHAIN_COURSE="$A/${TASK}_course.log" \
            FL_SOLVE_POLICY_OUT="$A/${TASK}_solve_r4_policy.pkl" \
            "$D/tpu_retry.sh" env $EXTRA_ENV python -u "$D/tpu_task_solve.py" || break
    done
    echo "TASK $TASK at $(task_iters $TASK) iters" >> /tmp/r4b.log
    [ "$(task_iters $TASK)" -ge 20 ] && mark_done "task_$TASK"
done

# ---- stage 3: rollouts/s K-sweep -----------------------------------
if ! stage_done rollouts && [ "$(left)" -gt 2400 ]; then
    : > "$A/rollouts_r4.log"
    for KN in "1 8192" "2 8192" "4 8192" "8 8192" "1 65536" "2 65536"; do
        [ "$(left)" -gt 1200 ] || break
        set -- $KN
        LOG="$A/rollouts_r4.log" INIT_T=420 TOTAL_T="$(capped 2400)" TRIES=5 \
            STALL_T=900 MARKER="transfers:" \
            "$D/tpu_retry.sh" python -u "$D/bench_rollouts.py" "$1" "$2" 20
    done
    # done only when every config produced a measurement (a hard
    # tunnel outage must leave the stage retryable)
    [ "$(grep -c 'rollouts/s' "$A/rollouts_r4.log")" -ge 6 ] && mark_done rollouts
fi

# ---- stage 3b: two more task solves if time allows (broader
# hardware-solve coverage: VERDICT missing #1 lists 8/10 tasks without
# hardware evidence).  latteart_stir (500x50=25k substeps/iter) and
# transporting (1000x20=20k) fit a 45-min window at 1/4 density;
# mixing (2000x50=100k substeps/iter) does not. -----------------------
for TASK in latteart_stir transporting; do
    if stage_done "task_$TASK"; then continue; fi
    [ "$(left)" -gt 3600 ] || break
    T_END=$(( $(date +%s) + 2700 ))
    [ "$T_END" -gt $(( DEADLINE_TS - 600 )) ] && T_END=$(( DEADLINE_TS - 600 ))
    while [ "$(task_iters $TASK)" -lt 20 ] && [ "$(date +%s)" -lt "$T_END" ] \
          && [ "$(left)" -gt 1200 ]; do
        LOG=/tmp/task_${TASK}.log INIT_T=600 TOTAL_T="$(capped 2700)" TRIES=4 \
            STALL_T=1200 MARKER="env:" \
            FL_TASK=$TASK FL_TASK_FRAC=0.25 FL_SOLVE_ITERS=5 \
            FL_CHAIN_STATE="$A/${TASK}_chain_state.pkl" \
            FL_CHAIN_COURSE="$A/${TASK}_course.log" \
            FL_SOLVE_POLICY_OUT="$A/${TASK}_solve_r4_policy.pkl" \
            "$D/tpu_retry.sh" python -u "$D/tpu_task_solve.py" || break
    done
    echo "TASK $TASK at $(task_iters $TASK) iters" >> /tmp/r4b.log
    [ "$(task_iters $TASK)" -ge 20 ] && mark_done "task_$TASK"
done

# ---- stage 4: LatteArt full-spec chain until deadline --------------
while [ "$(left)" -gt 900 ]; do
    LOG=/tmp/latte_chain.log INIT_T=420 TOTAL_T="$(( $(left) - 300 > 3000 ? 3000 : $(left) - 300 ))" TRIES=6 \
        STALL_T=900 MARKER="resuming at iteration|target recorded|env:" \
        FL_CHAIN_SEG=5 \
        FL_CHAIN_STATE="$A/latte_chain_state.pkl" \
        FL_CHAIN_COURSE="$A/latte_chain_course.log" \
        FL_CHAIN_TARGET_PKL=/tmp/latte_tpu_target.pkl \
        "$D/tpu_retry.sh" python -u "$D/tpu_latteart_chain.py"
    sleep 5
done

echo "R4B QUEUE DONE $(date -u)" >> /tmp/r4b.log
echo "R4B QUEUE DONE" >> "$A/stages.done"
