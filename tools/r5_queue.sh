#!/bin/bash
# Round-5 hardware evidence queue — the outstanding items at the end of
# round 4, in value order.  All state/course files live under
# artifacts/ (git) so VM resets cost only in-flight segment time.
#
#   0. bench sanity (warms tunnel + compile cache; skipped if fresh)
#   1. pouring fault bisect (open item (d)) — tools/r5_pouring_bisect.sh
#   2. LatteArt full-spec chain -> 500 iters (VERDICT r3 #3; resumes
#      artifacts/r4c/latte_chain_state.pkl)
#   3. icecream_static task solve to 20 iters (VERDICT r3 #5)
#   4. rollouts/s K-sweep re-measure (VERDICT r3 #6)
#   5. latteart_stir + transporting solves (broader hardware coverage)
#
# Usage: DEADLINE_TS=<epoch> nohup bash tools/r5_queue.sh &
cd /root/repo
D="$(dirname "$0")"
A4=/root/repo/artifacts/r4c
A=/root/repo/artifacts/r5
mkdir -p "$A"
DEADLINE_TS="${DEADLINE_TS:?set DEADLINE_TS (epoch seconds)}"
left() { echo $(( DEADLINE_TS - $(date +%s) )); }
capped() { l=$(( $(left) - 300 )); echo $(( l < $1 ? l : $1 )); }
stage_done() { grep -q "^$1$" "$A/stages.done" 2>/dev/null; }
mark_done() { echo "$1" >> "$A/stages.done"; }

# ---- stage 0: bench sanity -----------------------------------------
if ! stage_done bench && [ "$(left)" -gt 6000 ]; then
    if BENCH_TOTAL_BUDGET=2400 BENCH_ATTEMPTS=10 \
        python bench.py > "$A/bench.json" 2> /tmp/bench_r5.err \
        && grep -q '"metric"' "$A/bench.json"; then
        mark_done bench
    fi
fi

# ---- stage 1: pouring bisect (~6 gates x ~8 min incl. pauses) ------
if ! stage_done bisect && [ "$(left)" -gt 7200 ]; then
    bash "$D/r5_pouring_bisect.sh"
    # done only when all 6 gates have a REAL verdict (WEDGED lines are
    # inconclusive tunnel outages and must re-run on the next pass)
    [ "$(grep -cE '^GATE [a-z]+ (SURVIVED|FAULTED)' "$A/pouring_bisect.log")" -ge 6 ] \
        && mark_done bisect
fi

# ---- stage 2: LatteArt chain to 500 (resumes r4c state) ------------
latte_iters() {
    python - <<'PY'
import os, pickle
p = "/root/repo/artifacts/r4c/latte_chain_state.pkl"
print(pickle.load(open(p, "rb"))["iteration"] if os.path.exists(p) else 0)
PY
}
LATTE_TARGET="${LATTE_TARGET:-500}"
# ~67 s/iter: budget the chain window to what remains after reserving
# ~3.3h for stages 3-5; override with LATTE_BUDGET_S.
LATTE_END=$(( $(date +%s) + ${LATTE_BUDGET_S:-28800} ))
[ "$LATTE_END" -gt $(( DEADLINE_TS - 12000 )) ] && LATTE_END=$(( DEADLINE_TS - 12000 ))
if ! stage_done latte; then
    while [ "$(latte_iters)" -lt "$LATTE_TARGET" ] \
          && [ "$(date +%s)" -lt "$LATTE_END" ] && [ "$(left)" -gt 1200 ]; do
        LOG=/tmp/latte_chain.log INIT_T=420 TOTAL_T="$(capped 3000)" TRIES=6 \
            STALL_T=600 MARKER="resuming at iteration|target recorded|env:" \
            FL_CHAIN_SEG=10 \
            FL_CHAIN_STATE="$A4/latte_chain_state.pkl" \
            FL_CHAIN_COURSE="$A4/latte_chain_course.log" \
            FL_CHAIN_TARGET_PKL="$A4/latte_tpu_target.pkl" \
            "$D/tpu_retry.sh" python -u "$D/tpu_latteart_chain.py" || break
        sleep 5
    done
    echo "LATTE at $(latte_iters) iters" >> "$A/queue.log"
    [ "$(latte_iters)" -ge "$LATTE_TARGET" ] && mark_done latte
fi

# ---- stage 4: rollouts/s K-sweep (bounded ~40 min; runs BEFORE the
# open-ended task solves so the stale-r2-headline replacement is not
# starved by them) ---------------------------------------------------
if ! stage_done rollouts && [ "$(left)" -gt 2400 ]; then
    for KN in "1 8192" "2 8192" "4 8192" "8 8192" "1 65536" "2 65536"; do
        [ "$(left)" -gt 1200 ] || break
        set -- $KN
        # skip configs that already have a result line (retry passes)
        grep "rollouts/s" "$A/rollouts_r5.log" 2>/dev/null \
            | grep -q "K=$1 N=$2 " && continue
        LOG="$A/rollouts_r5.log" INIT_T=420 TOTAL_T="$(capped 2400)" TRIES=5 \
            STALL_T=900 MARKER="transfers:" \
            "$D/tpu_retry.sh" python -u "$D/bench_rollouts.py" "$1" "$2" 20
    done
    # count DISTINCT measured configs, not raw lines (retries duplicate)
    NDIST=$(grep "rollouts/s" "$A/rollouts_r5.log" 2>/dev/null \
        | grep -o 'K=[0-9]* N=[0-9]*' | sort -u | wc -l)
    [ "$NDIST" -ge 6 ] && mark_done rollouts
fi

# ---- stages 3+5: task solves ---------------------------------------
task_iters() {
    python - <<PY
import os, pickle
p = "/root/repo/artifacts/r5/${1}_chain_state.pkl"
print(pickle.load(open(p, "rb"))["iteration"] if os.path.exists(p) else 0)
PY
}
for TASK in icecream_static latteart_stir transporting; do
    if stage_done "task_$TASK"; then continue; fi
    [ "$(left)" -gt 7200 ] || break
    sleep 120
    T_END=$(( $(date +%s) + 7200 ))
    [ "$T_END" -gt $(( DEADLINE_TS - 600 )) ] && T_END=$(( DEADLINE_TS - 600 ))
    while [ "$(task_iters $TASK)" -lt 20 ] && [ "$(date +%s)" -lt "$T_END" ] \
          && [ "$(left)" -gt 1200 ]; do
        LOG=/tmp/task_${TASK}.log INIT_T=600 TOTAL_T="$(capped 3600)" TRIES=6 \
            STALL_T=1200 MARKER="env:" \
            FL_TASK=$TASK FL_TASK_FRAC=0.25 FL_SOLVE_ITERS=5 \
            FL_CHAIN_STATE="$A/${TASK}_chain_state.pkl" \
            FL_CHAIN_COURSE="$A/${TASK}_course.log" \
            FL_SOLVE_POLICY_OUT="$A/${TASK}_solve_r5_policy.pkl" \
            "$D/tpu_retry.sh" python -u "$D/tpu_task_solve.py" || break
    done
    echo "TASK $TASK at $(task_iters $TASK) iters" >> "$A/queue.log"
    [ "$(task_iters $TASK)" -ge 20 ] && mark_done "task_$TASK"
done

# ---- tail: keep the latte chain eating any leftover time -----------
while [ "$(left)" -gt 900 ] && [ "$(latte_iters)" -lt "$LATTE_TARGET" ]; do
    LOG=/tmp/latte_chain.log INIT_T=420 TOTAL_T="$(capped 3000)" TRIES=6 \
        STALL_T=600 MARKER="resuming at iteration|target recorded|env:" \
        FL_CHAIN_SEG=10 \
        FL_CHAIN_STATE="$A4/latte_chain_state.pkl" \
        FL_CHAIN_COURSE="$A4/latte_chain_course.log" \
        FL_CHAIN_TARGET_PKL="$A4/latte_tpu_target.pkl" \
        "$D/tpu_retry.sh" python -u "$D/tpu_latteart_chain.py" || break
    sleep 5
done
echo "R5 QUEUE DONE $(date -u)" >> "$A/queue.log"
