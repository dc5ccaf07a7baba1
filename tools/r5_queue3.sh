#!/bin/bash
# Round-5 queue, phase 3 (post-remat-gate remainder) — runs after the measurement window + bisect2
# (tools/r5_supervisor.sh).  Rebalanced for today's 10-20 min remote
# compiles: north star first, then value-ordered bounded stages, tail
# latte absorbs the rest.  All stages resumable via stages.done /
# chain-state files; tools/compile_keepalive.sh must be running so the
# stall watchdogs don't kill healthy compiles.
#
# Usage: FL_POURING_FIX=... DEADLINE_TS=<epoch> nohup bash tools/r5_queue3.sh &
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

latte_iters() {
    python - <<'PY'
import os, pickle
p = "/root/repo/artifacts/r4c/latte_chain_state.pkl"
print(pickle.load(open(p, "rb"))["iteration"] if os.path.exists(p) else 0)
PY
}
latte_seg() {
    LOG=/tmp/latte_chain.log INIT_T=420 TOTAL_T="$(capped 3000)" TRIES=6 \
        STALL_T=900 MARKER="resuming at iteration|target recorded|env:" \
        FL_CHAIN_SEG=10 \
        FL_CHAIN_STATE="$A4/latte_chain_state.pkl" \
        FL_CHAIN_COURSE="$A4/latte_chain_course.log" \
        FL_CHAIN_TARGET_PKL="$A4/latte_tpu_target.pkl" \
        "$D/tpu_retry.sh" python -u "$D/tpu_latteart_chain.py"
}
LATTE_TARGET="${LATTE_TARGET:-500}"

task_iters() {
    python - <<PY
import os, pickle
p = "/root/repo/artifacts/r5/${1}_chain_state.pkl"
print(pickle.load(open(p, "rb"))["iteration"] if os.path.exists(p) else 0)
PY
}

# ---- 2b. matrix-form collide gate: the structural fix candidate ----
# (runs only when the remat gate did not already hand us a fix)
if [ -z "$FL_POURING_FIX" ] && ! stage_done gate_matrix \
        && [ "$(left)" -gt 4800 ]; then
    sleep 120
    BISECT_GATES="both_matrix" \
        BISECT_DEADLINE_TS=$(( $(date +%s) + 2700 )) \
        BISECT_INIT_T=420 BISECT_TOTAL_T=2400 BISECT_TRIES=2 \
        BISECT_STALL_T=1800 \
        bash "$D/r5_pouring_bisect2.sh"
    grep -qE '^GATE both_matrix (SURVIVED|FAULTED)' "$A/pouring_bisect.log" \
        && mark_done gate_matrix
    if grep -q "^GATE both_matrix SURVIVED" "$A/pouring_bisect.log"; then
        FL_POURING_FIX="FL_COLLIDE_IMPL=matrix"
        echo "POURING FIX: $FL_POURING_FIX" >> "$A/queue.log"
    fi
fi

# ---- 3. pouring validation (only when a fix is configured) ----------
if [ -n "$FL_POURING_FIX" ] && ! stage_done task_pouring \
        && [ "$(left)" -gt 3600 ]; then
    sleep 120
    T_END=$(( $(date +%s) + 4800 ))
    [ "$T_END" -gt $(( DEADLINE_TS - 600 )) ] && T_END=$(( DEADLINE_TS - 600 ))
    while [ "$(task_iters pouring)" -lt 20 ] \
          && [ "$(date +%s)" -lt "$T_END" ] && [ "$(left)" -gt 1200 ]; do
        env $FL_POURING_FIX \
            LOG=/tmp/task_pouring.log INIT_T=600 TOTAL_T="$(capped 3600)" \
            TRIES=3 STALL_T=1500 MARKER="env:" \
            FL_TASK=pouring FL_TASK_FRAC=0.25 FL_SOLVE_ITERS=10 \
            FL_CHAIN_STATE="$A/pouring_chain_state.pkl" \
            FL_CHAIN_COURSE="$A/pouring_course.log" \
            FL_SOLVE_POLICY_OUT="$A/pouring_solve_r5_policy.pkl" \
            "$D/tpu_retry.sh" python -u "$D/tpu_task_solve.py" || break
    done
    echo "TASK pouring at $(task_iters pouring) iters" >> "$A/queue.log"
    [ "$(task_iters pouring)" -ge 20 ] && mark_done task_pouring
fi

# ---- 2. rollouts/s sweep, value-ordered, stage-budgeted (VERDICT #6)
if ! stage_done rollouts && [ "$(left)" -gt 1500 ]; then
    R_END=$(( $(date +%s) + ${ROLLOUT_BUDGET_S:-1800} ))
    for KN in "8 8192" "1 8192" "1 65536" "2 65536" "4 8192" "2 8192"; do
        [ "$(left)" -gt 1200 ] || break
        [ "$(date +%s)" -lt "$R_END" ] || break
        set -- $KN
        grep "rollouts/s" "$A/rollouts_r5.log" 2>/dev/null \
            | grep -q "K=$1 N=$2 " && continue
        LOG="$A/rollouts_r5.log" INIT_T=420 TOTAL_T="$(capped 2400)" TRIES=3 \
            STALL_T=900 MARKER="transfers:" \
            "$D/tpu_retry.sh" python -u "$D/bench_rollouts.py" "$1" "$2" 20
    done
    NDIST=$(grep "rollouts/s" "$A/rollouts_r5.log" 2>/dev/null \
        | grep -o 'K=[0-9]* N=[0-9]*' | sort -u | wc -l)
    echo "ROLLOUTS $NDIST distinct configs $(date -u)" >> "$A/queue.log"
    [ "$NDIST" -ge 2 ] && mark_done rollouts
fi


# ---- 4. task solves, as many as fit --------------------------------
for TASK in icecream_static latteart_stir transporting mixing gatheringO; do
    if stage_done "task_$TASK"; then continue; fi
    [ "$(left)" -gt 3900 ] || break
    sleep 120
    T_END=$(( $(date +%s) + 4800 ))
    [ "$T_END" -gt $(( DEADLINE_TS - 600 )) ] && T_END=$(( DEADLINE_TS - 600 ))
    while [ "$(task_iters $TASK)" -lt 20 ] && [ "$(date +%s)" -lt "$T_END" ] \
          && [ "$(left)" -gt 1200 ]; do
        LOG=/tmp/task_${TASK}.log INIT_T=600 TOTAL_T="$(capped 3600)" TRIES=3 \
            STALL_T=1500 MARKER="env:" \
            FL_TASK=$TASK FL_TASK_FRAC=0.25 FL_SOLVE_ITERS=5 \
            FL_CHAIN_STATE="$A/${TASK}_chain_state.pkl" \
            FL_CHAIN_COURSE="$A/${TASK}_course.log" \
            FL_SOLVE_POLICY_OUT="$A/${TASK}_solve_r5_policy.pkl" \
            "$D/tpu_retry.sh" python -u "$D/tpu_task_solve.py" || break
    done
    echo "TASK $TASK at $(task_iters $TASK) iters" >> "$A/queue.log"
    [ "$(task_iters $TASK)" -ge 20 ] && mark_done "task_$TASK"
done

# ---- 5. fresh fwd xplane trace (optional, diagnostic) --------------
if ! stage_done trace && [ "$(left)" -gt 3000 ]; then
    LOG="$A/measure_r5.log" INIT_T=1500 TOTAL_T="$(capped 2400)" TRIES=2 \
        STALL_T=0 MARKER="compile\+first|steady:" \
        "$D/tpu_retry.sh" python -u "$D/tpu_trace_step.py" 65536 substep 0 \
        /tmp/fl_trace_r5
    grep -q "trace captured" "$A/measure_r5.log" && mark_done trace
fi

# ---- 6. tail: latte absorbs everything left (reserve a render slot)
while [ "$(left)" -gt 1800 ] && [ "$(latte_iters)" -lt "$LATTE_TARGET" ]; do
    latte_seg || break
    sleep 5
done
echo "LATTE at $(latte_iters) iters" >> "$A/queue.log"

# ---- 7. render the final pour from the chained policy --------------
if [ "$(left)" -gt 600 ]; then
    LOG="$A/latte_render.log" INIT_T=420 TOTAL_T="$(capped 1500)" TRIES=2 \
        STALL_T=0 MARKER="." \
        FL_CHAIN_STATE="$A4/latte_chain_state.pkl" \
        FL_RENDER_OUT="$A/latteart_chain_final_r5.png" \
        "$D/tpu_retry.sh" python -u "$D/tpu_latteart_render.py"
fi
echo "R5 QUEUE3 DONE $(date -u)" >> "$A/queue.log"
