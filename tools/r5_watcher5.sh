#!/bin/bash
# End-game: once the pouring course has >= POURING_ITERS lines (the
# VERDICT #3 bar) or FORCE_TS passes, kill the queue3 tree and spend
# the remaining chip time on the icecream_static course (43.6 s/iter
# measured — a 20-iter course fits in ~15 min), then a final latte
# render if minutes remain.
#
# Usage: Q3_PID=<pid> DEADLINE_TS=<epoch> nohup bash tools/r5_watcher5.sh &
cd /root/repo
D="$(dirname "$0")"
A=/root/repo/artifacts/r5
Q3_PID="${Q3_PID:?}"
DEADLINE_TS="${DEADLINE_TS:?}"
POURING_ITERS="${POURING_ITERS:-20}"
FORCE_TS="${FORCE_TS:-$(( DEADLINE_TS - 1500 ))}"

while kill -0 "$Q3_PID" 2>/dev/null; do
    n=$(grep -c "" "$A/pouring_course.log" 2>/dev/null)
    [ "${n:-0}" -ge "$POURING_ITERS" ] && break
    [ "$(date +%s)" -ge "$FORCE_TS" ] && break
    sleep 20
done

echo "watcher5: switching to icecream at $(date -u) (pouring lines: $(grep -c "" "$A/pouring_course.log" 2>/dev/null))" >> "$A/queue.log"
tree() {
    local out="$1" frontier="$1"
    while [ -n "$frontier" ]; do
        local next=""
        for p in $frontier; do
            next="$next $(ps -o pid= --ppid "$p" | tr -d ' ' | tr '\n' ' ')"
        done
        frontier=$(echo "$next" | xargs)
        out="$out $frontier"
    done
    echo "$out" | xargs
}
PIDS=$(tree "$Q3_PID")
echo "watcher5: killing tree: $PIDS" >> "$A/queue.log"
kill -9 $PIDS 2>/dev/null
sleep 30

left() { echo $(( DEADLINE_TS - $(date +%s) )); }
if [ "$(left)" -gt 900 ]; then
    T=$(( $(left) - 240 ))
    LOG=/tmp/task_icecream_static.log INIT_T=420 TOTAL_T="$T" TRIES=2 \
        STALL_T=900 MARKER="env:" \
        FL_TASK=icecream_static FL_TASK_FRAC=0.25 FL_SOLVE_ITERS=18 \
        FL_CHAIN_STATE="$A/icecream_static_chain_state.pkl" \
        FL_CHAIN_COURSE="$A/icecream_static_course.log" \
        FL_SOLVE_POLICY_OUT="$A/icecream_static_solve_r5_policy.pkl" \
        "$D/tpu_retry.sh" python -u "$D/tpu_task_solve.py"
fi
echo "watcher5: icecream done at $(date -u), $(grep -c "" "$A/icecream_static_course.log" 2>/dev/null) lines" >> "$A/queue.log"
echo "R5 ENDGAME DONE $(date -u)" >> "$A/queue.log"
