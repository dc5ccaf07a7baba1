#!/bin/bash
# Final round-5 intervention: when queue3's rollouts stage ends (new
# "ROLLOUTS" marker in queue.log) or queue3 dies, pause it, run the
# both_gridsg gate (grid-collide with pose stop_gradient — the
# formulation-decomposition candidate), and relaunch queue3 with the
# fix if it survives (pouring solve then runs first); if it faults,
# run the grid_dummy diagnostic gate instead, then relaunch queue3.
#
# Usage: Q3_PID=<pid> DEADLINE_TS=<epoch> nohup bash tools/r5_watcher4.sh &
cd /root/repo
D="$(dirname "$0")"
A=/root/repo/artifacts/r5
Q3_PID="${Q3_PID:?}"
DEADLINE_TS="${DEADLINE_TS:?}"

BASE=$(grep -c "^ROLLOUTS" "$A/queue.log" 2>/dev/null)
BASE=${BASE:-0}
while kill -0 "$Q3_PID" 2>/dev/null; do
    n=$(grep -c "^ROLLOUTS" "$A/queue.log" 2>/dev/null)
    n=${n:-0}
    [ "$n" -gt "$BASE" ] && break
    sleep 15
done

echo "watcher4: pausing at $(date -u)" >> "$A/queue.log"
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
echo "watcher4: killing tree: $PIDS" >> "$A/queue.log"
kill -9 $PIDS 2>/dev/null
sleep 5

FIX=""
if grep -q "SURVIVED" /tmp/gridsg_cpu_smoke.log 2>/dev/null; then
    BISECT_GATES="both_gridsg" \
        BISECT_DEADLINE_TS=$(( $(date +%s) + 2400 )) \
        BISECT_INIT_T=420 BISECT_TOTAL_T=2100 BISECT_TRIES=2 \
        BISECT_STALL_T=1800 \
        bash "$D/r5_pouring_bisect2.sh"
    grep -q "^GATE both_gridsg SURVIVED" "$A/pouring_bisect.log" \
        && FIX="FL_COLLIDE_GRID_SG=1"
else
    echo "watcher4: gridsg CPU smoke not green — skipping gate" >> "$A/queue.log"
fi
if [ -z "$FIX" ] && [ $(( DEADLINE_TS - $(date +%s) )) -gt 5400 ]; then
    # no fix — spend one slot on the decisive diagnostic instead
    BISECT_GATES="grid_dummy" \
        BISECT_DEADLINE_TS=$(( $(date +%s) + 2400 )) \
        BISECT_INIT_T=420 BISECT_TOTAL_T=2100 BISECT_TRIES=2 \
        BISECT_STALL_T=1800 \
        bash "$D/r5_pouring_bisect2.sh"
fi
echo "watcher4: gates done, FIX='$FIX' $(date -u)" >> "$A/queue.log"

FL_POURING_FIX="$FIX" DEADLINE_TS="$DEADLINE_TS" nohup bash "$D/r5_queue3.sh" \
    >> /tmp/r5_queue3_nohup.log 2>&1 &
echo "watcher4: queue3 relaunched pid $! $(date -u)" >> "$A/queue.log"
