#!/bin/bash
# Waits for queue2's latte slice to end ("LATTE slice ended" marker),
# pauses the queue tree (exact PIDs), runs the both_remat gate, then —
# if it SURVIVED — hands FL_POURING_FIX=FL_COLLIDE_REMAT=1 to queue3;
# queue3 covers the remaining bounded stages (pouring-if-fix, rollouts,
# tasks, tail latte, render).
#
# Usage: SUP_PID=<supervisor2 pid> DEADLINE_TS=<epoch> nohup bash tools/r5_watcher3.sh &
cd /root/repo
D="$(dirname "$0")"
A=/root/repo/artifacts/r5
SUP_PID="${SUP_PID:?}"
DEADLINE_TS="${DEADLINE_TS:?}"

# NB: `grep -c` prints 0 AND exits 1 on zero matches — never `|| echo 0`
# after it (the fallback would append a second line and break -gt).
BASE=$(grep -c "LATTE slice ended" "$A/queue.log" 2>/dev/null)
BASE=${BASE:-0}
while kill -0 "$SUP_PID" 2>/dev/null; do
    n=$(grep -c "LATTE slice ended" "$A/queue.log" 2>/dev/null)
    n=${n:-0}
    [ "$n" -gt "$BASE" ] && break
    sleep 15
done

echo "watcher3: pausing at $(date -u)" >> "$A/queue.log"
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
PIDS=$(tree "$SUP_PID")
echo "watcher3: killing tree: $PIDS" >> "$A/queue.log"
kill -9 $PIDS 2>/dev/null
sleep 5

BISECT_GATES="both_remat" \
    BISECT_DEADLINE_TS=$(( $(date +%s) + 2700 )) \
    BISECT_INIT_T=420 BISECT_TOTAL_T=2400 BISECT_TRIES=2 \
    BISECT_STALL_T=1800 \
    bash "$D/r5_pouring_bisect2.sh"

FIX=""
grep -q "^GATE both_remat SURVIVED" "$A/pouring_bisect.log" \
    && FIX="FL_COLLIDE_REMAT=1"
echo "watcher3: remat verdict done, FIX='$FIX' $(date -u)" >> "$A/queue.log"

FL_POURING_FIX="$FIX" DEADLINE_TS="$DEADLINE_TS" nohup bash "$D/r5_queue3.sh" \
    >> /tmp/r5_queue3_nohup.log 2>&1 &
echo "watcher3: queue3 pid $! $(date -u)" >> "$A/queue.log"
