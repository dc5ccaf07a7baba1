#!/bin/bash
# Waits for the pouring bisect to produce 6 verdicts (or the bisect
# stage to otherwise end), then pauses the r5 queue (kill by exact PIDs
# from the process tree rooted at QUEUE_PID), runs the measurement
# window (tools/r5_measure.sh), and relaunches tools/r5_queue2.sh with
# the same DEADLINE_TS.
#
# Usage: QUEUE_PID=<pid> DEADLINE_TS=<epoch> nohup bash tools/r5_window_watcher.sh &
cd /root/repo
D="$(dirname "$0")"
A=/root/repo/artifacts/r5
QUEUE_PID="${QUEUE_PID:?}"
DEADLINE_TS="${DEADLINE_TS:?}"
V="$A/pouring_bisect.log"

verdicts() { grep -cE '^GATE [a-z]+ (SURVIVED|FAULTED|WEDGED)' "$V" 2>/dev/null; }

while kill -0 "$QUEUE_PID" 2>/dev/null; do
    n=$(verdicts)
    [ "${n:-0}" -ge 6 ] && break
    # bisect script already finished some other way (e.g. all wedged)
    grep -q "BISECT DONE" "$V" 2>/dev/null && break
    sleep 20
done

echo "watcher: pausing queue at $(date -u) (verdicts=$(verdicts))" >> "$A/queue.log"
# kill the exact process tree rooted at the queue bash: collect PIDs
# breadth-first via ps --ppid (no pattern matching)
tree() {
    local out="$1" frontier="$1"
    while [ -n "$frontier" ]; do
        local next=""
        for p in $frontier; do
            local kids
            kids=$(ps -o pid= --ppid "$p" | tr -d ' ' | tr '\n' ' ')
            next="$next $kids"
        done
        frontier=$(echo "$next" | xargs)
        out="$out $frontier"
    done
    echo "$out" | xargs
}
PIDS=$(tree "$QUEUE_PID")
echo "watcher: killing tree: $PIDS" >> "$A/queue.log"
kill -9 $PIDS 2>/dev/null
sleep 5

bash "$D/r5_measure.sh"
echo "watcher: measure window done $(date -u)" >> "$A/queue.log"

DEADLINE_TS="$DEADLINE_TS" nohup bash "$D/r5_queue2.sh" \
    >> /tmp/r5_queue2_nohup.log 2>&1 &
echo "watcher: queue2 relaunched pid $! $(date -u)" >> "$A/queue.log"
