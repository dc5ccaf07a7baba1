#!/bin/bash
# Round-5 manual re-sequencing (replaces r5_queue.sh stage flow after
# the pass-1 bisect proved compile-latency-bound: >900 s of silent
# remote compile per gate defeated STALL_T=900 and would have eaten 5h).
#
#   1. measurement window (bounded ~40 min, guaranteed evidence)
#   2. bisect pass 2 — informative gates first, hard deadline
#   3. queue2 (rollouts -> latte slice -> tasks -> tail latte)
#
# Usage: DEADLINE_TS=<epoch> nohup bash tools/r5_supervisor.sh &
cd /root/repo
D="$(dirname "$0")"
A=/root/repo/artifacts/r5
DEADLINE_TS="${DEADLINE_TS:?}"

echo "supervisor: start $(date -u)" >> "$A/queue.log"
bash "$D/r5_measure.sh"
echo "supervisor: measure done $(date -u)" >> "$A/queue.log"

BISECT_DEADLINE_TS=$(( $(date +%s) + ${BISECT_BUDGET_S:-5400} )) \
    BISECT_INIT_T=420 BISECT_TOTAL_T=2700 BISECT_TRIES=2 \
    BISECT_STALL_T=2100 \
    bash "$D/r5_pouring_bisect2.sh"
echo "supervisor: bisect2 done $(date -u)" >> "$A/queue.log"

DEADLINE_TS="$DEADLINE_TS" bash "$D/r5_queue2.sh" \
    >> /tmp/r5_queue2_nohup.log 2>&1
echo "supervisor: queue2 done $(date -u)" >> "$A/queue.log"
