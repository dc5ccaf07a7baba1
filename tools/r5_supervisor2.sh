#!/bin/bash
# Round-5 supervisor v3 (after both_split FAULTED): run the level-3
# pouring gates, then the 20-iter solve if the host-inverse fix
# survives, then hand over to queue2 for latte/rollouts/tasks/render.
#
# Usage: DEADLINE_TS=<epoch> nohup bash tools/r5_supervisor2.sh &
cd /root/repo
D="$(dirname "$0")"
A=/root/repo/artifacts/r5
DEADLINE_TS="${DEADLINE_TS:?}"

echo "supervisor2: start $(date -u)" >> "$A/queue.log"

# level-3 gate: the host-inverse candidate fix (exact semantics)
BISECT_GATES="both_hostinv" \
    BISECT_DEADLINE_TS=$(( $(date +%s) + 3000 )) \
    BISECT_INIT_T=420 BISECT_TOTAL_T=2400 BISECT_TRIES=2 \
    BISECT_STALL_T=1800 \
    bash "$D/r5_pouring_bisect2.sh"

FIX=""
if grep -q "^GATE both_hostinv SURVIVED" "$A/pouring_bisect.log"; then
    FIX="FL_COLLIDE_INV=host"
    echo "supervisor2: POURING FIX confirmed: $FIX" >> "$A/queue.log"
else
    # fix refuted — run the sticky-branch isolation gate for the dossier
    BISECT_GATES="both_sticky" \
        BISECT_DEADLINE_TS=$(( $(date +%s) + 2700 )) \
        BISECT_INIT_T=420 BISECT_TOTAL_T=2400 BISECT_TRIES=2 \
        BISECT_STALL_T=1800 \
        bash "$D/r5_pouring_bisect2.sh"
fi
echo "supervisor2: bisect3 done $(date -u)" >> "$A/queue.log"

FL_POURING_FIX="$FIX" DEADLINE_TS="$DEADLINE_TS" bash "$D/r5_queue2.sh" \
    >> /tmp/r5_queue2_nohup.log 2>&1
echo "supervisor2: queue2 done $(date -u)" >> "$A/queue.log"
