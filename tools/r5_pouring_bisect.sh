#!/bin/bash
# Round-5 hardware queue leg: bisect the Pouring worker fault (open
# item (d)) — one gate per process, 120 s worker-recovery pause after
# every run (a kernel-faulted worker poisons the next process's first
# dispatch).  Verdicts land in artifacts/r5/pouring_bisect.log:
# "GATE <g> SURVIVED" or "GATE <g> FAULTED (rc=N)".
cd /root/repo
D="$(dirname "$0")"
A=/root/repo/artifacts/r5
mkdir -p "$A"
V="$A/pouring_bisect.log"

for GATE in fwdonly none grid particle nocollect both; do
    # only a SURVIVED/FAULTED verdict skips; WEDGED (inconclusive) re-runs
    grep -qE "^GATE $GATE (SURVIVED|FAULTED)" "$V" 2>/dev/null && continue
    LOG=/tmp/bisect_$GATE.log INIT_T=600 TOTAL_T=2400 TRIES=3 \
        STALL_T=900 MARKER="env:" \
        FL_BISECT_GATE=$GATE \
        "$D/tpu_retry.sh" python -u "$D/tpu_pouring_bisect.py"
    rc=$?
    if grep -q "SURVIVED" /tmp/bisect_$GATE.log; then
        grep "GATE $GATE SURVIVED" /tmp/bisect_$GATE.log >> "$V"
    elif [ "$rc" = 2 ] || [ "$rc" = 3 ]; then
        # tpu_retry total-timeout (2) / all-attempts-wedged (3): tunnel
        # trouble, NOT evidence about the gate — record inconclusive so
        # the next queue pass retries it
        echo "GATE $GATE WEDGED (rc=$rc)" >> "$V"
    else
        # marker-confirmed run (tpu_retry only propagates the child's rc
        # after the liveness marker appeared) that died before SURVIVED
        echo "GATE $GATE FAULTED (rc=$rc)" >> "$V"
    fi
    sleep 120
done
echo "BISECT DONE $(date -u)" >> "$V"
