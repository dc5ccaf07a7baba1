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
    grep -q "^GATE $GATE " "$V" 2>/dev/null && continue
    LOG=/tmp/bisect_$GATE.log INIT_T=600 TOTAL_T=2400 TRIES=3 \
        STALL_T=900 MARKER="env:" \
        FL_BISECT_GATE=$GATE \
        "$D/tpu_retry.sh" python -u "$D/tpu_pouring_bisect.py"
    rc=$?
    if grep -q "SURVIVED" /tmp/bisect_$GATE.log; then
        grep "GATE $GATE SURVIVED" /tmp/bisect_$GATE.log >> "$V"
    else
        echo "GATE $GATE FAULTED (rc=$rc)" >> "$V"
    fi
    sleep 120
done
echo "BISECT DONE $(date -u)" >> "$V"
