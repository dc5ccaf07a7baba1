#!/bin/bash
# Second-pass pouring bisect: same verdict semantics as
# r5_pouring_bisect.sh (SURVIVED / FAULTED / WEDGED-inconclusive) but
# with env-overridable retry knobs and an overall deadline, for
# re-running WEDGED gates when the tunnel is healthier.
#
#   BISECT_INIT_T (600) BISECT_TOTAL_T (2400) BISECT_TRIES (2)
#   BISECT_STALL_T (1800)  — generous: gate-program compiles produce no
#                            output for 10+ min through a slow tunnel
#   BISECT_DEADLINE_TS     — stop starting new gates past this epoch
cd /root/repo
D="$(dirname "$0")"
A=/root/repo/artifacts/r5
mkdir -p "$A"
V="$A/pouring_bisect.log"
DL="${BISECT_DEADLINE_TS:-$(( $(date +%s) + 7200 ))}"

# informativeness order: 'none' separates collide-vs-rest, grid/particle
# isolate the collide half, nocollect/both/fwdonly are secondary
# (the 'both' fault repro already has three r2-r4b sightings).
for GATE in ${BISECT_GATES:-none grid particle nocollect both fwdonly}; do
    grep -qE "^GATE $GATE (SURVIVED|FAULTED)" "$V" 2>/dev/null && continue
    [ "$(date +%s)" -lt "$DL" ] || { echo "BISECT2 DEADLINE" >> "$V"; break; }
    : > /tmp/bisect_$GATE.log   # fresh log: no stale SURVIVED lines
    LOG=/tmp/bisect_$GATE.log \
        INIT_T="${BISECT_INIT_T:-600}" TOTAL_T="${BISECT_TOTAL_T:-2400}" \
        TRIES="${BISECT_TRIES:-2}" STALL_T="${BISECT_STALL_T:-1800}" \
        MARKER="env:" FL_BISECT_GATE=$GATE \
        "$D/tpu_retry.sh" python -u "$D/tpu_pouring_bisect.py"
    rc=$?
    if grep -q "SURVIVED" /tmp/bisect_$GATE.log; then
        grep "GATE $GATE SURVIVED" /tmp/bisect_$GATE.log | tail -1 >> "$V"
    elif [ "$rc" = 2 ] || [ "$rc" = 3 ]; then
        echo "GATE $GATE WEDGED (rc=$rc)" >> "$V"
    else
        echo "GATE $GATE FAULTED (rc=$rc)" >> "$V"
    fi
    sleep 120
done
echo "BISECT2 PASS DONE $(date -u)" >> "$V"
