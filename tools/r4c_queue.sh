#!/bin/bash
# r4c (short final round-4 session, fresh VM after the r4b reset): spend
# the whole chip window on the VERDICT #3 north star — the full-spec
# LatteArt chain (115,480 particles, H=330, reference Adam budget 500
# iters).  The r4b reset destroyed the in-flight chain state; this
# restart keeps EVERYTHING (state, course, target) under artifacts/r4c
# so round 5 resumes from git.  Task solves (icecream_static etc.) run
# at ~273 s/iter at 1/4 density (see artifacts/r4b/*_course.log) and do
# not fit this window; LatteArt programs are warm in the server-side
# compile cache (67 s/iter measured, RESULTS.md r4).
cd /root/repo
D="$(dirname "$0")"
A=/root/repo/artifacts/r4c
mkdir -p "$A"
DEADLINE_TS="${DEADLINE_TS:?set DEADLINE_TS (epoch seconds)}"
left() { echo $(( DEADLINE_TS - $(date +%s) )); }

while [ "$(left)" -gt 600 ]; do
    T=$(( $(left) - 120 )); [ "$T" -gt 3000 ] && T=3000
    LOG=/tmp/latte_chain.log INIT_T=420 TOTAL_T="$T" TRIES=6 \
        STALL_T=600 MARKER="resuming at iteration|target recorded|env:" \
        FL_CHAIN_SEG="${FL_CHAIN_SEG:-5}" \
        FL_CHAIN_STATE="$A/latte_chain_state.pkl" \
        FL_CHAIN_COURSE="$A/latte_chain_course.log" \
        FL_CHAIN_TARGET_PKL="$A/latte_tpu_target.pkl" \
        "$D/tpu_retry.sh" python -u "$D/tpu_latteart_chain.py"
    sleep 5
done
echo "R4C QUEUE DONE $(date -u)" >> "$A/queue.log"
