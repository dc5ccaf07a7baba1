#!/bin/bash
# r4 queue 3: hardware solves for three more tasks (VERDICT r3 #5) at
# reduced-but-honest spec (1/4 reference density, FULL reference
# horizon, >=20 iterations): Pouring, GatheringEasy, IceCreamStatic.
# Waits for queue2 to release the chip, pauses the LatteArt chain,
# runs the three solves, resumes the chain.
cd /root/repo
D="$(dirname "$0")"
while ! grep -q "R4 QUEUE2 DONE" /tmp/r4_queue2.log 2>/dev/null; do
    sleep 60
done
touch /tmp/latte_chain_pause
while pgrep -f "tpu_latteart_chain.py" > /dev/null; do
    sleep 20
done

for TASK in pouring gathering_easy icecream_static; do
    LOG=/tmp/task_${TASK}.log INIT_T=600 TOTAL_T=7200 TRIES=8 \
        MARKER="env:" \
        FL_TASK=$TASK FL_TASK_FRAC=0.25 FL_SOLVE_ITERS=20 \
        FL_CHAIN_STATE=/tmp/${TASK}_chain_state.pkl \
        FL_CHAIN_COURSE=/tmp/${TASK}_chain_course.log \
        FL_SOLVE_POLICY_OUT=artifacts/${TASK}_solve_r4_policy.pkl \
        "$D/tpu_retry.sh" python -u "$D/tpu_task_solve.py"
    echo "TASK $TASK DONE" >> /tmp/r4_queue3.log
done

rm -f /tmp/latte_chain_pause
echo "R4 QUEUE3 DONE" >> /tmp/r4_queue3.log
