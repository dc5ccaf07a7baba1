#!/bin/bash
# r4: chained full-spec LatteArt solve supervisor.  Runs segment
# processes (tools/tpu_latteart_chain.py) under the wedge-aware retry
# launcher until the chain state reaches FL_CHAIN_TARGET iterations or
# DEADLINE_TS (epoch seconds) passes.  Safe to kill between segments:
# state persists in /tmp/latte_chain_state.pkl.
cd /root/repo
D="$(dirname "$0")"
DEADLINE_TS="${DEADLINE_TS:-0}"
while true; do
    if [ "$DEADLINE_TS" != 0 ] && [ "$(date +%s)" -ge "$DEADLINE_TS" ]; then
        echo "chain: deadline reached" >> /tmp/latte_chain_drv.log
        exit 0
    fi
    if grep -q "CHAIN COMPLETE" /tmp/latte_chain.log 2>/dev/null; then
        echo "chain: complete" >> /tmp/latte_chain_drv.log
        exit 0
    fi
    # pause requests (lets perf experiments borrow the chip between
    # segments): touch /tmp/latte_chain_pause to hold the chain
    while [ -e /tmp/latte_chain_pause ]; do
        sleep 30
    done
    LOG=/tmp/latte_chain.log INIT_T=420 TOTAL_T=3000 TRIES=10 \
        MARKER="resuming at iteration|target recorded|env:" \
        "$D/tpu_retry.sh" python -u "$D/tpu_latteart_chain.py"
    sleep 5
done
