#!/bin/bash
# r4 queue 4 (final): when the LatteArt chain hits its deadline or
# completes, replay the final policy on the chip and render artifacts.
cd /root/repo
D="$(dirname "$0")"
while ! grep -qE "chain: (deadline reached|complete)" /tmp/latte_chain_drv.log 2>/dev/null; do
    sleep 120
done
LOG=/tmp/latte_render.log INIT_T=600 TOTAL_T=2400 TRIES=6 \
    MARKER="rendering policy" \
    "$D/tpu_retry.sh" python -u "$D/tpu_latteart_render.py"
echo "R4 QUEUE4 DONE" >> /tmp/r4_queue4.log
