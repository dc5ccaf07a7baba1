#!/bin/bash
# Round-5 measurement window — run while the r5 queue is PAUSED (the
# chip is single-tenant; see CLAUDE.md).  Collects:
#   1. fwd + grad re-check and the smoke @500-Jacobi number (VERDICT
#      weak #5) in ONE process (tpu_bench_batch)
#   2. a fresh forward xplane trace summary (glue-attack evidence)
#   3. three consecutive driver-command `python bench.py` runs — the
#      fail-fast supervisor proof (VERDICT next-round #1)
cd /root/repo
D="$(dirname "$0")"
A=/root/repo/artifacts/r5
mkdir -p "$A"

echo "=== measure window start $(date -u) ===" >> "$A/measure_r5.log"
LOG="$A/measure_r5.log" INIT_T=300 TOTAL_T=3000 TRIES=4 STALL_T=900 \
  MARKER="devices:" \
  FL_BATCH=fwd/substep,grad/w0,smoke/iters:500 FL_BATCH_SMOKEITERS=500 \
  "$D/tpu_retry.sh" python -u "$D/tpu_bench_batch.py"
sleep 20

LOG="$A/measure_r5.log" INIT_T=300 TOTAL_T=1800 TRIES=3 STALL_T=600 \
  MARKER="devices:" \
  "$D/tpu_retry.sh" python -u "$D/tpu_trace_step.py" 65536 substep 0 \
  /tmp/fl_trace_r5
sleep 20

: > "$A/bench_proof.log"
for i in 1 2 3; do
  T0=$(date +%s)
  timeout 900 python bench.py >> "$A/bench_proof.log" 2>&1
  RC=$?
  echo "bench run $i: rc=$RC $(( $(date +%s) - T0 ))s" >> "$A/bench_proof.log"
  sleep 20
done
echo "=== measure window done $(date -u) ===" >> "$A/measure_r5.log"
