#!/bin/bash
# Wedge-aware retry supervisor for TPU jobs over the axon tunnel.
#
# ~50% of processes wedge at backend init (all threads futex-wait, no
# output).  This launches "$@" with output appended to $LOG, waits up to
# $INIT_T seconds for the liveness marker ("devices:" by default) to
# appear, kills the exact PID and retries if it doesn't, and otherwise
# lets the job run up to $TOTAL_T seconds.
#
# Usage: LOG=/tmp/x.log tools/tpu_retry.sh python tools/tpu_bench_batch.py
LOG="${LOG:-/tmp/tpu_retry.log}"
INIT_T="${INIT_T:-420}"
TOTAL_T="${TOTAL_T:-3600}"
MARKER="${MARKER:-devices:}"
TRIES="${TRIES:-8}"
# The tunnel also wedges MID-RUN (all threads futex-wait after hours of
# healthy iterations).  If the log stops growing for STALL_T seconds
# after the backend came up, kill and retry (0 disables).  Size it to
# several times the job's steady per-line interval.
STALL_T="${STALL_T:-0}"

for attempt in $(seq 1 "$TRIES"); do
    echo "=== attempt $attempt: $* ===" >> "$LOG"
    # only grep lines appended by THIS attempt (a marker from a previous
    # attempt in the shared log must not mark the new process alive)
    base_lines=$(wc -l < "$LOG")
    "$@" >> "$LOG" 2>&1 &
    pid=$!
    t0=$(date +%s)
    alive=0
    killed=0
    stalled=0
    last_size=$(stat -c %s "$LOG")
    last_growth=$(date +%s)
    while kill -0 "$pid" 2>/dev/null; do
        now=$(date +%s)
        el=$((now - t0))
        if [ "$alive" = 0 ] && tail -n +"$((base_lines + 1))" "$LOG" | grep -qE "$MARKER"; then
            alive=1
            echo "=== attempt $attempt: backend up after ${el}s ===" >> "$LOG"
        fi
        if [ "$alive" = 0 ] && [ "$el" -ge "$INIT_T" ]; then
            echo "=== attempt $attempt: init wedge, killing $pid ===" >> "$LOG"
            killed=1
            kill -9 "$pid" 2>/dev/null
            wait "$pid" 2>/dev/null
            break
        fi
        if [ "$STALL_T" != 0 ] && [ "$alive" = 1 ]; then
            size=$(stat -c %s "$LOG")
            if [ "$size" != "$last_size" ]; then
                last_size=$size
                last_growth=$now
            elif [ $((now - last_growth)) -ge "$STALL_T" ]; then
                echo "=== attempt $attempt: mid-run stall (${STALL_T}s no output), killing $pid ===" >> "$LOG"
                killed=1
                stalled=1
                kill -9 "$pid" 2>/dev/null
                wait "$pid" 2>/dev/null
                break
            fi
        fi
        if [ "$el" -ge "$TOTAL_T" ]; then
            echo "=== attempt $attempt: total timeout, killing $pid ===" >> "$LOG"
            kill -9 "$pid" 2>/dev/null
            wait "$pid" 2>/dev/null
            exit 2
        fi
        sleep 10
    done
    wait "$pid" 2>/dev/null
    rc=$?
    # re-check after exit: a fast job can print its marker and exit
    # within one 10s poll window (skip if WE killed it — the marker
    # racing the kill must still retry, and rc would be bogus)
    if [ "$alive" = 0 ] && [ "${killed:-0}" = 0 ] \
        && tail -n +"$((base_lines + 1))" "$LOG" | grep -qE "$MARKER"; then
        alive=1
    fi
    if [ "$alive" = 1 ] && [ "$stalled" = 0 ]; then
        echo "=== attempt $attempt: exited rc=$rc ===" >> "$LOG"
        exit "$rc"
    fi
done
echo "=== all $TRIES attempts wedged ===" >> "$LOG"
exit 3
