#!/bin/bash
# Keepalive for slow remote compiles under tpu_retry's stall watchdog.
#
# tpu_retry kills a job whose log stops growing for STALL_T — the right
# call for a wedged process (all threads futex_do_wait) but wrong for a
# healthy remote compile, which is silent for 10-20 min while one
# thread waits on the compile-service socket (ep_poll).  This daemon
# distinguishes the two from /proc: for every process whose stdout is
# redirected into one of our TPU job logs, if it has an ep_poll/poll
# thread (active network wait) and its log is quiet, append a keepalive
# line — resetting the stall timer.  Truly wedged processes (no network
# wait) get no keepalive and die by watchdog as before.
#
# Usage: nohup bash tools/compile_keepalive.sh <log1> <log2> ... &
INTERVAL="${KEEPALIVE_INTERVAL:-420}"
LOGS=("$@")
[ "${#LOGS[@]}" -gt 0 ] || {
    echo "usage: compile_keepalive.sh <log paths...>" >&2; exit 1; }

while true; do
    sleep "$INTERVAL"
    for pdir in /proc/[0-9]*; do
        pid="${pdir#/proc/}"
        out=$(readlink "$pdir/fd/1" 2>/dev/null) || continue
        match=0
        for L in "${LOGS[@]}"; do
            [ "$out" = "$L" ] && match=1 && break
        done
        [ "$match" = 1 ] || continue
        # only python jobs (not the tpu_retry bash holding the same fd)
        case "$(readlink "$pdir/exe" 2>/dev/null)" in
            *python*) ;; *) continue ;;
        esac
        # active network wait?
        netwait=0
        for t in "$pdir"/task/*; do
            w=$(cat "$t/wchan" 2>/dev/null)
            case "$w" in
                ep_poll|do_poll|do_select|sock_*|tcp_*|unix_*|do_sys_poll)
                    netwait=1; break ;;
            esac
        done
        [ "$netwait" = 1 ] || continue
        # quiet log? (no growth for > INTERVAL/2 — cheap proxy: mtime)
        now=$(date +%s)
        mt=$(stat -c %Y "$out" 2>/dev/null) || continue
        if [ $(( now - mt )) -ge $(( INTERVAL / 2 )) ]; then
            echo "[keepalive $(date -u +%H:%M:%S): pid $pid remote-wait alive]" >> "$out"
        fi
    done
done
