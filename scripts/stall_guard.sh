#!/usr/bin/env bash
# Tunnel-hang stall guard for long training drives.
#
# The TPU tunnel on this box occasionally hangs: the device call never
# returns, host CPU drops to ~0, and the training log stops advancing
# (memory: tpu-box-performance-envelope). The drive script already
# retries a dead phase from checkpoints — this guard just turns a silent
# multi-hour hang into a quick kill+retry:
#
#   - training lines ("step N:") stale > STEP_STALE_S  -> SIGTERM the sweep
#     (fit loop saves a checkpoint), escalate to SIGKILL if the save itself
#     hangs (it needs a device read, which is exactly what's broken)
#   - "prerendering"/startup may be log-silent for ~30 min on this host —
#     allowed up to LOAD_STALE_S
#
# Usage: stall_guard.sh <logfile> <pidfile-of-python> [poll_s]
set -u
LOGF=$1
PIDF=$2
POLL=${3:-60}
STEP_STALE_S=${STEP_STALE_S:-480}
LOAD_STALE_S=${LOAD_STALE_S:-2700}

say() { echo "[stall_guard $(date -u +%H:%M:%S)] $*"; }

while true; do
  sleep "$POLL"
  [ -f "$LOGF" ] || continue
  pid=$(cat "$PIDF" 2>/dev/null) || continue
  kill -0 "$pid" 2>/dev/null || continue
  age=$(( $(date +%s) - $(stat -c %Y "$LOGF") ))
  last=$(tail -1 "$LOGF")
  case "$last" in
    *"step "*) limit=$STEP_STALE_S ;;
    *"saving checkpoint"*) limit=300 ;;
    *) limit=$LOAD_STALE_S ;;
  esac
  if [ "$age" -gt "$limit" ]; then
    say "log stale ${age}s (limit ${limit}s, last: ${last:0:60}) — SIGTERM $pid"
    kill -TERM "$pid" 2>/dev/null
    for _ in $(seq 24); do kill -0 "$pid" 2>/dev/null || break; sleep 10; done
    if kill -0 "$pid" 2>/dev/null; then
      # $pid is the `timeout` wrapper; SIGKILLing it would orphan the hung
      # python (which is what holds the TPU) — kill the child tree by ppid
      kids=$(pgrep -P "$pid" || true)
      say "still alive after 240s — SIGKILL $pid + children [$kids]"
      for k in $kids; do kill -9 "$k" 2>/dev/null; done
      kill -9 "$pid" 2>/dev/null
    fi
    say "killed; drive retry takes over"
    sleep 300   # let the retry get past startup before watching again
  fi
done
