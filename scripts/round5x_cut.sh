#!/bin/bash
# Deadline cutter for the round-5 extension drive: at CUT_AT (UTC HH:MM),
# SIGTERM the sweep's python child (fit saves a checkpoint on SIGTERM),
# then stop the drive loop and the stall guard so the chip goes idle for
# the close-out evals + bench. Kills only by specific pidfile pids.
#
# Usage: round5x_cut.sh [CUT_AT]
set -u
CUT_AT=${1:-08:45}
LOG=/tmp/r5x_cut.log
say() { echo "[cut $(date -u +%FT%TZ)] $*" >>"$LOG"; }

# epoch arithmetic — a lexical HH:MM comparison fires instantly when the
# deadline is on the other side of midnight
TARGET=$(date -u -d "today $CUT_AT" +%s)
NOW=$(date -u +%s)
[ "$TARGET" -le "$NOW" ] && TARGET=$((TARGET + 86400))
say "armed for ${CUT_AT}Z (in $(( (TARGET - NOW) / 60 )) min)"
while [ "$(date -u +%s)" -lt "$TARGET" ]; do sleep 20; done

DRIVE=$(cat /tmp/r5x_drive.pid 2>/dev/null || true)
PHASE=$(cat /tmp/r5x_phase.pid 2>/dev/null || true)
GUARD=$(cat /tmp/r5x_guard.pid 2>/dev/null || true)

if [ -n "$DRIVE" ] && kill -0 "$DRIVE" 2>/dev/null; then
  say "cutting: drive=$DRIVE phase=$PHASE"
  kill "$DRIVE" 2>/dev/null            # stop the relaunch loop first
  [ -n "$PHASE" ] && kill -TERM "$PHASE" 2>/dev/null
  # give fit's SIGTERM handler time to save a checkpoint
  for _ in $(seq 30); do
    [ -n "$PHASE" ] && kill -0 "$PHASE" 2>/dev/null || break
    sleep 10
  done
  if [ -n "$PHASE" ] && kill -0 "$PHASE" 2>/dev/null; then
    say "phase still alive after 300s — SIGKILL"
    kill -9 "$PHASE" 2>/dev/null
  fi
else
  say "drive already dead"
fi
[ -n "$GUARD" ] && kill "$GUARD" 2>/dev/null
say "done; chip should be idle"
