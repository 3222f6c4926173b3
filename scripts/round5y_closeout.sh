#!/bin/bash
# Second-extension close-out: cut the r5y drive (SIGTERM → fit saves a
# checkpoint), then run the trimmed, priority-ordered endgame for the
# semantic lambda-response session. Idempotent; kills only pidfile pids.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r5y_closeout.log}
step() { echo "=== $* $(date -u +%FT%TZ) ===" | tee -a "$LOG"; }

step "0/7 cut the drive"
DRIVE=$(cat /tmp/r5y_drive.pid 2>/dev/null || true)
PHASE=$(cat /tmp/r5y_phase.pid 2>/dev/null || true)
if [ -n "$DRIVE" ] && kill -0 "$DRIVE" 2>/dev/null; then
  kill "$DRIVE" 2>/dev/null            # stop the relaunch loop first
  [ -n "$PHASE" ] && kill -TERM "$PHASE" 2>/dev/null
  for _ in $(seq 30); do
    [ -n "$PHASE" ] && kill -0 "$PHASE" 2>/dev/null || break
    sleep 10
  done
  if [ -n "$PHASE" ] && kill -0 "$PHASE" 2>/dev/null; then
    echo "phase still alive after 300s — SIGKILL" | tee -a "$LOG"
    kill -9 "$PHASE" 2>/dev/null
    sleep 5
  fi
fi

step "1/7 full-val re-eval of the new semantic runs (latest ckpt)"
timeout 1200 python -u scripts/rd_reeval.py --run-dir runs/rd_clevr \
  --data-style clevr --only single-semantic-l1,single-semantic-l10 \
  --out artifacts/rd_clevr_eval.json >>"$LOG" 2>&1 || true

step "2/7 matched-12k tier points for runs that actually reached 12k"
ADD=""
for r in single-semantic-l1 single-semantic-l10; do
  [ -d "runs/rd_clevr/$r/checkpoints/step_12000" ] && ADD="$ADD,$r"
done
ADD=${ADD#,}
if [ -n "$ADD" ]; then
  timeout 1200 python -u scripts/rd_reeval.py --run-dir runs/rd_clevr \
    --data-style clevr --at-step 12000 --only "$ADD" \
    --out artifacts/rd_clevr_eval_at12k.json >>"$LOG" 2>&1 || true
  echo "added 12k-tier: $ADD" | tee -a "$LOG"
else
  echo "no new run reached a step_12000 checkpoint" | tee -a "$LOG"
fi

step "3/7 semantic lambda-response + trajectory artifacts"
timeout 600 python -u scripts/semantic_lambda_response.py >>"$LOG" 2>&1 || true
timeout 600 python -u scripts/semantic_trajectory.py >>"$LOG" 2>&1 || true

step "4/7 declare the reset on the sweep artifact (safe now: sweep dead)"
python scripts/declare_lost_checkpoints.py \
  --note "2026-08-19 VM reset between the round-5 extension drive and this session wiped runs/ (all rd_clevr checkpoints) and both compile caches; metrics in this row were computed before the reset and are no longer re-derivable. See NOTES_ROUND5.md." \
  artifacts/rd_clevr.json | tee -a "$LOG"

step "5/7 refresh the 12k-tier figures (semantic lambda-response curve)"
timeout 900 python -u scripts/rd_plots.py \
  --in artifacts/rd_clevr_eval_at12k.json \
  --out-dir artifacts/rd_clevr_plots_12k >>"$LOG" 2>&1 || true

step "6/7 consistency gate"
python scripts/check_artifacts.py | tee -a "$LOG"

step "7/7 bench on the now-idle chip (records the v2 figure officially)"
timeout 2400 python -u bench.py | tee -a "$LOG"

step "closeout done"
