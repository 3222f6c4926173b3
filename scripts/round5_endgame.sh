#!/bin/bash
# Round-5 endgame (replaces the phase-C runbook, which cannot fit the
# remaining wall-clock): cut the training drive once single-semantic-l0.1
# reaches 30k (or at the hard deadline), then run the trimmed close-out —
# tier evals, figures, artifact refreshes, bench, gates — in strict
# priority order so whatever the wall-clock allows is the most valuable
# prefix. Idempotent; safe to re-run.
#
# Usage: round5_endgame.sh <drive-pid> <deadline-HH:MM-utc>
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/round5_endgame.log}
DRIVE_PID=${1:?drive pid}
DEADLINE=${2:-22:20}
END_BY=${END_BY:-23:00}   # no chip work past this; driver's bench needs an idle chip
say() { echo "[endgame $(date -u +%FT%TZ)] $*" >>"$LOG"; }
time_ok() { [ "$(date -u +%H:%M)" '<' "$END_BY" ]; }

sem_done() {
  python - <<'EOF'
import json
pts = {p["run"]: p for p in json.load(open("artifacts/rd_clevr.json"))}
p = pts.get("single-semantic-l0.1", {})
raise SystemExit(0 if int(p.get("steps") or 0) >= 30000 else 1)
EOF
}

past_deadline() { [ "$(date -u +%H:%M)" '>' "$DEADLINE" ]; }

say "armed: waiting for single-semantic-l0.1@30k or ${DEADLINE}Z"
while kill -0 "$DRIVE_PID" 2>/dev/null && ! sem_done && ! past_deadline; do
  sleep 30
done

if kill -0 "$DRIVE_PID" 2>/dev/null; then
  say "cutting drive (sem_done=$(sem_done && echo yes || echo no))"
  PHASE_PID=$(cat /tmp/round5_phase.pid 2>/dev/null || true)
  kill "$DRIVE_PID" 2>/dev/null
  [ -n "${PHASE_PID}" ] && kill "$PHASE_PID" 2>/dev/null
  sleep 20
  [ -n "${PHASE_PID}" ] && kill -9 "$PHASE_PID" 2>/dev/null
else
  say "drive already exited"
fi

# let the at-50k re-eval (started concurrently) finish before chip work
REEVAL_PID=$(cat /tmp/reeval50k.pid 2>/dev/null || true)
if [ -n "$REEVAL_PID" ]; then
  say "waiting for at-50k re-eval pid $REEVAL_PID"
  while kill -0 "$REEVAL_PID" 2>/dev/null; do sleep 15; done
fi
sleep 10

if time_ok; then
  say "1/9 at-12k grid evals (4 new lambda-grid runs, merged into artifact)"
  timeout 1500 python -u scripts/rd_reeval.py --run-dir runs/rd_clevr \
    --data-style clevr --at-step 12000 \
    --only mixed-l0.001,single-rgb-l0.001,shared-l0.01,disjoint-l0.01 \
    --out artifacts/rd_clevr_eval_at12k.json >>"$LOG" 2>&1
  say "rc=$?"
fi

say "2/9 figures: 50k core ordering + 12k grid curves"
timeout 900 python -u scripts/rd_plots.py \
  --in artifacts/rd_clevr_eval_at50k.json \
  --out-dir artifacts/rd_clevr_plots_50k >>"$LOG" 2>&1
timeout 900 python -u scripts/rd_plots.py \
  --in artifacts/rd_clevr_eval_at12k.json \
  --out-dir artifacts/rd_clevr_plots_12k >>"$LOG" 2>&1
say "rc=$?"

if time_ok; then
  say "3/9 bench (idle chip)"
  timeout 1200 python -u bench.py >>"$LOG" 2>&1
  say "rc=$?"
fi

if time_ok; then
  say "4/9 flagship eval refresh (newest shared4 checkpoint)"
  FLAG_CKPT=$(ls -d runs/rd_clevr/shared4-l0.1/checkpoints/step_* 2>/dev/null \
    | sort -t_ -k3 -n | tail -1)
  timeout 1200 python -u scripts/eval_flagship.py "$FLAG_CKPT" \
    artifacts/flagship_eval.json >>"$LOG" 2>&1
  say "rc=$?"
fi

if time_ok; then
  say "5/9 partial-decode refresh on the 50k checkpoints"
  timeout 1200 python -u scripts/partial_decode_report.py >>"$LOG" 2>&1
  say "rc=$?"
fi

if time_ok; then
  say "6/9 latent sparsity on mixed-l0.001"
  SPARSE_CKPT=$(ls -d runs/rd_clevr/mixed-l0.001/checkpoints/step_* 2>/dev/null \
    | sort -t_ -k3 -n | tail -1)
  timeout 900 python -u scripts/latent_sparsity.py --ckpt "$SPARSE_CKPT" \
    >>"$LOG" 2>&1
  say "rc=$?"
fi

say "7/9 semantic trajectory from run logs"
timeout 600 python -u scripts/semantic_trajectory.py >>"$LOG" 2>&1
say "rc=$?"

say "8/9 gates"
python scripts/check_artifacts.py >>"$LOG" 2>&1
say "check_artifacts rc=$?"
bash scripts/check_multichip.sh >>"$LOG" 2>&1
say "check_multichip rc=$?"

say "9/9 commit artifacts"
git add -A artifacts/ && git commit -q \
  -m "Round-5 endgame artifacts: 50k core evals+figures, 12k lambda-grid, flagship/partial-decode/sparsity refresh" \
  -m "No-Verification-Needed: generated eval artifacts and figures only" \
  >>"$LOG" 2>&1
say "commit rc=$?"
say "endgame done"
