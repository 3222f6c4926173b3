#!/bin/bash
# Round-5 EXTENSION close-out: run AFTER round5x_drive.sh ends (or is cut
# at the deadline by round5x_cut.sh). Priority-ordered and idempotent —
# whatever the remaining wall-clock allows is the most valuable prefix.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r5x_closeout.log}
step() { echo "=== $* $(date -u +%FT%TZ) ===" | tee -a "$LOG"; }

step "1/9 full-val re-eval at each run's latest checkpoint"
timeout 3600 python -u scripts/rd_reeval.py --run-dir runs/rd_clevr \
  --data-style clevr --out artifacts/rd_clevr_eval.json >>"$LOG" 2>&1

step "2/9 50k-matched tier now including shared4 + the single bank"
timeout 3600 python -u scripts/rd_reeval.py --run-dir runs/rd_clevr \
  --data-style clevr --at-step 50000 \
  --only mixed-l0.1,shared-l0.1,disjoint-l0.1,single-rgb-l0.1,shared4-l0.1,single-depth_euclidean-l0.1,single-normal-l0.1 \
  --out artifacts/rd_clevr_eval_at50k.json >>"$LOG" 2>&1

step "3/9 deep tier (mixed vs single-rgb at their matched max step)"
DEEP=$(python - <<'EOF'
import json
pts = {p["run"]: p for p in json.load(open("artifacts/rd_clevr.json"))}
print(min(int(pts.get(r, {}).get("steps") or 0)
          for r in ("mixed-l0.1", "single-rgb-l0.1")))
EOF
)
if [ "${DEEP:-0}" -gt 50000 ]; then
  timeout 3600 python -u scripts/rd_reeval.py --run-dir runs/rd_clevr \
    --data-style clevr --at-step "$DEEP" \
    --only mixed-l0.1,single-rgb-l0.1 \
    --out artifacts/rd_clevr_eval_deep.json >>"$LOG" 2>&1
  echo "deep tier at $DEEP" | tee -a "$LOG"
else
  echo "deep tier skipped (max matched step $DEEP <= 50k)" | tee -a "$LOG"
fi

step "4/9 semantic lambda-response + trajectory artifacts"
timeout 600 python -u scripts/semantic_lambda_response.py >>"$LOG" 2>&1 || true
timeout 600 python -u scripts/semantic_trajectory.py >>"$LOG" 2>&1 || true

step "5/9 multitask advantage (bank now budget-matched at 50k)"
timeout 600 python -u scripts/multitask_advantage.py >>"$LOG" 2>&1 || true

step "6/9 figures + ordering (classical overlay auto-generates)"
timeout 1800 python -u scripts/rd_roundup.py --run-dir runs/rd_clevr \
  --in artifacts/rd_clevr_eval.json --out-dir artifacts/rd_clevr_plots \
  --data-style clevr >>"$LOG" 2>&1
timeout 900 python -u scripts/rd_plots.py \
  --in artifacts/rd_clevr_eval_at12k.json \
  --out-dir artifacts/rd_clevr_plots_12k >>"$LOG" 2>&1
timeout 900 python -u scripts/rd_plots.py \
  --in artifacts/rd_clevr_eval_at50k.json \
  --out-dir artifacts/rd_clevr_plots_50k >>"$LOG" 2>&1

step "7/9 flagship eval + partial decode on the newest shared4 ckpt"
FLAG_CKPT=$(ls -d runs/rd_clevr/shared4-l0.1/checkpoints/step_* 2>/dev/null \
  | sort -t_ -k3 -n | tail -1)
timeout 1800 python -u scripts/eval_flagship.py "$FLAG_CKPT" \
  artifacts/flagship_eval.json >>"$LOG" 2>&1 || true
timeout 1800 python -u scripts/partial_decode_report.py >>"$LOG" 2>&1 || true

step "8/9 round-trip profile + bench (idle chip; autotunes stream/deconv/conv0)"
timeout 2400 python -u scripts/profile_roundtrip.py \
  --out artifacts/profile_roundtrip.json >>"$LOG" 2>&1 || true
timeout 2400 python -u bench.py | tee -a "$LOG"

step "9/9 consistency gates"
python scripts/check_artifacts.py | tee -a "$LOG"
bash scripts/check_multichip.sh >>"$LOG" 2>&1 \
  && echo "multichip: ok" | tee -a "$LOG"

step "closeout done"
