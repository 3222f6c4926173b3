#!/bin/bash
# Round-5 close-out: run AFTER the training drive completes (the TPU must
# be idle — evals, bench, and the profiler all want the whole chip).
# Idempotent: every step writes its artifact and moves on; a rerun skips
# nothing but only overwrites with fresher results.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/round5_closeout.log}
step() { echo "=== $* $(date -u +%FT%TZ) ===" | tee -a "$LOG"; }

step "1/8 full-val re-eval at each run's latest checkpoint"
timeout 3600 python -u scripts/rd_reeval.py --run-dir runs/rd_clevr \
  --data-style clevr --out artifacts/rd_clevr_eval.json >>"$LOG" 2>&1

step "2/8 budget-matched tier evals (12k incl. new grid runs; 50k core)"
timeout 3600 python -u scripts/rd_reeval.py --run-dir runs/rd_clevr \
  --data-style clevr --at-step 12000 \
  --out artifacts/rd_clevr_eval_at12k.json >>"$LOG" 2>&1
timeout 3600 python -u scripts/rd_reeval.py --run-dir runs/rd_clevr \
  --data-style clevr --at-step 50000 \
  --only mixed-l0.1,shared-l0.1,disjoint-l0.1,single-rgb-l0.1 \
  --out artifacts/rd_clevr_eval_at50k.json >>"$LOG" 2>&1

step "3/8 figures + ordering (classical overlay auto-generates)"
# three budget tiers: latest-checkpoint overview, the 12k-matched tier
# (every family + the full lambda grid -> multi-point curves + matched-
# rate ordering), and the 50k-matched lambda=0.1 core ordering
timeout 1800 python -u scripts/rd_roundup.py --run-dir runs/rd_clevr \
  --in artifacts/rd_clevr_eval.json --out-dir artifacts/rd_clevr_plots \
  --data-style clevr >>"$LOG" 2>&1
timeout 900 python -u scripts/rd_plots.py \
  --in artifacts/rd_clevr_eval_at12k.json \
  --out-dir artifacts/rd_clevr_plots_12k >>"$LOG" 2>&1
timeout 900 python -u scripts/rd_plots.py \
  --in artifacts/rd_clevr_eval_at50k.json \
  --out-dir artifacts/rd_clevr_plots_50k >>"$LOG" 2>&1

step "4/8 flagship eval refresh (newest shared4 checkpoint)"
FLAG_CKPT=$(ls -d runs/rd_clevr/shared4-l0.1/checkpoints/step_* 2>/dev/null \
  | sort -t_ -k3 -n | tail -1)
timeout 1800 python -u scripts/eval_flagship.py "$FLAG_CKPT" \
  artifacts/flagship_eval.json >>"$LOG" 2>&1 || true

step "5/8 latent sparsity on a live low-lambda checkpoint"
SPARSE_CKPT=$(ls -d runs/rd_clevr/mixed-l0.001/checkpoints/step_* 2>/dev/null \
  | sort -t_ -k3 -n | tail -1)
timeout 1800 python -u scripts/latent_sparsity.py --ckpt "$SPARSE_CKPT" \
  >>"$LOG" 2>&1 || true

step "5b/8 semantic CE/mIoU trajectory from the run logs"
timeout 600 python -u scripts/semantic_trajectory.py >>"$LOG" 2>&1 || true

step "6/8 partial-decode refresh on the 50k checkpoints"
timeout 1800 python -u scripts/partial_decode_report.py >>"$LOG" 2>&1 || true

step "7/8 round-trip profile + bench (idle chip)"
timeout 1800 python -u scripts/profile_roundtrip.py \
  --out artifacts/profile_roundtrip.json >>"$LOG" 2>&1 || true
timeout 1800 python -u bench.py | tee -a "$LOG"

step "8/8 consistency gates"
python scripts/check_artifacts.py | tee -a "$LOG"
bash scripts/check_multichip.sh >>"$LOG" 2>&1 \
  && echo "multichip: ok" | tee -a "$LOG"

step "closeout done"
