#!/bin/bash
# Round-5 extension drive (the window was extended past the planned
# endgame): two phases, completion-checked relaunch, priority-ordered so
# a deadline cut always truncates the least valuable tail job.
#
# Phase S (semantic-only HBM cache — cheap load):
#   single-semantic at lambda 1 and 10 -> 20k. DESIGN.md's rate-starvation
#   diagnosis showed the latent EMPTIES at lambda<=0.1 because
#   loss = lambda*rec + rate and semantic's CE is mean-over-pixels (both
#   ours and the reference's, multi_task_compressor.py:244-247) — ~5
#   orders smaller than the summed-over-HW MSE tasks. The knob that buys
#   the latent bits is therefore a LARGER lambda; these two runs turn the
#   diagnosis into a measured lambda-response curve (bpp up, mIoU off the
#   0.0599 frozen floor).
#
# Phase FM (4-task HBM cache, one process = one load):
#   1. shared4 -> 50k (remat)      flagship at the matched 50k tier
#   2. single-depth/normal -> 50k  removes multitask_advantage.json's
#                                  declared 12k-budget caveat for the bank
#   3. mixed + single-rgb -> 100k  the Fig.-4 anchor pair, matched deep tier
#   4. mixed -> 150k               stretch, cut-at-deadline fodder
#
# Retry on COMPLETION, not exit code (sweep's per-job isolation exits 0
# on partial failure). The current python child pid is kept in
# /tmp/r5x_phase.pid for the stall guard and the deadline cutter.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r5x_drive.log}
PHASE_PIDF=/tmp/r5x_phase.pid

check() { # check <run:steps>... -> 0 iff all runs are at-bar with clean evals
  python - "$@" <<'EOF'
import json, sys
try:
    pts = {p["run"]: p for p in json.load(open("artifacts/rd_clevr.json"))}
except Exception:
    sys.exit(1)
for spec in sys.argv[1:]:
    run, steps = spec.rsplit(":", 1)
    p = pts.get(run, {})
    if int(p.get("steps") or 0) < int(steps) or "rd_eval_error" in p:
        print(f"  incomplete: {run} at {p.get('steps')} (< {steps})"
              + (" eval-error" if "rd_eval_error" in p else ""))
        sys.exit(1)
sys.exit(0)
EOF
}

probe_tpu() { # bounded wait for the tunnel to come back before a retry
  for i in $(seq 1 30); do
    timeout 120 python -c "import jax; jax.numpy.zeros(1).block_until_ready()" \
      >/dev/null 2>&1 && return 0
    echo "[drive] TPU probe failed ($i/30), sleeping 60s" >>"$LOG"
    sleep 60
  done
  return 1
}

drive_phase() { # drive_phase <name> <jobs> <attempts> <check-spec>...
  local name=$1 jobs=$2 attempts=$3; shift 3
  for attempt in $(seq 1 "$attempts"); do
    if check "$@" >>"$LOG"; then
      echo "[drive] phase $name complete" >>"$LOG"; return 0
    fi
    probe_tpu || { echo "[drive] TPU gone, abort $name" >>"$LOG"; return 1; }
    echo "=== phase $name attempt $attempt $(date -u +%FT%TZ) ===" >>"$LOG"
    python scripts/rd_paper_sweep.py \
      --data-style clevr --run-dir runs/rd_clevr --out artifacts/rd_clevr.json \
      --refresh --extend --checkpoint-every-epochs 20 \
      --jobs "$jobs" >>"$LOG" 2>&1 &
    echo $! >"$PHASE_PIDF"
    wait $!
    echo "=== phase $name attempt $attempt exited rc=$? ===" >>"$LOG"
    sleep 10
  done
  check "$@" >>"$LOG"
}

drive_phase S \
  'single-semantic:1:20000,single-semantic:10:20000' \
  5 \
  single-semantic-l1:20000 single-semantic-l10:20000
rcS=$?

drive_phase FM \
  'shared4:0.1:50000:remat,single-depth_euclidean:0.1:50000,single-normal:0.1:50000,mixed:0.1:75000,single-rgb:0.1:75000,mixed:0.1:100000,single-rgb:0.1:100000,single-semantic:1:50000' \
  10 \
  shared4-l0.1:50000 single-depth_euclidean-l0.1:50000 \
  single-normal-l0.1:50000 mixed-l0.1:100000 single-rgb-l0.1:100000
rcFM=$?

echo "=== DRIVE DONE $(date -u +%FT%TZ) rcS=$rcS rcFM=$rcFM ===" >>"$LOG"
