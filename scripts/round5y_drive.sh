#!/bin/bash
# Round-5 second-extension drive (fresh VM: runs/ and both compile caches
# were wiped; committed artifacts survive). One phase, staged so a
# deadline cut always leaves budget-matched, eval'd points:
#
# Phase S (semantic-only HBM cache — cheap load):
#   single-semantic at lambda 1 and 10 -> 12k first (matched with the
#   committed l0.01@12k / l0.1 12k-era tier), then both -> 20k.
#   DESIGN.md's rate-starvation diagnosis says the latent empties at
#   lambda<=0.1 because semantic CE is mean-over-pixels (~5 orders below
#   the summed-over-HW MSE tasks); these runs measure the lambda response
#   (bpp up, mIoU off the 0.0599 floor) instead of just asserting it.
#
# Retry on COMPLETION, not exit code (sweep's per-job isolation exits 0
# on partial failure). Current python child pid -> /tmp/r5y_phase.pid.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r5y_drive.log}
PHASE_PIDF=/tmp/r5y_phase.pid

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
  for i in $(seq 1 10); do
    timeout 120 python -c "import jax; jax.numpy.zeros(1).block_until_ready()" \
      >/dev/null 2>&1 && return 0
    echo "[drive] TPU probe failed ($i/10), sleeping 60s" >>"$LOG"
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
  'single-semantic:1:12000,single-semantic:10:12000,single-semantic:1:20000,single-semantic:10:20000' \
  5 \
  single-semantic-l1:20000 single-semantic-l10:20000
rcS=$?

echo "=== DRIVE DONE $(date -u +%FT%TZ) rcS=$rcS ===" >>"$LOG"
