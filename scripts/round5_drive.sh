#!/bin/bash
# Round-5 main training drive (VERDICT r4 tasks 1-3): one long-lived
# process per phase via rd_paper_sweep --jobs, relaunched until every
# target run reaches its step bar with a clean eval.
#
# Phase A (3-task HBM cache only):
#   - core lambda=0.1 separation: mixed/shared/disjoint/single-rgb -> 50k
#   - lambda grid fills at the 12k-matched tier: mixed+single-rgb 0.001,
#     shared+disjoint 0.01
# Phase B (semantic-only HBM cache, separate process to dodge the
# round-4 P1sem OOM co-residency):
#   - single-semantic 0.1 and 0.01 -> 30k (matched pair; mIoU needs steps)
#
# Retry on COMPLETION, not exit code: the sweep's per-job failure
# isolation exits 0 even when a tunnel blip killed half the schedule.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/round5_drive.log}

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
      --jobs "$jobs" >>"$LOG" 2>&1
    echo "=== phase $name attempt $attempt exited rc=$? ===" >>"$LOG"
    sleep 10
  done
  check "$@" >>"$LOG"
}

drive_phase A \
  'mixed:0.1:50000,shared:0.1:50000,disjoint:0.1:50000,single-rgb:0.1:50000,mixed:0.001:12000,single-rgb:0.001:12000,shared:0.01:12000,disjoint:0.01:12000' \
  8 \
  mixed-l0.1:50000 shared-l0.1:50000 disjoint-l0.1:50000 \
  single-rgb-l0.1:50000 mixed-l0.001:12000 single-rgb-l0.001:12000 \
  shared-l0.01:12000 disjoint-l0.01:12000
rcA=$?

drive_phase B \
  'single-semantic:0.1:30000,single-semantic:0.01:30000' \
  5 \
  single-semantic-l0.1:30000 single-semantic-l0.01:30000
rcB=$?

echo "=== DRIVE DONE $(date -u +%FT%TZ) rcA=$rcA rcB=$rcB ===" >>"$LOG"
exit $((rcA || rcB))
