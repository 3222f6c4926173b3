#!/bin/bash
# Round-5 phase C: runs after the main drive (scripts/round5_drive.sh)
# exits. Chain:
#   1. deconv-lowering A/B on the idle chip (measure_synthesize_ab) —
#      must run BEFORE more training so the chip is quiet;
#   2. extend the 4-task flagship shared4-l0.1 (remat, batch 64) — the
#      only core family the main drive leaves at 12k; its val log also
#      carries the semantic mIoU trajectory;
#   3. the idempotent close-out runbook (evals, figures, bench, gates).
#
# Usage: round5_phase_c.sh <drive-pid> [shared4-steps]
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/round5_phase_c.log}
DRIVE_PID=${1:?drive pid}
S4_STEPS=${2:-30000}

say() { echo "[phaseC $(date -u +%FT%TZ)] $*" >>"$LOG"; }

say "waiting for drive pid $DRIVE_PID"
while kill -0 "$DRIVE_PID" 2>/dev/null; do sleep 60; done
say "drive exited; settling 30s"
sleep 30

say "1/3 deconv lowering A/B (idle chip)"
timeout 2400 python -u scripts/measure_synthesize_ab.py >>"$LOG" 2>&1
say "A/B done rc=$?"

say "2/3 shared4-l0.1 -> ${S4_STEPS} (remat)"
for attempt in 1 2 3; do
  python - "$S4_STEPS" <<'EOF' && break
import json, sys
pts = {p["run"]: p for p in json.load(open("artifacts/rd_clevr.json"))}
p = pts.get("shared4-l0.1", {})
ok = int(p.get("steps") or 0) >= int(sys.argv[1]) and "rd_eval_error" not in p
sys.exit(0 if ok else 1)
EOF
  say "attempt $attempt"
  python scripts/rd_paper_sweep.py \
    --data-style clevr --run-dir runs/rd_clevr --out artifacts/rd_clevr.json \
    --refresh --extend --checkpoint-every-epochs 20 \
    --jobs "shared4:0.1:${S4_STEPS}:remat" >>"$LOG" 2>&1
  say "attempt $attempt exited rc=$?"
  sleep 10
done

say "3/3 close-out runbook"
bash scripts/round5_closeout.sh >>"$LOG" 2>&1
say "phase C done"
