#!/usr/bin/env bash
# End-of-round solo-TPU measurement batch (run ONLY when no training is
# active — concurrent TPU processes time-share and contaminate numbers).
# Each step is independently timeout-bounded; progress in /tmp/solo.log.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/solo.log}
{
  echo "=== solo measurements start $(date -u +%H:%M:%S)"
  echo "--- profile_roundtrip (lean pipeline stages + depth/batch matrix)"
  timeout -k 30 2400 python scripts/profile_roundtrip.py --batch-size 512 \
    --out artifacts/profile_roundtrip.json
  echo "--- compress breakdown (per-layer attribution)"
  timeout -k 30 2400 python scripts/measure_compress_breakdown.py
  echo "--- deconv+IGDN anomaly repro"
  timeout -k 30 1800 python scripts/measure_deconv_igdn.py
  echo "--- learned-baseline RD overlay (n=256)"
  timeout -k 30 2400 python - <<'EOF'
import glob, json, os, sys
sys.path.insert(0, ".")
from mmnc_tpu import analysis
ckpts = []
for run in sorted(glob.glob("runs/rd_paper/single-rgb-l*")):
    steps = sorted(glob.glob(os.path.join(run, "checkpoints", "step_*")),
                   key=lambda p: int(p.rsplit("_", 1)[1]))
    if steps:
        ckpts.append(steps[-1])
print("baseline checkpoints:", ckpts)
out = analysis.learned_baseline_rd(ckpts)
os.makedirs("artifacts", exist_ok=True)
with open("artifacts/learned_baseline_rd.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out, default=float)[:400])
EOF
  echo "--- bench"
  timeout -k 30 3000 python bench.py
  echo "=== solo measurements done $(date -u +%H:%M:%S)"
} >> "$LOG" 2>&1
