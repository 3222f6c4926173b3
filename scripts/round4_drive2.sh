#!/usr/bin/env bash
# Round-4 training driver v2 — full RD matrix on the CLEVR-statistics
# synthetic data (DESIGN.md "The PSNR plateau": the legacy stand-in was
# harder than CLEVR, capping every family ~21 dB; runs restart fresh on
# style=clevr under runs/rd_clevr).
#
#   P1  ALL families x lambda {0.1,0.01,0.001} -> 12k steps, batch 64
#       (mixed, shared, disjoint, 3 singles, shared4, single-semantic
#        = 24 runs; the budget-matched 4-way ranking input)
#   P2  mixed (3 lambdas) + single-rgb l0.1 -> 40k   (30 dB attempt)
#   P3  shared4 l0.1 -> 30k                          (flagship)
# then: full-val re-evals (latest, @12k), plots, flagship eval, solo perf.
#
# Progress: tail /tmp/round4_drive2.log. Stop: touch /tmp/round4_stop
# (skips remaining phases; evals still run).
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-artifacts/rd_clevr.json}
RUNS=${RUNS:-runs/rd_clevr}
LOG=${LOG:-/tmp/round4_drive2.log}

echo $$ > /tmp/round4_drive2.pid

phase() {  # phase <name> <timeout_s> <sweep args...>
  local name=$1 tmo=$2; shift 2
  if [ -f /tmp/round4_stop ]; then echo "[$name] SKIPPED (stop flag)"; return 0; fi
  for attempt in 1 2 3; do
    echo "=== [$name] attempt $attempt: $* (timeout ${tmo}s) $(date -u +%H:%M:%S)"
    timeout -k 60 "$tmo" python scripts/rd_paper_sweep.py \
      --out "$OUT" --run-dir "$RUNS" --data-style clevr \
      --batch-size 64 --lr 1e-4 --steps-per-call 4 \
      --val-every-epochs 25 --checkpoint-every-epochs 20 "$@" &
    echo $! > /tmp/round4_phase.pid
    wait $!
    rc=$?
    echo "=== [$name] attempt $attempt done rc=$rc $(date -u +%H:%M:%S)"
    [ $rc -eq 0 ] && return 0
    [ -f /tmp/round4_stop ] && return 0
  done
  return 1
}

{
  phase P1 23000 --steps 12000
  phase P2 12000 --only mixed --lmbdas 0.1,0.01,0.001 \
    --steps 40000 --extend --refresh
  phase P2b 4000 --only single-rgb --lmbdas 0.1 \
    --steps 40000 --extend --refresh
  phase P3 3600 --only shared4 --lmbdas 0.1 \
    --steps 30000 --extend --refresh
  echo "=== training phases done $(date -u +%H:%M:%S); running evals"
  timeout -k 60 7200 python scripts/rd_reeval.py --run-dir "$RUNS" \
    --data-style clevr --out artifacts/rd_clevr_eval.json
  timeout -k 60 7200 python scripts/rd_reeval.py --run-dir "$RUNS" \
    --data-style clevr --at-step 12000 \
    --out artifacts/rd_clevr_eval_at12k.json
  timeout -k 60 1800 python scripts/rd_roundup.py --run-dir "$RUNS" --data-style clevr \
    --in artifacts/rd_clevr_eval.json \
    --out-dir artifacts/rd_clevr_plots --min-steps 12000
  fl=$(ls -d "$RUNS"/shared4-l0.1/checkpoints/step_* 2>/dev/null \
       | sort -t_ -k2 -n | tail -1)
  if [ -n "${fl:-}" ]; then
    echo "=== flagship eval on $fl $(date -u +%H:%M:%S)"
    timeout -k 60 2400 python scripts/eval_flagship.py "$fl" \
      artifacts/flagship_eval.json
  fi
  echo "=== solo perf measurements $(date -u +%H:%M:%S)"
  timeout -k 60 1800 python scripts/profile_roundtrip.py --batch-size 512 \
    --out artifacts/profile_roundtrip.json || true
  timeout -k 60 1800 python scripts/measure_compress_breakdown.py || true
  echo "=== round4_drive2 COMPLETE $(date -u +%H:%M:%S)"
} >> "$LOG" 2>&1
