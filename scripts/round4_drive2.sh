#!/usr/bin/env bash
# Round-4 training driver v2 — RD matrix on the CLEVR-statistics synthetic
# data (DESIGN.md "The PSNR plateau": the legacy stand-in was harder than
# CLEVR, capping every family ~21 dB; runs restart fresh on style=clevr
# under runs/rd_clevr).
#
# Budget-aware phase plan (~9 h of round left at launch; ~5.5-7 steps/s at
# batch 64 on this box; each phase restart pays ~10 min of HBM cache upload):
#
#   P1core  the 4-family ranking input at matched budget: mixed, shared,
#           disjoint, 3x single @ lambda 0.1 -> 12k steps   (~72k steps)
#   P1sem   shared4 + single-semantic @ 0.1 -> 12k          (~24k steps)
#   P1mono  mixed + single-rgb @ lambda 0.01 -> 12k steps   (~24k steps)
#           (2 lambdas per family = the monotone-fraction input)
#   P2      mixed-l0.1 warm-extend -> 30k                   (30 dB attempt)
# then: full-val re-evals (@12k first — THE deliverable — then latest),
# plots, flagship eval (shared4-l0.1), solo perf.
#
# Progress: tail /tmp/round4_drive2.log. Stop: touch /tmp/round4_stop
# (skips remaining phases; evals still run). A phase timeout (rc=124) is
# treated as budget-spent and moves on — runs resume from checkpoints, so
# nothing is lost; only crashes (other rc) are retried.
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-artifacts/rd_clevr.json}
RUNS=${RUNS:-runs/rd_clevr}
LOG=${LOG:-/tmp/round4_drive2.log}

echo $$ > /tmp/round4_drive2.pid

phase() {  # phase <name> <timeout_s> <sweep args...>
  local name=$1 tmo=$2; shift 2
  if [ -f /tmp/round4_stop ]; then echo "[$name] SKIPPED (stop flag)"; return 0; fi
  for attempt in 1 2; do
    echo "=== [$name] attempt $attempt: $* (timeout ${tmo}s) $(date -u +%H:%M:%S)"
    timeout -k 60 "$tmo" python scripts/rd_paper_sweep.py \
      --out "$OUT" --run-dir "$RUNS" --data-style clevr \
      --batch-size 64 --lr 1e-4 --steps-per-call 8 \
      --val-every-epochs 25 --checkpoint-every-epochs 20 "$@" &
    echo $! > /tmp/round4_phase.pid
    wait $!
    rc=$?
    echo "=== [$name] attempt $attempt done rc=$rc $(date -u +%H:%M:%S)"
    [ $rc -eq 0 ] && return 0
    [ $rc -eq 124 ] && { echo "[$name] timeout — budget spent, moving on"; return 0; }
    [ -f /tmp/round4_stop ] && return 0
  done
  return 1
}

{
  phase P1core 19000 --steps 12000 --lmbdas 0.1 \
    --only mixed,shared,disjoint,single-rgb,single-depth_euclidean,single-normal
  phase P1sem 7000 --steps 12000 --lmbdas 0.1 --only shared4,single-semantic
  phase P1mono 7000 --steps 12000 --lmbdas 0.01 --only mixed,single-rgb
  phase P2 2800 --only mixed --lmbdas 0.1 --steps 30000 --extend --refresh
  echo "=== training phases done $(date -u +%H:%M:%S); running evals"
  timeout -k 60 5400 python scripts/rd_reeval.py --run-dir "$RUNS" \
    --data-style clevr --at-step 12000 \
    --out artifacts/rd_clevr_eval_at12k.json
  timeout -k 60 5400 python scripts/rd_reeval.py --run-dir "$RUNS" \
    --data-style clevr --out artifacts/rd_clevr_eval.json
  timeout -k 60 1800 python scripts/rd_roundup.py --run-dir "$RUNS" --data-style clevr \
    --in artifacts/rd_clevr_eval_at12k.json \
    --out-dir artifacts/rd_clevr_plots --min-steps 11000
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
