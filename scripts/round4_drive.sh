#!/usr/bin/env bash
# Round-4 training driver (VERDICT r3 #1, #5, #6): uniform-budget
# extensions so budget-matched comparisons exist, plus the semantic
# family, then the full eval chain. Designed around this box's measured
# envelope: ~14.5 steps/s at batch 128 (256px), ~20 min dataset
# load per sweep process, occasional tunnel hangs (timeout+retry wrapper,
# fit() checkpoints on SIGTERM).
#
#   A  mixed l0.1/0.01/0.001      -> 60k   (uniform horizon; l0.001
#                                           resumes past its step-17.7k
#                                           NaN from the 17,280 ckpt)
#   B  shared+disjoint l0.1       -> 40k
#   C  single-depth,normal l0.1   -> 20k   (single-rgb already at 40k)
#   D1 shared4 l0.1               -> 20k   (flagship + semantic RD)
#   D2 shared4 l0.01 + single-semantic l0.1/0.01 -> 12k
# then: rd_reeval (latest), rd_reeval @12k and @40k, roundup plots,
# flagship eval, solo perf measurements LAST (needs an idle TPU).
#
# Progress: tail /tmp/round4_drive.log. Stop: touch /tmp/round4_stop
# (skips remaining phases; evals still run).
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-artifacts/rd_paper_ext.json}
LOG=${LOG:-/tmp/round4_drive.log}

echo $$ > /tmp/round4_drive.pid

phase() {  # phase <name> <timeout_s> <sweep args...>
  local name=$1 tmo=$2; shift 2
  if [ -f /tmp/round4_stop ]; then echo "[$name] SKIPPED (stop flag)"; return 0; fi
  for attempt in 1 2; do
    echo "=== [$name] attempt $attempt: $* (timeout ${tmo}s) $(date -u +%H:%M:%S)"
    timeout -k 60 "$tmo" python scripts/rd_paper_sweep.py \
      --out "$OUT" --extend --refresh "$@" &
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
  phase A 11000 --only mixed --lmbdas 0.1,0.01,0.001 \
    --steps 60000 --batch-size 128 --steps-per-call 4 --lr 1e-4 \
    --val-every-epochs 25 --checkpoint-every-epochs 20
  phase B 8000 --only shared,disjoint --lmbdas 0.1 \
    --steps 40000 --batch-size 128 --steps-per-call 4 --lr 2e-4 \
    --val-every-epochs 25 --checkpoint-every-epochs 20
  phase C 5000 --only single-depth_euclidean,single-normal --lmbdas 0.1 \
    --steps 20000 --batch-size 128 --steps-per-call 4 --lr 2e-4 \
    --val-every-epochs 25 --checkpoint-every-epochs 20
  phase D1 5000 --only shared4 --lmbdas 0.1 \
    --steps 20000 --batch-size 128 --steps-per-call 4 --lr 2e-4 \
    --val-every-epochs 25 --checkpoint-every-epochs 20
  phase D2 7000 --only shared4,single-semantic --lmbdas 0.01 \
    --steps 12000 --batch-size 128 --steps-per-call 4 --lr 2e-4 \
    --val-every-epochs 25 --checkpoint-every-epochs 20
  phase D3 4000 --only single-semantic --lmbdas 0.1 \
    --steps 12000 --batch-size 128 --steps-per-call 4 --lr 2e-4 \
    --val-every-epochs 25 --checkpoint-every-epochs 20
  echo "=== training phases done $(date -u +%H:%M:%S); running evals"
  timeout -k 60 5000 python scripts/rd_reeval.py --out artifacts/rd_paper_eval.json
  timeout -k 60 3600 python scripts/rd_reeval.py --at-step 12000 \
    --out artifacts/rd_paper_eval_at12k.json
  timeout -k 60 3600 python scripts/rd_reeval.py --at-step 40000 \
    --out artifacts/rd_paper_eval_at40k.json
  timeout -k 60 1800 python scripts/rd_roundup.py --in artifacts/rd_paper_eval.json \
    --out-dir artifacts/rd_paper_ext_plots --min-steps 12000
  fl=$(ls -d runs/rd_paper/shared4-l0.1/checkpoints/step_* 2>/dev/null \
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
  echo "=== round4_drive COMPLETE $(date -u +%H:%M:%S)"
} >> "$LOG" 2>&1
