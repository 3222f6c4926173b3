#!/usr/bin/env bash
# Round-3 training driver v2 (supersedes round3_drive.sh after the
# mixed-l0.001 SGDR-restart divergence): spend the budget (VERDICT r2
# #1-3, #6) with gradient clipping + the fit() divergence guard armed.
#
#   P1a mixed l0.001        FROM SCRATCH -> 40k (clean 40k cosine horizon;
#                           the warm restart at 3e-4 blew up the normal head)
#   P1b single-rgb l0.1/.001  extend 10k -> 40k   (batch 128, lr 3e-4)
#   P2  shared+disjoint l0.1/.001 extend 2.5k -> 12k (batch 64, lr 2e-4)
#   P3  shared4 + single-sem l0.1/.001 fresh -> 10k  (batch 64, lr 2e-4)
#   P4  mixed+single-rgb l0.01  extend -> 16k        (batch 128, lr 3e-4)
#   P5  shared+disjoint  l0.01  extend -> 6k         (batch 64, lr 2e-4)
# then full-val re-eval (latest + budget-matched @12k), plots, flagship eval.
#
# Each phase wrapped in `timeout -k 60` (tunneled TPU hangs occasionally;
# fit() checkpoints on SIGTERM) and retried once (resumes from the latest
# checkpoint). Progress: tail /tmp/round3_drive.log. Stop: touch
# /tmp/round3_stop (skips remaining phases, evals still run).
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-artifacts/rd_paper_ext.json}
LOG=${LOG:-/tmp/round3_drive.log}

echo $$ > /tmp/round3_drive.pid

phase() {  # phase <name> <timeout_s> <sweep args...>
  local name=$1 tmo=$2; shift 2
  if [ -f /tmp/round3_stop ]; then echo "[$name] SKIPPED (stop flag)"; return 0; fi
  for attempt in 1 2; do
    echo "=== [$name] attempt $attempt: $* (timeout ${tmo}s) $(date -u +%H:%M:%S)"
    timeout -k 60 "$tmo" python scripts/rd_paper_sweep.py \
      --out "$OUT" --extend --refresh "$@" &
    echo $! > /tmp/round3_phase.pid   # kill-able handle (timeout forwards TERM)
    wait $!
    rc=$?
    echo "=== [$name] attempt $attempt done rc=$rc $(date -u +%H:%M:%S)"
    [ $rc -eq 0 ] && return 0
    [ -f /tmp/round3_stop ] && return 0
  done
  return 1
}

{
  phase P1a 9000 --only mixed --lmbdas 0.001 \
    --steps 40000 --batch-size 128 --steps-per-call 4 --lr 2e-4 \
    --val-every-epochs 25 --checkpoint-every-epochs 20
  phase P1b 10000 --only single-rgb --lmbdas 0.1,0.001 \
    --steps 40000 --batch-size 128 --steps-per-call 4 --lr 3e-4 \
    --val-every-epochs 25 --checkpoint-every-epochs 20
  phase P2 12000 --only shared,disjoint --lmbdas 0.1,0.001 \
    --steps 12000 --batch-size 64 --lr 2e-4 \
    --val-every-epochs 10 --checkpoint-every-epochs 10
  phase P3 9000 --only shared4,single-semantic --lmbdas 0.1,0.001 \
    --steps 10000 --batch-size 64 --lr 2e-4 \
    --val-every-epochs 10 --checkpoint-every-epochs 10
  fl=$(ls -d runs/rd_paper/shared4-l0.1/checkpoints/step_* 2>/dev/null \
       | sort -t_ -k2 -n | tail -1)
  if [ -n "${fl:-}" ]; then
    echo "=== flagship eval on $fl $(date -u +%H:%M:%S)"
    timeout -k 60 2400 python scripts/eval_flagship.py "$fl" \
      artifacts/flagship_eval.json
  fi
  phase P4 7000 --only mixed,single-rgb --lmbdas 0.01 \
    --steps 16000 --batch-size 128 --steps-per-call 4 --lr 3e-4 \
    --val-every-epochs 25 --checkpoint-every-epochs 20
  phase P5 6000 --only shared,disjoint --lmbdas 0.01 \
    --steps 6000 --batch-size 64 --lr 2e-4 \
    --val-every-epochs 10 --checkpoint-every-epochs 10
  echo "=== training phases done $(date -u +%H:%M:%S); running evals"
  timeout -k 60 4000 python scripts/rd_reeval.py --out artifacts/rd_paper_eval.json
  timeout -k 60 4000 python scripts/rd_reeval.py --at-step 12000 \
    --out artifacts/rd_paper_eval_at12k.json
  timeout -k 60 1800 python scripts/rd_roundup.py --in artifacts/rd_paper_eval.json \
    --out-dir artifacts/rd_paper_ext_plots
  echo "=== round3_drive2 COMPLETE $(date -u +%H:%M:%S)"
} >> "$LOG" 2>&1
