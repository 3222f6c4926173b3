#!/usr/bin/env bash
# Round-3 training driver: spend the budget (VERDICT r2 #1-3, #6).
#
# Phased warm-restart extension of the paper-config RD sweep on the one
# real TPU chip, most-valuable-first so an early stop still leaves the
# highest-priority artifacts fresh:
#   P1  mixed + single-rgb      @ l={0.1,0.001}  -> STEPS_P1   (batch 128)
#   P2  shared + disjoint       @ l={0.1,0.001}  -> STEPS_P2   (batch 64)
#   P3  shared4 + single-sem    @ l={0.1,0.001}  -> STEPS_P3   (batch 64)
#   P4  the l=0.01 fill-ins     mixed/single-rgb -> STEPS_P4   (batch 128)
#   P5  the l=0.01 fill-ins     shared/disjoint  -> STEPS_P5   (batch 64)
# then full-val re-eval + plots + flagship eval.
#
# Each phase is wrapped in `timeout -k 60` (the tunneled TPU occasionally
# hangs; fit() saves a checkpoint on SIGTERM) and retried once — the sweep
# resumes from the latest checkpoint. Progress: tail /tmp/round3_drive.log
set -u
cd "$(dirname "$0")/.."

LR=${LR:-2e-4}
STEPS_P1=${STEPS_P1:-40000}
STEPS_P2=${STEPS_P2:-12000}
STEPS_P3=${STEPS_P3:-10000}
STEPS_P4=${STEPS_P4:-16000}
STEPS_P5=${STEPS_P5:-6000}
OUT=${OUT:-artifacts/rd_paper_ext.json}
LOG=${LOG:-/tmp/round3_drive.log}

echo $$ > /tmp/round3_drive.pid

phase() {  # phase <name> <timeout_s> <sweep args...>
  local name=$1 tmo=$2; shift 2
  if [ -f /tmp/round3_stop ]; then echo "[$name] SKIPPED (stop flag)"; return 0; fi
  for attempt in 1 2; do
    echo "=== [$name] attempt $attempt: $* (timeout ${tmo}s) $(date -u +%H:%M:%S)"
    timeout -k 60 "$tmo" python scripts/rd_paper_sweep.py \
      --out "$OUT" --lr "$LR" --extend --refresh "$@" &
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
  phase P1 18000 --only mixed,single-rgb --lmbdas 0.1,0.001 \
    --steps "$STEPS_P1" --batch-size 128 --steps-per-call 4 --lr 3e-4 \
    --val-every-epochs 25 --checkpoint-every-epochs 20
  phase P2 11000 --only shared,disjoint --lmbdas 0.1,0.001 \
    --steps "$STEPS_P2" --batch-size 64 \
    --val-every-epochs 10 --checkpoint-every-epochs 10
  phase P3 8000 --only shared4,single-semantic --lmbdas 0.1,0.001 \
    --steps "$STEPS_P3" --batch-size 64 \
    --val-every-epochs 10 --checkpoint-every-epochs 10
  phase P4 6000 --only mixed,single-rgb --lmbdas 0.01 \
    --steps "$STEPS_P4" --batch-size 128 --steps-per-call 4 --lr 3e-4 \
    --val-every-epochs 25 --checkpoint-every-epochs 20
  phase P5 6000 --only shared,disjoint --lmbdas 0.01 \
    --steps "$STEPS_P5" --batch-size 64 \
    --val-every-epochs 10 --checkpoint-every-epochs 10
  echo "=== training phases done $(date -u +%H:%M:%S); running evals"
  timeout -k 60 4000 python scripts/rd_reeval.py --out artifacts/rd_paper_eval.json
  timeout -k 60 1800 python scripts/rd_roundup.py --in artifacts/rd_paper_eval.json \
    --out-dir artifacts/rd_paper_ext_plots
  echo "=== round3_drive COMPLETE $(date -u +%H:%M:%S)"
} >> "$LOG" 2>&1
