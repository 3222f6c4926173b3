#!/usr/bin/env bash
# Round-4 semantic recovery + close-out driver (replaces round4_drive2's
# tail after P1sem OOMed).
#
# What happened: P1sem (shared4 + single-semantic, batch 64, 4-task HBM
# dataset) hit TPU RESOURCE_EXHAUSTED for BOTH runs right after upload.
# Two fixes applied in scripts/rd_paper_sweep.py:
#   - the HBM-resident dataset now uploads only the tasks the selected
#     configs use (single-semantic no longer pays the 3-task arrays)
#   - shared4 retries at smaller batch (driven here, recorded in the point)
#
# Phases (each updates /tmp/round4_phase.pid so stall_guard + the
# round4_finish watchdog's T_STOP can SIGTERM -> checkpoint-save it):
#   S0  wait for the live P1mono sweep process to exit
#   S1  single-semantic @ lambda {0.1, 0.01} -> 12k  (semantic-only HBM)
#   S2  shared4 @ 0.1 -> 12k at batch 32; retry batch 16 if it OOMs again
#   S3  mixed-l0.1 warm-extend toward 30k with whatever wall remains
#   S4  budget-matched at-12k full-val re-eval (resume-aware)
# The 08:30 watchdog then redoes C2 (cached), plots, flagship, perf.
set -u
cd "$(dirname "$0")/.."

LOG=/tmp/round4_drive2.log          # same log: stall_guard watches it
OUT=artifacts/rd_clevr.json
RUNS=runs/rd_clevr
S3_CUTOFF=$(date -u -d "2026-08-18 07:40" +%s)
T_GUARD=$(date -u -d "2026-08-18 08:25" +%s)   # watchdog T_STOP is 08:30
echo $$ > /tmp/round4_drive2.pid    # so the watchdog's T_STOP kill gets us

SWEEP="python scripts/rd_paper_sweep.py --out $OUT --run-dir $RUNS
  --data-style clevr --lr 1e-4 --steps-per-call 8
  --val-every-epochs 25 --checkpoint-every-epochs 20"

say() { echo "=== [semfix] $* $(date -u +%H:%M:%S)"; }
last_step() {
  ls "$RUNS/$1/checkpoints" 2>/dev/null | sed -n 's/^step_//p' | sort -n | tail -1
}
guard_ok() {  # false once the watchdog's takeover window is imminent
  [ "$(date +%s)" -lt "$T_GUARD" ]
}
run_phase() {  # run_phase <timeout> <args...>
  local tmo=$1; shift
  guard_ok || { say "SKIP (past T_GUARD): $*"; return 125; }
  timeout -k 60 "$tmo" $SWEEP "$@" &
  echo $! > /tmp/round4_phase.pid
  wait $!
  return $?
}

{
say "up; waiting for current sweep (pid $(cat /tmp/round4_phase.pid 2>/dev/null || echo '?')) to exit"
PREV=$(cat /tmp/round4_phase.pid 2>/dev/null || true)
while [ -n "$PREV" ] && kill -0 "$PREV" 2>/dev/null; do sleep 20; done
sleep 10

say "S1: single-semantic lambdas 0.1,0.01 (semantic-only HBM dataset)"
run_phase 4200 --only single-semantic --lmbdas 0.1,0.01 \
  --steps 12000 --batch-size 64
say "S1 done rc=$? (steps: l0.1=$(last_step single-semantic-l0.1) l0.01=$(last_step single-semantic-l0.01))"

# batch 64 + remat keeps the sample budget comparable with every other
# family (remat is bit-identical to the plain step — test_train.py);
# smaller batches are the fallback ladder if HBM still doesn't fit
for cfg in "64 --remat" "32 --remat" "16"; do
  set -- $cfg; bs=$1; shift
  s4=$(last_step "shared4-l0.1"); s4=${s4:-0}
  if [ "$s4" -ge 11000 ]; then break; fi
  say "S2: shared4 lambda 0.1 at batch $bs $*"
  run_phase 5400 --only shared4 --lmbdas 0.1 --steps 12000 \
    --batch-size "$bs" "$@"
  say "S2(batch $bs $*) done rc=$?"
done
say "shared4 final step: $(last_step shared4-l0.1)"

left=$(( S3_CUTOFF - $(date +%s) ))
if [ "$left" -gt 1500 ]; then
  say "S3: mixed-l0.1 warm-extend toward 30k (budget ${left}s)"
  run_phase "$left" --only mixed --lmbdas 0.1 --steps 30000 \
    --batch-size 64 --extend --refresh
  say "S3 done rc=$? (mixed step: $(last_step mixed-l0.1))"
else
  say "S3 skipped (only ${left}s to cutoff)"
fi

if guard_ok; then
  say "S4: at-12k full-val re-eval"
  timeout -k 60 3600 python scripts/rd_reeval.py --run-dir "$RUNS" \
    --data-style clevr --at-step 12000 \
    --out artifacts/rd_clevr_eval_at12k.json &
  echo $! > /tmp/round4_phase.pid
  wait $!
  say "S4 done rc=$?"
else
  say "S4 left to the watchdog (past T_GUARD)"
fi
say "COMPLETE; watchdog takes it from T_STOP"
touch /tmp/round4_semfix_done
} >> "$LOG" 2>&1
