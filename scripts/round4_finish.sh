#!/usr/bin/env bash
# Round-4 close-out watchdog.
#
# The drive (round4_drive2.sh) front-loads training but its phase budgets
# (P1core 19000s + P1sem 7000 + P1mono 7000 + P2 2800 + evals) sum past the
# round snapshot — left alone, the evals (THE deliverable: the matched-budget
# 4-way ranking) would never run. This watchdog enforces a hard schedule:
#
#   T_STOP    stop all training (SIGTERM -> checkpoint save), take over
#   then      [semantic slot if shared4 undertrained] -> at-12k full-val
#             re-eval -> plots -> flagship eval -> solo perf artifacts
#   HARD_END  every TPU process dead (the round driver runs bench.py after
#             the snapshot; TPU access is exclusive per process)
#
# TPU-outage resilience (the tunnel died ~20:40 and may or may not return):
# every TPU-dependent step is gated on a 150s jax.devices() probe; the eval
# steps fall back to --platform cpu / MMNC_FORCE_PLATFORM=cpu so the
# matched-budget artifacts exist even if the tunnel never recovers.
#
# Each step is budget-guarded: it only starts if enough wall remains for the
# steps that outrank it. Progress: tail /tmp/round4_finish.log.
set -u
cd "$(dirname "$0")/.."

LOG=/tmp/round4_finish.log
T_STOP=${T_STOP:-$(date -u -d "2026-08-18 00:15" +%s)}
HARD_END=${HARD_END:-$(date -u -d "2026-08-18 02:10" +%s)}
RUNS=runs/rd_clevr

say() { echo "[$(date -u +%H:%M:%S)] $*"; }
left() { echo $(( HARD_END - $(date +%s) )); }

tpu_ok() {  # the axon plugin hangs backend init when the tunnel is down
  timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

last_step() {  # last_step <run-name> -> newest checkpoint step (0 if none)
  ls "$RUNS/$1/checkpoints" 2>/dev/null | sed -n 's/^step_//p' | sort -n | tail -1
}

# run_step <need_after> <timeout> <cmd...> — run cmd only if, after giving
# it <timeout>, at least <need_after> seconds remain for higher-priority
# later steps; always caps the timeout at the remaining wall.
run_step() {
  local need_after=$1 tmo=$2; shift 2
  local avail=$(( $(left) - need_after ))
  if [ "$avail" -le 120 ]; then say "SKIP (need ${need_after}s after): $*"; return 1; fi
  [ "$tmo" -gt "$avail" ] && tmo=$avail
  say "RUN (timeout ${tmo}s): $*"
  timeout -k 60 "$tmo" "$@" &
  echo $! > /tmp/round4_finish_child.pid   # stall guard watches this
  wait $!
  local rc=$?
  say "done rc=$rc: $1"
  return $rc
}

{
say "watchdog up: T_STOP=$(date -u -d @"$T_STOP" +%H:%M) HARD_END=$(date -u -d @"$HARD_END" +%H:%M)"

# ---- Phase A: wait for T_STOP ------------------------------------------
while [ "$(date +%s)" -lt "$T_STOP" ]; do sleep 30; done

# ---- Phase B: stop the drive cleanly -----------------------------------
touch /tmp/round4_stop
OUTER=$(cat /tmp/round4_drive2.pid 2>/dev/null || true)
PHASE=$(cat /tmp/round4_phase.pid 2>/dev/null || true)
if [ -n "$OUTER" ] && kill -0 "$OUTER" 2>/dev/null; then
  say "stopping drive (outer=$OUTER phase=${PHASE:-?})"
  kill "$OUTER" 2>/dev/null
  pkill -TERM -P "$OUTER" 2>/dev/null   # children of the outer script only
fi
# the phase may be orphaned from an earlier takeover swap — kill it by pid
# regardless of the outer's liveness
if [ -n "$PHASE" ] && kill -0 "$PHASE" 2>/dev/null; then
  kill "$PHASE" 2>/dev/null
  # SIGTERM -> train loop saves a checkpoint then SystemExit; give it time
  for _ in $(seq 48); do
    kill -0 "$PHASE" 2>/dev/null || break
    sleep 5
  done
  kill -0 "$PHASE" 2>/dev/null && kill -9 "$PHASE" 2>/dev/null
  sleep 15
fi
say "drive stopped; $(left)s of wall left"

# a second stall-guard instance watches the close-out's own child steps
# (tunnel hangs don't care which script launched the python)
nohup setsid bash scripts/stall_guard.sh "$LOG" \
  /tmp/round4_finish_child.pid > /tmp/stall_guard_finish.log 2>&1 &

# ---- Phase C: prioritized close-out ------------------------------------
SWEEP_COMMON="--out artifacts/rd_clevr.json --run-dir $RUNS --data-style clevr \
  --batch-size 64 --lr 1e-4 --steps-per-call 8 \
  --val-every-epochs 25 --checkpoint-every-epochs 20"

if tpu_ok; then TPU_LIVE=1; say "tpu probe: LIVE"; else TPU_LIVE=0; say "tpu probe: DEAD"; fi

# C1: semantic family must exist (VERDICT items 3/5/6). If the drive never
# reached P1sem, give shared4(+single-semantic) a bounded slot; if it
# started but is short of the flagship bar (>=10k), top it up.
if [ "$TPU_LIVE" = 1 ]; then
for attempt in 1 2; do   # retry once: a tunnel hang mid-slot resumes from ckpt
  S4=$(last_step "shared4-l0.1"); S4=${S4:-0}
  if [ "$S4" -eq 0 ]; then
    run_step 5400 2700 python scripts/rd_paper_sweep.py $SWEEP_COMMON \
      --only shared4,single-semantic --steps 12000 --lmbdas 0.1 && break
  elif [ "$S4" -lt 10240 ]; then
    run_step 5400 1800 python scripts/rd_paper_sweep.py $SWEEP_COMMON \
      --only shared4 --steps 12000 --lmbdas 0.1 && break
  else
    break
  fi
done

# C1b: top up P1core stragglers so they cross the --min-steps 11000 bar.
strag=""
for fam in mixed shared disjoint single-rgb single-depth_euclidean single-normal; do
  ls_step=$(last_step "$fam-l0.1"); ls_step=${ls_step:-0}
  # only families that can plausibly cross within the slot (2400s - ~900s
  # upload leaves ~8k steps at 5.5/s, shared among stragglers)
  [ "$ls_step" -ge 7000 ] && [ "$ls_step" -lt 11000 ] && strag="$strag,$fam"
done
strag=${strag#,}
if [ -n "$strag" ]; then
  run_step 5400 2400 python scripts/rd_paper_sweep.py $SWEEP_COMMON \
    --only "$strag" --steps 12000 --lmbdas 0.1
fi
else
  say "SKIP C1/C1b training slots: tpu dead"
fi

# C1c: second semantic lambda (VERDICT item 5 wants a semantic RD curve
# with >=2 lambda points; the drive only trains semantic at 0.1).
# single-semantic is the cheap family (~14 steps/s); need_after keeps the
# at-12k re-eval + plots + flagship + perf chain safe.
if [ "$TPU_LIVE" = 1 ]; then
  ss01=$(last_step "single-semantic-l0.01"); ss01=${ss01:-0}
  if [ "$ss01" -lt 11000 ]; then
    run_step 7000 2400 python scripts/rd_paper_sweep.py $SWEEP_COMMON \
      --only single-semantic --steps 12000 --lmbdas 0.01
  fi
fi

# C2: THE deliverable — budget-matched full-val re-eval at step 12000.
# rd_reeval writes incrementally per run, so a timeout keeps finished points.
if tpu_ok; then
  run_step 1500 4200 python scripts/rd_reeval.py --run-dir "$RUNS" \
    --data-style clevr --at-step 12000 \
    --out artifacts/rd_clevr_eval_at12k.json
else
  say "C2 on CPU fallback (tpu dead)"
  run_step 900 5400 python scripts/rd_reeval.py --run-dir "$RUNS" \
    --data-style clevr --at-step 12000 --platform cpu \
    --out artifacts/rd_clevr_eval_at12k.json
fi

# C3: plots + honest 4-way ranking (min-steps filter) — CPU, always runs
run_step 900 900 python scripts/rd_roundup.py --run-dir "$RUNS" \
  --data-style clevr --in artifacts/rd_clevr_eval_at12k.json \
  --out-dir artifacts/rd_clevr_plots --min-steps 11000

# C4: flagship eval on the newest shared4 checkpoint
fl=$(ls -d "$RUNS"/shared4-l0.1/checkpoints/step_* 2>/dev/null \
     | sort -t_ -k2 -n | tail -1)
if [ -n "${fl:-}" ]; then
  if tpu_ok; then
    run_step 600 1500 python scripts/eval_flagship.py "$fl" \
      artifacts/flagship_eval.json
  else
    say "C4 on CPU fallback (tpu dead)"
    run_step 600 1800 env MMNC_FORCE_PLATFORM=cpu \
      python scripts/eval_flagship.py "$fl" artifacts/flagship_eval.json
  fi
fi

# C5-C8: solo perf window (the box is finally quiet) — these produce the
# VERDICT item 7/9 artifacts and need the real chip; skip fast when dead
if tpu_ok; then
  run_step 2100 1200 python scripts/profile_roundtrip.py --batch-size 512 \
    --out artifacts/profile_roundtrip.json
  run_step 1500 900 python scripts/measure_compress_breakdown.py
  run_step 600 900 python scripts/deconv_anomaly_matrix.py
  run_step 120 900 python bench.py
else
  say "SKIP C5-C8 perf window: tpu dead"
fi

say "close-out COMPLETE with $(left)s to spare"
touch /tmp/round4_finish_done
} >> "$LOG" 2>&1
