#!/usr/bin/env bash
# Round-4 mid-drive takeover: maximize matched-budget family COVERAGE.
#
# P1core died twice (tunnel hang rc=137, then backend-unavailable rc=1)
# after finishing only mixed-l0.1 (12k) + shared-l0.1 (8960); the original
# drive would next spend its wall on P1mono/P2 (second lambdas, 30k extend),
# leaving disjoint and every single-* with ZERO clevr-style steps — and the
# at-12k 4-way ranking (THE deliverable) needs those families more than it
# needs extra lambda points. This script replaces the outer drive:
#
#   1. wait for the in-flight P1sem (shared4 + single-semantic) to finish
#   2. one sweep process (one HBM upload) over the missing lambda-0.1
#      families in priority order: disjoint -> single-rgb -> single-depth
#      -> single-normal, 12k steps each, until T_STOP. The shared top-up
#      (8960 -> 12k) is deliberately NOT here: it already qualifies for the
#      watchdog's C1b straggler slot, and the ranking needs disjoint +
#      single-rgb more than it needs shared's last 3k steps
#
# The round4_finish.sh watchdog is left in charge of T_STOP, the stall
# guard keeps watching /tmp/round4_phase.pid, and interrupted families
# resume from checkpoints on retry.
set -u
cd "$(dirname "$0")/.."

echo $$ > /tmp/round4_drive2.pid
LOG=/tmp/round4_drive2.log
T_STOP=${T_STOP:-$(date -u -d "2026-08-18 00:15" +%s)}

{
CUR=$(cat /tmp/round4_phase.pid 2>/dev/null || true)
echo "=== [takeover] waiting for current phase pid=${CUR:-none} $(date -u +%H:%M:%S)"
while [ -n "$CUR" ] && kill -0 "$CUR" 2>/dev/null; do sleep 20; done

# The TPU backend has been flaky-unavailable since ~20:40 (attempt-1 SIGKILL
# likely left the terminal session claim held). A failed sweep launch burns
# ~13 min of prerender + ~25 min of backend-init hang; probe first so retry
# latency is minutes, not 40.
tpu_ok() {
  timeout 150 python -c "import jax; jax.devices(); print('tpu ok')" \
    >/dev/null 2>&1
}

fails=0
while :; do
  [ -f /tmp/round4_stop ] && break
  left=$(( T_STOP - $(date +%s) - 90 ))
  [ "$left" -lt 300 ] && { echo "=== [P1cov] no wall left"; break; }
  if ! tpu_ok; then
    echo "=== [P1cov] tpu probe dead, sleeping 240s $(date -u +%H:%M:%S)"
    sleep 240
    continue
  fi
  echo "=== [P1cov] launching (timeout ${left}s) $(date -u +%H:%M:%S)"
  timeout -k 60 "$left" python scripts/rd_paper_sweep.py \
    --out artifacts/rd_clevr.json --run-dir runs/rd_clevr --data-style clevr \
    --batch-size 64 --lr 1e-4 --steps-per-call 8 \
    --val-every-epochs 25 --checkpoint-every-epochs 20 \
    --steps 12000 --lmbdas 0.1 \
    --only disjoint,single-rgb,single-depth_euclidean,single-normal &
  echo $! > /tmp/round4_phase.pid
  wait $!
  rc=$?
  echo "=== [P1cov] attempt done rc=$rc $(date -u +%H:%M:%S)"
  if [ $rc -eq 0 ] || [ $rc -eq 124 ]; then break; fi
  fails=$(( fails + 1 ))
  [ "$fails" -ge 4 ] && { echo "=== [P1cov] giving up after $fails crashes"; break; }
done
echo "=== [takeover] done; watchdog owns the rest $(date -u +%H:%M:%S)"
} >> "$LOG" 2>&1
