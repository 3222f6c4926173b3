#!/usr/bin/env bash
# Time the driver's multi-chip dryrun EXACTLY as the driver runs it
# (CPU-sim mesh, fresh process). Run this after ANY edit to
# __graft_entry__.py and before committing — round 3 shipped a 3-minute
# -old edit unvalidated and the official check timed out (rc=124).
#
#   scripts/check_multichip.sh [n_devices] [--cold]
#
# --cold wipes the persistent compile cache first to measure the
# worst-case (first-ever) compile the driver would pay.
set -eu
cd "$(dirname "$0")/.."
N=${1:-8}
if [ "${2:-}" = "--cold" ]; then
  rm -rf ~/.cache/jax_comp_cache
  echo "(cold: wiped ~/.cache/jax_comp_cache)"
fi
start=$(date +%s)
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=$N" \
  timeout 300 python -c "import __graft_entry__ as g; g.dryrun_multichip($N)"
rc=$?
echo "check_multichip: n=$N rc=$rc wall=$(( $(date +%s) - start ))s (driver budget ~240s; want <60s)"
exit $rc
