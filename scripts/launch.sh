#!/usr/bin/env bash
# Cluster launch wrapper (reference runai_launch.sh equivalent, SURVEY.md C3):
# every flag comes from an env var so schedulers can template one command.
# Unset vars fall back to sane defaults; RESUME=1 auto-resumes from the
# latest local checkpoint of the run (no W&B artifact dance needed).
set -euo pipefail

: "${DATASET:=synthetic}"
: "${TASKS:=rgb depth_euclidean}"
: "${MODEL:=2}"
: "${LATENT_CHANNELS:=300}"
: "${CONV_CHANNELS:=32}"
: "${RUN_NAME:=run-$(date +%s)}"
: "${LMBDA:=1e-2}"
: "${EPOCHS:=2200}"
: "${BATCH_SIZE:=64}"
: "${LR_MAIN:=1e-4}"
: "${LR_AUX:=1e-3}"
: "${DEVICES:=1}"
: "${OUT_DIR:=runs}"
: "${EXTRA_ARGS:=}"

RESUME_FLAG=""
if [[ "${RESUME:-0}" == "1" ]]; then
  RESUME_FLAG="--resume"
fi

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_comp_cache}"

exec python -u -m mmnc_tpu.cli.train \
  -d "$DATASET" \
  -t $TASKS \
  -m "$MODEL" \
  -l "$LATENT_CHANNELS" \
  -c "$CONV_CHANNELS" \
  -w "$RUN_NAME" \
  --lmbda "$LMBDA" \
  -e "$EPOCHS" \
  --batch-size "$BATCH_SIZE" \
  -lrm "$LR_MAIN" \
  -lra "$LR_AUX" \
  -g "$DEVICES" \
  --out-dir "$OUT_DIR" \
  $RESUME_FLAG $EXTRA_ARGS
