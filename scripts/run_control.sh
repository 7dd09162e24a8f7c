#!/usr/bin/env bash
# Batch stage-2 training (the reference's scripts/run_control.sh): needs the
# per-scene stage-1 checkpoint dirs and gaussian_mask files in place.
# Usage: scripts/run_control.sh <data_root> <family: sim|real> <ckpt_root> [scenes...]
set -euo pipefail
DATA_ROOT=${1:?data root}
FAMILY=${2:?config family}
CKPT_ROOT=${3:?stage-1 checkpoint root}
shift 3
SCENES=("$@")
if [ ${#SCENES[@]} -eq 0 ]; then
  SCENES=($(ls "$DATA_ROOT"))
fi
for scene in "${SCENES[@]}"; do
  echo "=== cluster + stage-2: $scene ==="
  KF_ARGS=()
  if grep -q "^$scene:" configs/key_frames.yaml 2>/dev/null; then
    KF_ARGS=(--key-frames configs/key_frames.yaml --scene "$scene")
  fi
  python -m freegaussian_tpu.cli cluster \
    --config "configs/$FAMILY/base.yaml" --data "$DATA_ROOT/$scene" \
    --load "$CKPT_ROOT/$scene/checkpoints" "${KF_ARGS[@]}"
  python -m freegaussian_tpu.cli train-control \
    --config "configs/control/$FAMILY/base.yaml" --data "$DATA_ROOT/$scene" \
    --stage1-checkpoint "$CKPT_ROOT/$scene/checkpoints"
done
