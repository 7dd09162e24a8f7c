#!/usr/bin/env bash
# Batch depth/color rendering (the reference's scripts/run_render.sh).
# Usage: scripts/run_render.sh <data_root> <family> <ckpt_root> [scenes...]
set -euo pipefail
DATA_ROOT=${1:?data root}
FAMILY=${2:?config family}
CKPT_ROOT=${3:?checkpoint root}
shift 3
SCENES=("$@")
if [ ${#SCENES[@]} -eq 0 ]; then SCENES=($(ls "$DATA_ROOT")); fi
for scene in "${SCENES[@]}"; do
  python -m freegaussian_tpu.cli render \
    --config "configs/$FAMILY/base.yaml" --data "$DATA_ROOT/$scene" \
    --load "$CKPT_ROOT/$scene/checkpoints" --out "renders/$scene"
done
