#!/usr/bin/env bash
# Batch stage-1 training over scenes (the reference's scripts/run.sh Slurm
# sweep, minus Slurm: run sequentially or under your own scheduler).
# Usage: scripts/run_all.sh <data_root> <family: sim|real|conerf|dnerf> [scenes...]
set -euo pipefail
DATA_ROOT=${1:?data root}
FAMILY=${2:?config family}
shift 2
SCENES=("$@")
if [ ${#SCENES[@]} -eq 0 ]; then
  SCENES=($(ls "$DATA_ROOT"))
fi
for scene in "${SCENES[@]}"; do
  scene_cfg="configs/$FAMILY/$scene.yaml"
  [ -f "$scene_cfg" ] || scene_cfg=""
  echo "=== stage-1: $scene ==="
  python -m freegaussian_tpu.cli train \
    --config "configs/$FAMILY/base.yaml" \
    ${scene_cfg:+--scene-config "$scene_cfg"} \
    --data "$DATA_ROOT/$scene"
done
