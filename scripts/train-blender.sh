#!/bin/bash
# Train Ref-NeRF on a Blender-synthetic scene.
# Usage: ./scripts/train-blender.sh <data_root> <scene> <exp_suffix> [extra gin bindings...]
set -e
DATA_ROOT=${1:-/data/nerf_synthetic}
SCENE=${2:-lego}
SUFFIX=${3:-refnerf}
shift 3 || true
python train.py \
  --gin_configs=configs/blender_refnerf.gin \
  --gin_bindings="Config.data_dir = '${DATA_ROOT}/${SCENE}'" \
  --gin_bindings="Config.checkpoint_dir = 'exps'" \
  --gin_bindings="Config.exp_name = '${SCENE}_${SUFFIX}'" \
  "$@"
