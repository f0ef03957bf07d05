#!/bin/bash
# Train Ref-NeRF with geometry losses on an RFFR (reflective forward-facing) scene.
set -e
DATA_ROOT=${1:-/data/rffr}
SCENE=${2:-art1}
SUFFIX=${3:-geoloss}
python train.py \
  --gin_configs=configs/llff_refnerf_geometry_losses.gin \
  --gin_bindings="Config.dataset_loader = 'rffr'" \
  --gin_bindings="Config.data_dir = '${DATA_ROOT}/${SCENE}'" \
  --gin_bindings="Config.checkpoint_dir = 'exps'" \
  --gin_bindings="Config.exp_name = '${SCENE}_${SUFFIX}'"
