#!/bin/bash
# Train mip-NeRF/Ref-NeRF on a forward-facing LLFF capture.
set -e
DATA_ROOT=${1:-/data/nerf_llff_data}
SCENE=${2:-fern}
SUFFIX=${3:-refnerf}
CONFIG=${CONFIG:-configs/llff_mipnerf.gin}
python train.py \
  --gin_configs="${CONFIG}" \
  --gin_bindings="Config.data_dir = '${DATA_ROOT}/${SCENE}'" \
  --gin_bindings="Config.checkpoint_dir = 'exps'" \
  --gin_bindings="Config.exp_name = '${SCENE}_${SUFFIX}'"
