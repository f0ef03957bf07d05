#!/bin/bash
# Evaluate the newest Blender checkpoint (re-reads the saved config snapshot).
set -e
DATA_ROOT=${1:-/data/nerf_synthetic}
SCENE=${2:-lego}
SUFFIX=${3:-refnerf}
python eval.py \
  --gin_configs="exps/logs/${SCENE}/${SCENE}_${SUFFIX}/config.gin" \
  --gin_bindings="Config.data_dir = '${DATA_ROOT}/${SCENE}'"
