#!/bin/bash
# Render the test cameras of a Blender scene from the newest checkpoint.
set -e
DATA_ROOT=${1:-/data/nerf_synthetic}
SCENE=${2:-lego}
SUFFIX=${3:-refnerf}
python render.py \
  --gin_configs="exps/logs/${SCENE}/${SCENE}_${SUFFIX}/config.gin" \
  --gin_bindings="Config.data_dir = '${DATA_ROOT}/${SCENE}'" \
  --gin_bindings="Config.render_path = False"
