#!/bin/bash
# Render the spiral path video for a forward-facing capture.
set -e
DATA_ROOT=${1:-/data/nerf_llff_data}
SCENE=${2:-fern}
SUFFIX=${3:-refnerf}
python render.py \
  --gin_configs="exps/logs/${SCENE}/${SCENE}_${SUFFIX}/config.gin" \
  --gin_bindings="Config.data_dir = '${DATA_ROOT}/${SCENE}'" \
  --gin_bindings="Config.render_path = True" \
  --gin_bindings="Config.render_path_frames = 120" \
  --gin_bindings="Config.render_video_fps = 30"
