#!/bin/bash
set -e
DATA_ROOT=${1:-/data/nerf_llff_data}
SCENE=${2:-fern}
SUFFIX=${3:-refnerf}
python eval.py \
  --gin_configs="exps/logs/${SCENE}/${SCENE}_${SUFFIX}/config.gin" \
  --gin_bindings="Config.data_dir = '${DATA_ROOT}/${SCENE}'"
