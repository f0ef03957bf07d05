#!/bin/bash
set -e
DATA_ROOT=${1:-/data/rffr}
SCENE=${2:-art1}
SUFFIX=${3:-geoloss}
python eval.py \
  --gin_configs="exps/logs/${SCENE}/${SCENE}_${SUFFIX}/config.gin" \
  --gin_bindings="Config.data_dir = '${DATA_ROOT}/${SCENE}'"
