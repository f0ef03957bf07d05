#!/usr/bin/env bash
# Eval-grade A/B for the geometry-loss flagship (VERDICT r3 #3): train
# llff_refnerf_geometry_losses.gin on the synthetic forward-facing scene in
# a FEW-SHOT regime (the setting the reference's losses target,
# reference README.md:50-62) against an identical schedule with every
# consistency/opacity regularizer off, then run the real eval.py on the
# held-out views for both arms. Writes GEOMETRY_r04.json with PSNR/SSIM
# per arm.
#
# Env overrides: SCENE, EXP_ROOT, STEPS, BATCH, VIEWS, RESULT, LOGDIR,
# SPECULAR (1 = glossy variant of the analytic scene).
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SCENE="${SCENE:-/tmp/refnerf_geo/scene}"
EXP_ROOT="${EXP_ROOT:-/tmp/refnerf_geo/exp}"
STEPS="${STEPS:-20000}"
BATCH="${BATCH:-4096}"
VIEWS="${VIEWS:-6}"
RESULT="${RESULT:-$ROOT/GEOMETRY_r04.json}"
LOGDIR="${LOGDIR:-/tmp/refnerf_geo}"

cd "$ROOT"
mkdir -p "$LOGDIR"

if [ ! -f "$SCENE/poses_bounds.npy" ]; then
  echo "== generating forward-facing scene (24 views, 256^2, specular=${SPECULAR:-0}) =="
  SPECULAR="${SPECULAR:-0}" python - "$SCENE" <<'EOF'
import os
import sys
from tools.make_sphere_llff_scene import make_scene
make_scene(sys.argv[1], n_images=24, res=256,
           specular=os.environ.get('SPECULAR', '0') == '1')
print('scene ok')
EOF
fi

# Shared schedule. Few-shot: 6 of the 21 train views (linspace), test on
# the 3 llffhold views.
COMMON=(
  --gin_configs=configs/llff_refnerf_geometry_losses.gin
  --gin_bindings="Config.data_dir = '$SCENE'"
  --gin_bindings="Config.checkpoint_dir = '$EXP_ROOT'"
  --gin_bindings="Config.factor = 0"
  --gin_bindings="Config.n_input_views = $VIEWS"
  --gin_bindings="Config.max_steps = $STEPS"
  --gin_bindings="Config.checkpoint_every = 5000"
  --gin_bindings="Config.batch_size = $BATCH"
  --gin_bindings="Config.print_every = 1000"
  --gin_bindings="Config.val_sample_num = 1"
  --gin_bindings="Config.consistency_decay_steps = 0.8"
  --gin_bindings="NerfMLP.compute_dtype = 'bfloat16'"
)
# TINY=1: shrink the model/render for a CPU smoke test of the pipeline.
if [ "${TINY:-0}" = 1 ]; then
  COMMON+=(
    --gin_bindings="Config.render_chunk_size = 1024"
    --gin_bindings="Config.eval_dataset_limit = 1"
    --gin_bindings="Config.sample_noise_size = 16"
    --gin_bindings="Model.num_prop_samples = 8"
    --gin_bindings="Model.num_nerf_samples = 8"
    --gin_bindings="NerfMLP.net_depth = 2"
    --gin_bindings="NerfMLP.net_width = 32"
    --gin_bindings="NerfMLP.net_depth_viewdirs = 1"
    --gin_bindings="NerfMLP.net_width_viewdirs = 32"
    --gin_bindings="NerfMLP.bottleneck_width = 16"
    --gin_bindings="NerfMLP.compute_dtype = 'float32'"
  )
fi
# The OFF arm: identical in every respect except the geometry/consistency
# regularizer family (and the noisy second forward that feeds it).
OFF=(
  --gin_bindings="Config.sample_noise_size = 0"
  --gin_bindings="Config.consistency_diffuse_loss_mult = 0."
  --gin_bindings="Config.consistency_diffuse_coarse_loss_mult = 0."
  --gin_bindings="Config.consistency_specular_loss_mult = 0."
  --gin_bindings="Config.consistency_specular_coarse_loss_mult = 0."
  --gin_bindings="Config.consistency_normal_loss_mult = 0."
  --gin_bindings="Config.consistency_normal_coarse_loss_mult = 0."
  --gin_bindings="Config.consistency_distance_loss_mult = 0."
  --gin_bindings="Config.consistency_distance_coarse_loss_mult = 0."
  --gin_bindings="Config.accumulated_weights_loss_mult = 0."
  --gin_bindings="Config.weights_entropy_loss_mult = 0."
  --gin_bindings="Config.weights_entropy_coarse_loss_mult = 0."
)

declare -A WALL
for arm in geo_on geo_off; do
  EXTRA=()
  if [ "$arm" = geo_off ]; then EXTRA=("${OFF[@]}"); fi
  echo "== train $arm ($STEPS steps, $VIEWS-view few-shot) =="
  t0=$(date +%s)
  python train.py "${COMMON[@]}" \
    --gin_bindings="Config.exp_name = '$arm'" "${EXTRA[@]}" \
    2>&1 | tee "$LOGDIR/train_$arm.log" | tail -5
  t1=$(date +%s)
  WALL[$arm.train]=$((t1 - t0))
  echo "== eval $arm (held-out views) =="
  python eval.py "${COMMON[@]}" \
    --gin_bindings="Config.exp_name = '$arm'" "${EXTRA[@]}" \
    2>&1 | tee "$LOGDIR/eval_$arm.log" | tail -5
  t2=$(date +%s)
  WALL[$arm.eval]=$((t2 - t1))
done

python - "$EXP_ROOT" "$RESULT" "$STEPS" "$VIEWS" \
    "${WALL[geo_on.train]}" "${WALL[geo_off.train]}" "${SPECULAR:-0}" <<'EOF'
import json, os, sys
exp_root, result, steps, views, t_on, t_off, specular = sys.argv[1:8]

def arm_metrics(arm):
    # Experiment layout: <ckpt>/ckpt/<exp-prefix>/<exp> (checkpoints.py:21).
    pred = os.path.join(exp_root, 'ckpt', arm.split('_')[0], arm,
                        'test_preds')
    out = {}
    with open(os.path.join(pred, 'avg_metrics.txt')) as f:
        for line in f:
            k, _, v = line.strip().partition(': ')
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
    return out

on, off = arm_metrics('geo_on'), arm_metrics('geo_off')
out = {
    'protocol': (f'{views}-view few-shot, {steps} steps, synthetic '
                 'forward-facing scene (24 views, 256^2, llffhold=8 test '
                 'split), llff_refnerf_geometry_losses.gin vs identical '
                 'schedule with all consistency/opacity regularizers off'),
    'specular_scene': specular == '1',
    'geo_on': on,
    'geo_off': off,
    'train_seconds': {'geo_on': int(t_on), 'geo_off': int(t_off)},
    'delta_psnr': round(on.get('psnr', 0) - off.get('psnr', 0), 3),
    'delta_ssim': round(on.get('ssim', 0) - off.get('ssim', 0), 4),
}
with open(result, 'w') as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
EOF
