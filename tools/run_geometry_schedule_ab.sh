#!/usr/bin/env bash
# Schedule-mitigation arms for the geometry-loss flagship (VERDICT r4 #2).
#
# Round 4 pinned the mechanism of the Lambertian-scene val decline: damage
# tracks the consistency warmup ramp (weight exposure), not optimizer
# instability (docs/DESIGN.md round-4 geometry section). This runner trains
# mitigation arms on the SAME deterministic scene + schedule as
# GEOMETRY_r04.json (whose geo_on 14.83 / geo_off 18.01 final-PSNR arms are
# therefore directly comparable) and evals each:
#
#   geo_soft    - every consistency/opacity mult x0.3: a lower ramp ceiling
#                 at unchanged shape (the "lower warmup ceiling" lever).
#   geo_decay06 - full mults but consistency_decay_steps 0.8 -> 0.6: the
#                 decay lever (ref semantics nerf_system.py:108-114 - ratio
#                 jumps to the decay envelope at decay_start and anneals to
#                 0 by max_steps). 0.6 is the earliest LEGAL start: the gin
#                 pins warmup 0.6 and step.py enforces decay >= warmup, so
#                 this minimizes late-training weight exposure.
#
# Env overrides: SCENE, EXP_ROOT, STEPS, BATCH, VIEWS, RESULT, LOGDIR, ARMS.
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SCENE="${SCENE:-/tmp/refnerf_geo/scene}"
EXP_ROOT="${EXP_ROOT:-/tmp/refnerf_geo/exp}"
STEPS="${STEPS:-20000}"
BATCH="${BATCH:-4096}"
VIEWS="${VIEWS:-6}"
RESULT="${RESULT:-$ROOT/GEOMETRY_SCHEDULE_r05.json}"
LOGDIR="${LOGDIR:-/tmp/refnerf_geo}"
ARMS="${ARMS:-geo_soft geo_decay06}"

cd "$ROOT"
mkdir -p "$LOGDIR"

if [ ! -f "$SCENE/poses_bounds.npy" ]; then
  echo "== generating forward-facing scene (24 views, 256^2, Lambertian) =="
  python - "$SCENE" <<'EOF'
import sys
from tools.make_sphere_llff_scene import make_scene
make_scene(sys.argv[1], n_images=24, res=256, specular=False)
print('scene ok')
EOF
fi

# Identical shared schedule to tools/run_geometry_ab.sh (GEOMETRY_r04.json).
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

arm_bindings() {
  case "$1" in
    geo_soft) cat <<'EOF'
Config.consistency_diffuse_loss_mult = 9e-6
Config.consistency_diffuse_coarse_loss_mult = 9e-7
Config.consistency_specular_loss_mult = 9e-6
Config.consistency_specular_coarse_loss_mult = 9e-7
Config.consistency_normal_loss_mult = 9e-6
Config.consistency_normal_coarse_loss_mult = 9e-7
Config.consistency_distance_loss_mult = 9e-7
Config.consistency_distance_coarse_loss_mult = 9e-8
Config.accumulated_weights_loss_mult = 9e-5
Config.weights_entropy_loss_mult = 9e-6
Config.weights_entropy_coarse_loss_mult = 9e-7
EOF
      ;;
    # The gin pins consistency_warmup_steps = 0.6 and train/step.py
    # enforces the reference's decay>=warmup constraint
    # (nerf_system.py:108-114 semantics) — 0.6 is the EARLIEST legal
    # decay start: weights anneal toward 0 immediately after warmup,
    # minimizing late-training exposure.
    geo_decay06) echo "Config.consistency_decay_steps = 0.6" ;;
    *) echo "unknown arm $1" >&2; exit 2 ;;
  esac
}

declare -A WALL
for arm in $ARMS; do
  if [ -f "$EXP_ROOT/ckpt/${arm%%_*}/$arm/test_preds/avg_metrics.txt" ]; then
    echo "== $arm already trained+evaled (avg_metrics.txt exists), skipping =="
    continue
  fi
  EXTRA=()
  while IFS= read -r b; do
    [ -n "$b" ] && EXTRA+=(--gin_bindings="$b")
  done < <(arm_bindings "$arm")
  echo "== train $arm ($STEPS steps, $VIEWS-view few-shot) =="
  t0=$(date +%s)
  python train.py "${COMMON[@]}" \
    --gin_bindings="Config.exp_name = '$arm'" "${EXTRA[@]}" \
    2>&1 | tee "$LOGDIR/train_$arm.log" | tail -5
  t1=$(date +%s)
  WALL[$arm]=$((t1 - t0))
  echo "== eval $arm (held-out views) =="
  python eval.py "${COMMON[@]}" \
    --gin_bindings="Config.exp_name = '$arm'" "${EXTRA[@]}" \
    2>&1 | tee "$LOGDIR/eval_$arm.log" | tail -5
done

python - "$EXP_ROOT" "$LOGDIR" "$RESULT" "$STEPS" "$VIEWS" $ARMS <<'EOF'
import json, os, re, sys
exp_root, logdir, result, steps, views = sys.argv[1:6]
arms = sys.argv[6:]

def arm_metrics(arm):
    pred = os.path.join(exp_root, 'ckpt', arm.split('_')[0], arm,
                        'test_preds')
    path = os.path.join(pred, 'avg_metrics.txt')
    if not os.path.exists(path):
        # A failed arm must not lose the completed arms' results.
        return {'failed': f'no avg_metrics.txt under {pred}'}
    out = {}
    with open(path) as f:
        for line in f:
            k, _, v = line.strip().partition(': ')
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = v
    return out

def val_trajectory(arm):
    """validation psnr prints from the train log - the val-decline signal."""
    traj = {}
    pat = re.compile(r'validation @ step (\d+): psnr=([\d.]+)')
    log = os.path.join(logdir, f'train_{arm}.log')
    if not os.path.exists(log):
        return {}
    with open(log) as f:
        for line in f:
            m = pat.search(line)
            if m:
                traj[int(m.group(1))] = float(m.group(2))
    return traj

out = {
    'protocol': (f'{views}-view few-shot, {steps} steps, same deterministic '
                 'Lambertian scene + schedule as GEOMETRY_r04.json '
                 '(geo_on 14.83 / geo_off 18.01 final held-out PSNR there); '
                 'mitigation arms per tools/run_geometry_schedule_ab.sh'),
    'baselines_from_GEOMETRY_r04': {'geo_on_psnr': 14.829,
                                    'geo_off_psnr': 18.009},
    'arms': {a: {'metrics': arm_metrics(a),
                 'val_trajectory': val_trajectory(a)} for a in arms},
}
with open(result, 'w') as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
EOF
