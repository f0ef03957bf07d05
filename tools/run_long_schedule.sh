#!/usr/bin/env bash
# Compressed long-schedule hardening run (VERDICT r2 #3a): the flagship
# geometry-loss stack (llff_refnerf_geometry_losses.gin: noisy-view
# consistency, entropy/acc regularizers, norm_linear sRGB pipeline) for
# >= 50k steps with the 250k config's warmup window (0.6, a fraction of
# max_steps so it scales proportionally) plus a real consistency DECAY
# window (decay from 0.8 -> end; reference nerf_system.py:97-114), LR decay
# tail, and checkpoint/val cadence past 10k. Records the loss/val-PSNR
# trajectory to LONGRUN_r03.json; stability = finite losses and no val-PSNR
# collapse through the decay window.
#
# Env overrides: SCENE, EXP_ROOT, STEPS, BATCH, RESULT.
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SCENE="${SCENE:-/tmp/refnerf_long/scene}"
EXP_ROOT="${EXP_ROOT:-/tmp/refnerf_long/exp}"
STEPS="${STEPS:-50000}"
BATCH="${BATCH:-4096}"
RESULT="${RESULT:-$ROOT/LONGRUN_r03.json}"

cd "$ROOT"
mkdir -p /tmp/refnerf_long

if [ ! -f "$SCENE/poses_bounds.npy" ]; then
  echo "== generating forward-facing scene =="
  python - "$SCENE" <<'EOF'
import sys
from tools.make_sphere_llff_scene import make_scene
make_scene(sys.argv[1], n_images=16, res=128)
print('scene ok')
EOF
fi

BINDINGS=(
  --gin_configs=configs/llff_refnerf_geometry_losses.gin
  --gin_bindings="Config.data_dir = '$SCENE'"
  --gin_bindings="Config.checkpoint_dir = '$EXP_ROOT'"
  --gin_bindings="Config.exp_name = 'longrun'"
  --gin_bindings="Config.factor = 0"
  --gin_bindings="Config.max_steps = $STEPS"
  --gin_bindings="Config.checkpoint_every = 5000"
  --gin_bindings="Config.batch_size = $BATCH"
  --gin_bindings="Config.print_every = 1000"
  --gin_bindings="Config.val_sample_num = 1"
  --gin_bindings="Config.consistency_decay_steps = 0.8"
  --gin_bindings="NerfMLP.compute_dtype = 'bfloat16'"
)

t0=$(date +%s)
python train.py "${BINDINGS[@]}" 2>&1 | tee /tmp/refnerf_long/train.log
t1=$(date +%s)

python - "$RESULT" "$STEPS" "$BATCH" "$((t1-t0))" <<'EOF'
import json, re, sys
result, steps, batch, t_train = sys.argv[1:5]
losses, psnrs, vals = [], [], []
for line in open('/tmp/refnerf_long/train.log'):
    m = re.match(r'step (\d+)/\d+: loss=([\d.eE+-]+) psnr=([\d.eE+-]+)', line)
    if m:
        losses.append((int(m.group(1)), float(m.group(2))))
        psnrs.append((int(m.group(1)), float(m.group(3))))
    m = re.match(r'validation @ step (\d+): psnr=([\d.eE+-]+)', line)
    if m:
        vals.append((int(m.group(1)), float(m.group(2))))
out = {
    'steps': int(steps), 'batch_size': int(batch),
    'train_seconds': int(t_train),
    'train_rays_per_sec': round(int(steps)*int(batch)/max(1,int(t_train)), 1),
    'loss_trajectory': losses[::5],
    'train_psnr_trajectory': psnrs[::5],
    'val_psnrs': vals,
    'final_loss': losses[-1][1] if losses else None,
    'final_train_psnr': psnrs[-1][1] if psnrs else None,
    'consistency_schedule': {'warmup_frac': 0.6, 'decay_frac': 0.8},
}
with open(result, 'w') as f:
    json.dump(out, f, indent=1)
print(json.dumps({k: out[k] for k in
                  ('steps', 'train_seconds', 'final_loss',
                   'final_train_psnr', 'val_psnrs')}))
EOF
