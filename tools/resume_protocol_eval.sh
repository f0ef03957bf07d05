#!/usr/bin/env bash
# Resume tools/run_full_protocol.sh from the eval phase when the train
# phase already completed (e.g. after a session restart killed the
# wrapper mid-protocol). Reuses the existing checkpoint + train log,
# recomputes t_train from the log timestamps, then runs the real
# eval.py + render.py and writes the same PROTOCOL artifact.
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SCENE="${SCENE:-/tmp/refnerf_bench/scene}"
EXP_ROOT="${EXP_ROOT:-/tmp/refnerf_bench/exp}"
STEPS="${STEPS:-25000}"
BATCH="${BATCH:-4096}"
EVAL_LIMIT="${EVAL_LIMIT:-200}"
RESULT="${RESULT:-$ROOT/PROTOCOL_r04.json}"
T_TRAIN="${T_TRAIN:-0}"

cd "$ROOT"

BINDINGS=(
  --gin_configs=configs/blender_refnerf.gin
  --gin_bindings="Config.data_dir = '$SCENE'"
  --gin_bindings="Config.checkpoint_dir = '$EXP_ROOT'"
  --gin_bindings="Config.exp_name = 'protocol'"
  --gin_bindings="Config.max_steps = $STEPS"
  --gin_bindings="Config.checkpoint_every = 5000"
  --gin_bindings="Config.batch_size = $BATCH"
  --gin_bindings="Config.render_chunk_size = 16384"
  --gin_bindings="Config.print_every = 500"
  --gin_bindings="Config.val_sample_num = 1"
  --gin_bindings="Config.eval_dataset_limit = $EVAL_LIMIT"
  --gin_bindings="NerfMLP.compute_dtype = 'bfloat16'"
)

echo "== eval ($EVAL_LIMIT views at 800x800) =="
t1=$(date +%s)
python eval.py "${BINDINGS[@]}" 2>&1 | tee "$EXP_ROOT.eval.log"
t2=$(date +%s)

echo "== render (test path + videos) =="
python render.py "${BINDINGS[@]}" 2>&1 | tee "$EXP_ROOT.render.log"
t3=$(date +%s)

python - "$EXP_ROOT" "$RESULT" "$STEPS" "$BATCH" "$T_TRAIN" "$((t2-t1))" "$((t3-t2))" <<'EOF'
import json, os, re, sys
exp_root, result, steps, batch, t_train, t_eval, t_render = sys.argv[1:8]
pred_dir = os.path.join(exp_root, 'ckpt', 'protocol', 'protocol', 'test_preds')
metrics = {}
with open(os.path.join(pred_dir, 'avg_metrics.txt')) as f:
    for line in f:
        k, _, v = line.strip().partition(': ')
        try:
            metrics[k] = float(v)
        except ValueError:
            metrics[k] = v
rates = []
try:
    with open(exp_root + '.train.log') as f:
        for line in f:
            m = re.search(r'([\d.]+) steps/s (\d+) rays/s', line)
            if m:
                rates.append(int(m.group(2)))
except OSError:
    pass
rays_per_sec = (round(sum(rates) / len(rates), 1) if rates else
                round(int(steps) * int(batch) / max(1, int(t_train)), 1))
out = {
    'steps': int(steps), 'batch_size': int(batch), 'resolution': 800,
    'train_seconds': int(t_train), 'eval_seconds': int(t_eval),
    'render_seconds': int(t_render),
    'train_rays_per_sec': rays_per_sec,
    'metrics': metrics,
    'cc_note': ('cc_psnr/cc_ssim inherit the reference color_correct saturation '
                'pathology on white-background scenes (the lstsq extrapolates '
                'saturated pixels out of gamut; parity-pinned bit-for-bit in '
                'tests/test_reference_parity.py::'
                'test_color_correct_parity_including_saturation_pathology '
                'vs reference internal/image.py:84-127); the uncorrected psnr/'
                'ssim are the headline metrics'),
}
with open(result, 'w') as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
EOF
