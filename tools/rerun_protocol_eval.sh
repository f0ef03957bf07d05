#!/usr/bin/env bash
# Re-measure ONLY the eval+render phases of the published protocol against
# the round-3 25k checkpoint (train phase skipped - the checkpoint at
# /tmp/refnerf_bench is final). Purpose: quantify the round-3-session-3
# eval/render host pipeline (color_correct normal equations + overlapped
# post-processing) at 800x800 scale. Baseline on record (PROTOCOL_r03.json):
# eval 3,924 s, render 2,601 s.
#
#   tools/rerun_protocol_eval.sh   # writes PROTOCOL_EVAL_r03.json
set -u
cd "$(dirname "$0")/.."

EXP_ROOT="${EXP_ROOT:-/tmp/refnerf_bench/exp}"
SCENE="${SCENE:-/tmp/refnerf_bench/scene}"
RESULT="${RESULT:-PROTOCOL_EVAL_r03.json}"
EVAL_LIMIT="${EVAL_LIMIT:-200}"

if [ ! -d "$EXP_ROOT/ckpt/protocol/protocol/last" ]; then
  echo "no protocol checkpoint at $EXP_ROOT - run tools/run_full_protocol.sh"
  exit 1
fi

BINDINGS=(
  --gin_configs=configs/blender_refnerf.gin
  --gin_bindings="Config.data_dir = '$SCENE'"
  --gin_bindings="Config.checkpoint_dir = '$EXP_ROOT'"
  --gin_bindings="Config.exp_name = 'protocol'"
  --gin_bindings="Config.max_steps = 25000"
  --gin_bindings="Config.batch_size = 4096"
  --gin_bindings="Config.render_chunk_size = 8192"
  --gin_bindings="Config.eval_dataset_limit = $EVAL_LIMIT"
  --gin_bindings="NerfMLP.compute_dtype = 'bfloat16'"
)

echo "== eval ($EVAL_LIMIT views at 800x800) =="
t1=$(date +%s)
python eval.py "${BINDINGS[@]}" 2>&1 | tee "$EXP_ROOT.eval2.log"
t2=$(date +%s)

echo "== render (test path + videos) =="
python render.py "${BINDINGS[@]}" 2>&1 | tail -20
t3=$(date +%s)

python - "$EXP_ROOT" "$RESULT" "$((t2-t1))" "$((t3-t2))" <<'EOF'
import json, os, sys
exp_root, result, t_eval, t_render = sys.argv[1:5]
pred_dir = os.path.join(exp_root, 'ckpt', 'protocol', 'protocol',
                        'test_preds')
metrics = {}
with open(os.path.join(pred_dir, 'avg_metrics.txt')) as f:
    for line in f:
        k, _, v = line.strip().partition(': ')
        try:
            metrics[k] = float(v)
        except ValueError:
            metrics[k] = v
out = {
    'note': ('eval+render re-measurement of the round-3 25k checkpoint '
             'with the session-3 host pipeline (PROTOCOL_r03.json '
             'baselines: eval 3924 s, render 2601 s)'),
    'eval_seconds': int(t_eval),
    'render_seconds': int(t_render),
    'metrics': metrics,
}
with open(result, 'w') as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
EOF
