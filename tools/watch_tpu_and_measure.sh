#!/usr/bin/env bash
# Probe the TPU every ~7 min; on recovery run the WHOLE measurement
# runbook unattended (TODO.md steps 2-7) and leave one log per stage in
# /tmp so any later session can pick up the numbers:
#   /tmp/ab_results.log      - fused-feature A/B matrix (bench.py per set)
#   /tmp/bench_plain.log     - plain bench.py with current defaults
#   /tmp/bench_fwd.log       - BENCH_FWD=1 serving bench
#   /tmp/bench_render.log    - tools/bench_render.py at 256^2 and 512^2
#   /tmp/quality_3k.log      - tools/quality_check.py --steps 3000
#
#   nohup tools/watch_tpu_and_measure.sh > /tmp/watch_tpu.log 2>&1 &
#
# Supersedes watch_tpu_and_ab.sh (kept for the A/B-only flow). Default
# flips after the A/B remain a human decision (TODO.md step 3).
set -u
cd "$(dirname "$0")/.."
# bench.py's internal watchdog must fire BEFORE the outer `timeout 1800`
# SIGTERMs it, so a degraded-compile run still leaves its error JSON.
export BENCH_TOTAL_TIMEOUT="${BENCH_TOTAL_TIMEOUT:-1500}"

for i in $(seq 1 90); do
  if timeout 300 python -c "import jax; d=jax.devices(); import jax.numpy as jnp; x=jnp.ones((256,256)); assert float((x@x)[0,0])==256.0; print('TPU UP:', d)" > /tmp/tpu_watch_try.log 2>&1; then
    echo "TPU RECOVERED at $(date -u) after $i tries"
    tail -1 /tmp/tpu_watch_try.log
    echo "=== A/B queue $(date -u) ==="
    bash tools/ab_fused_features.sh 2>&1 | tee /tmp/ab_results.log
    python tools/summarize_ab.py /tmp/ab_results.log || true
    echo "=== plain bench $(date -u) ==="
    timeout 1800 python bench.py 2>&1 | tee /tmp/bench_plain.log
    echo "=== serving bench $(date -u) ==="
    BENCH_FWD=1 timeout 1800 python bench.py 2>&1 | tee /tmp/bench_fwd.log
    echo "=== render bench $(date -u) ==="
    { BENCH_RENDER_RES=256 BENCH_RENDER_CHUNK=8192 \
        timeout 1800 python tools/bench_render.py
      BENCH_RENDER_RES=512 BENCH_RENDER_CHUNK=8192 \
        timeout 1800 python tools/bench_render.py
    } 2>&1 | tee /tmp/bench_render.log
    echo "=== quality check $(date -u) ==="
    timeout 3600 python tools/quality_check.py --steps 3000 2>&1 \
      | tee /tmp/quality_3k.log
    echo "=== protocol eval/render re-measure $(date -u) ==="
    timeout 14400 bash tools/rerun_protocol_eval.sh 2>&1 \
      | tee /tmp/protocol_eval2.log
    echo "=== measurement queue done $(date -u) ==="
    exit 0
  fi
  echo "try $i failed at $(date -u)"
  sleep 420
done
echo "TPU never recovered"
exit 1
