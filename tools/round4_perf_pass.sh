#!/usr/bin/env bash
# Round-4 post-A/B perf pass (VERDICT r3 #5): with every fuse_* default
# measured off, (1) pin a fresh round baseline, (2) capture a fresh profile
# trace and re-derive the step residue decomposition, (3) sweep the
# remaining levers (fused_block x batch), (4) re-validate the 512^2 render
# path and the forward-only step. One command so the chip never idles.
#
# Output: /tmp/r4_perf/*.log + trace under /tmp/refnerf_trace_r4.
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
cd "$ROOT"
OUT=/tmp/r4_perf
mkdir -p "$OUT"
export BENCH_TOTAL_TIMEOUT="${BENCH_TOTAL_TIMEOUT:-1500}"

echo "== [1/6] fresh train-step baseline (batch 4096 bf16) =="
timeout 1800 python bench.py 2>&1 | tee "$OUT/bench_baseline.log" | tail -2

echo "== [2/6] profile trace (5 steps) =="
timeout 1800 python tools/profile_step.py /tmp/refnerf_trace_r4 5 \
  2>&1 | tee "$OUT/trace.log" | tail -35

echo "== [3/6] fused_block x batch sweep =="
bash tools/sweep_perf_space.sh 2>&1 | tee "$OUT/sweep.log" | grep -E "^==|metric"

echo "== [4/6] forward-only step (BENCH_FWD=1) =="
BENCH_FWD=1 timeout 1800 python bench.py 2>&1 | tee "$OUT/bench_fwd.log" | tail -2

echo "== [5/6] render path 256^2 (re-pin) =="
BENCH_RENDER_RES=256 BENCH_RENDER_CHUNK=8192 timeout 1800 \
  python tools/bench_render.py 2>&1 | tee "$OUT/render256.log" | tail -2

echo "== [6/6] render path 512^2 (re-validate) =="
BENCH_RENDER_RES=512 BENCH_RENDER_CHUNK=8192 timeout 2400 \
  python tools/bench_render.py 2>&1 | tee "$OUT/render512.log" | tail -2

echo "== perf pass complete; logs in $OUT =="
