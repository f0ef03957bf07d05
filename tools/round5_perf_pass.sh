#!/usr/bin/env bash
# Round-5 perf pass (VERDICT r4 #3/#4): on the post-relayout layout,
# (1) pin a fresh baseline, (2) capture a fresh trace and re-derive the
# copy/convert residue decomposition, (3) re-run the fused_block x batch
# sweep on the new layout, (4) re-pin forward-only and render paths.
# One command so the chip never idles.
#
# Output: /tmp/r5_perf/*.log + trace under /tmp/refnerf_trace_r5.
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
cd "$ROOT"
OUT=/tmp/r5_perf
mkdir -p "$OUT"
export BENCH_TOTAL_TIMEOUT="${BENCH_TOTAL_TIMEOUT:-1500}"

echo "== [1/6] fresh train-step baseline (batch 4096 bf16) =="
timeout 1800 python bench.py 2>&1 | tee "$OUT/bench_baseline.log" | tail -2

echo "== [2/6] profile trace (5 steps) =="
timeout 1800 python tools/profile_step.py /tmp/refnerf_trace_r5 5 \
  2>&1 | tee "$OUT/trace.log" | tail -40

echo "== [3/6] fused_block x batch sweep (post-relayout) =="
bash tools/sweep_perf_space.sh 2>&1 | tee "$OUT/sweep.log" | grep -E "^==|metric"

echo "== [4/6] forward-only step (BENCH_FWD=1) =="
BENCH_FWD=1 timeout 1800 python bench.py 2>&1 | tee "$OUT/bench_fwd.log" | tail -2

echo "== [5/6] render path 256^2 (re-pin) =="
BENCH_RENDER_RES=256 BENCH_RENDER_CHUNK=8192 timeout 1800 \
  python tools/bench_render.py 2>&1 | tee "$OUT/render256.log" | tail -2

echo "== [6/6] render path 512^2 (re-pin) =="
BENCH_RENDER_RES=512 BENCH_RENDER_CHUNK=8192 timeout 2400 \
  python tools/bench_render.py 2>&1 | tee "$OUT/render512.log" | tail -2

echo "== perf pass complete; logs in $OUT =="
