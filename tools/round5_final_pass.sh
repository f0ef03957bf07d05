#!/usr/bin/env bash
# Round-5 final chained TPU queue (VERDICT r4 #2/#4/#5/#7): everything
# left after the fresh-trace/lane-occupancy work, one command so the
# single chip never idles:
#   1. remaining fused_block x batch sweep cells on the HEAD layout
#      (block 512 at b8192/b16384; the block-1024/2048 cells stay
#      compile-window-blocked, recorded as such),
#   2. forward-only + render-path re-pins at HEAD,
#   3. the geometry-loss schedule-mitigation A/B (geo_soft, geo_decay04)
#      -> GEOMETRY_SCHEDULE_r05.json,
#   4. the full published protocol at HEAD -> PROTOCOL_r05.json
#      (validates the round-5 render-loop overlap end to end),
#   5. a final flagship bench.py pin.
# Logs: /tmp/r5_final/*.log.
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
cd "$ROOT"
OUT=/tmp/r5_final
mkdir -p "$OUT"
export BENCH_TOTAL_TIMEOUT="${BENCH_TOTAL_TIMEOUT:-1500}"

echo "== [1/5] sweep: block512 x {b8192, b16384} on the HEAD layout =="
for b in 8192 16384; do
  echo "== block512_b${b}"
  BENCH_BATCH=${b} timeout 1800 python bench.py 2>&1 \
    | tee "$OUT/sweep_b${b}.log" | tail -1 \
    || echo "{\"metric\": \"block512_b${b}\", \"error\": \"run failed/timeout\"}"
done

echo "== [2/5] forward-only + render re-pins =="
BENCH_FWD=1 timeout 1800 python bench.py 2>&1 \
  | tee "$OUT/bench_fwd.log" | tail -1
BENCH_RENDER_RES=256 BENCH_RENDER_CHUNK=8192 timeout 1800 \
  python tools/bench_render.py 2>&1 | tee "$OUT/render256.log" | tail -1
BENCH_RENDER_RES=512 BENCH_RENDER_CHUNK=8192 timeout 2400 \
  python tools/bench_render.py 2>&1 | tee "$OUT/render512.log" | tail -1

echo "== [3/5] geometry-loss schedule-mitigation A/B =="
bash tools/run_geometry_schedule_ab.sh 2>&1 \
  | tee "$OUT/schedule_ab.log" | grep -E "^==|psnr|PSNR" | tail -40

echo "== [4/5] full protocol at HEAD =="
RESULT="$ROOT/PROTOCOL_r05.json" bash tools/run_full_protocol.sh 2>&1 \
  | tee "$OUT/protocol.log" | grep -E "^==|psnr|ssim|seconds" | tail -40

echo "== [5/5] final flagship bench pin =="
timeout 1800 python bench.py 2>&1 | tee "$OUT/bench_final.log" | tail -1

echo "== round-5 final pass complete; logs in $OUT =="
