#!/usr/bin/env bash
# Post-A/B perf-space sweep (round 4): with every fuse_* epilogue flag
# measured off, the remaining single-chip levers are the fused-trunk grid
# block and the ray batch. Sweeps NerfMLP.fused_block x BENCH_BATCH through
# bench.py on the real chip (one labeled JSON line per cell) so the default
# (512 @ 4096, mlp.py:_block) is either confirmed or replaced by data.
#
#   tools/sweep_perf_space.sh [BENCH_STEPS=50 ...]
set -u
export BENCH_TOTAL_TIMEOUT="${BENCH_TOTAL_TIMEOUT:-1500}"

run() {
  local label="$1"; shift
  local bindings="$1"; shift
  echo "== ${label}"
  BENCH_BINDINGS="${bindings}" timeout 1800 python bench.py \
    || echo "{\"metric\": \"${label}\", \"error\": \"run failed/timeout\"}"
}

# Block sweep at the flagship batch (4096). 512 is the shipped default.
for blk in 256 512 1024 2048; do
  run "block${blk}_b4096" "NerfMLP.fused_block = ${blk}"
done

# Batch sweep at the best default block: the r2 finding was MXU/VMEM-bound
# at 4096 with residue growth beyond; re-check with the round-4 step.
for b in 8192 16384; do
  echo "== block512_b${b}"
  BENCH_BATCH=${b} timeout 1800 python bench.py \
    || echo "{\"metric\": \"block512_b${b}\", \"error\": \"run failed/timeout\"}"
done

# Big-batch x big-block cross term.
echo "== block1024_b8192"
BENCH_BATCH=8192 BENCH_BINDINGS="NerfMLP.fused_block = 1024" \
  timeout 1800 python bench.py \
  || echo '{"metric": "block1024_b8192", "error": "run failed/timeout"}'
