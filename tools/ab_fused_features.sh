#!/usr/bin/env bash
# A/B the flag-gated kernel fusions on the real TPU, one bench.py run per
# feature set (BENCH_BINDINGS hook). Run from the repo root on a machine
# with the chip; first compiles are minutes, the .jax_cache makes reruns
# seconds. Prints one labeled JSON line per configuration.
#
#   tools/ab_fused_features.sh [extra bench env, e.g. BENCH_STEPS=50]
set -u

run() {
  local label="$1"; shift
  local bindings="$1"; shift
  echo "== ${label}"
  BENCH_BINDINGS="${bindings}" timeout 1800 python bench.py \
    || echo "{\"metric\": \"${label}\", \"error\": \"run failed/timeout\"}"
}

run baseline ""
run compositing "NerfMLP.fuse_compositing = True"
run dir_enc "NerfMLP.fuse_dir_enc = True"
run dir_rgb "NerfMLP.fuse_dir_rgb = True"
run dir_both "NerfMLP.fuse_dir_enc = True; NerfMLP.fuse_dir_rgb = True"
run all "NerfMLP.fuse_compositing = True; NerfMLP.fuse_dir_enc = True; NerfMLP.fuse_dir_rgb = True"
