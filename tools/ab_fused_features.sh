#!/usr/bin/env bash
# A/B the flag-gated kernel fusions on the real TPU, one bench.py run per
# feature set (BENCH_BINDINGS hook). Run from the repo root on a machine
# with the chip; first compiles are minutes, the .jax_cache makes reruns
# seconds. Prints one labeled JSON line per configuration.
#
#   tools/ab_fused_features.sh [extra bench env, e.g. BENCH_STEPS=50]
set -u
# Internal watchdog must beat the outer `timeout 1800` so failed runs
# still leave a parseable error JSON in the log.
export BENCH_TOTAL_TIMEOUT="${BENCH_TOTAL_TIMEOUT:-1500}"

run() {
  local label="$1"; shift
  local bindings="$1"; shift
  echo "== ${label}"
  BENCH_BINDINGS="${bindings}" timeout 1800 python bench.py \
    || echo "{\"metric\": \"${label}\", \"error\": \"run failed/timeout\"}"
}

ALL="NerfMLP.fuse_compositing = True; NerfMLP.fuse_dir_enc = True; NerfMLP.fuse_dir_geo = True; NerfMLP.fuse_dir_rgb = True; NerfMLP.fuse_lift = True"

# Headline first: if the chip/compile-service window turns out short, the
# all-fusions number is the one that matters most.
run baseline ""
run all "${ALL}"
run all_trig "${ALL}; NerfMLP.fuse_ipe_trig = True"
run compositing "NerfMLP.fuse_compositing = True"
run dir_enc "NerfMLP.fuse_dir_enc = True"
run dir_enc_geo "NerfMLP.fuse_dir_enc = True; NerfMLP.fuse_dir_geo = True"
run dir_rgb "NerfMLP.fuse_dir_rgb = True"
run lift "NerfMLP.fuse_lift = True"
run lift_trig "NerfMLP.fuse_lift = True; NerfMLP.fuse_ipe_trig = True"

echo "== all + serving (BENCH_FWD=1)"
BENCH_FWD=1 BENCH_BINDINGS="${ALL}" timeout 1800 python bench.py \
  || echo '{"metric": "all_fwd", "error": "run failed/timeout"}'
echo "== all + geometry losses"
BENCH_GIN=configs/llff_refnerf_geometry_losses.gin \
  BENCH_BINDINGS="${ALL}" timeout 1800 python bench.py \
  || echo '{"metric": "all_geometry", "error": "run failed/timeout"}'
