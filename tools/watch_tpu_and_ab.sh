#!/usr/bin/env bash
# Probe the TPU every ~7 min; the moment it answers, run the fused-feature
# A/B matrix unattended (tools/ab_fused_features.sh) and log to
# /tmp/ab_results.log. Background-friendly: survives long pool outages
# (90 tries ~ 18 h).
#
#   nohup tools/watch_tpu_and_ab.sh &     # or run under the session harness
#
# Round-3 context: the remote TPU pool was unreachable for two sessions
# (jax.devices() hung, then 'TPU backend setup/compile error'); this is the
# recovery automation from TODO.md's runbook step 1-2.
set -u
cd "$(dirname "$0")/.."

for i in $(seq 1 90); do
  if timeout 300 python -c "import jax; d=jax.devices(); import jax.numpy as jnp; x=jnp.ones((256,256)); assert float((x@x)[0,0])==256.0; print('TPU UP:', d)" > /tmp/tpu_watch_try.log 2>&1; then
    echo "TPU RECOVERED at $(date -u) after $i tries"
    tail -1 /tmp/tpu_watch_try.log
    echo "=== launching A/B queue $(date -u) ==="
    bash tools/ab_fused_features.sh 2>&1 | tee /tmp/ab_results.log
    echo "=== A/B queue done $(date -u) ==="
    exit 0
  fi
  echo "try $i failed at $(date -u)"
  sleep 420
done
echo "TPU never recovered"
exit 1
