"""Test config: force an 8-device virtual CPU platform BEFORE jax initializes.

This gives every test a deterministic multi-device environment (the
"multi-node without a cluster" capability), independent of whether a real TPU
is attached.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
# Numerical tests compare against float64 numpy oracles; keep CPU matmuls in
# float32 rather than the bf16-3pass default.
jax.config.update("jax_default_matmul_precision", "highest")
