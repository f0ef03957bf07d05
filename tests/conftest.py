"""Test config: force an 8-device virtual CPU platform BEFORE jax initializes.

This gives every test a deterministic multi-device environment (the
"multi-node without a cluster" capability), independent of whether a real TPU
is attached.
"""

import os

# Force-override: the host environment pins JAX_PLATFORMS to the TPU plugin;
# unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The host image's sitecustomize imports jax before this file runs, so the
# env var alone is not enough - force the platform through the live config.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA-CPU compiles dominate test wall-clock on
# small hosts; cache them across pytest invocations.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

jax.config.update("jax_threefry_partitionable", True)
# Numerical tests compare against float64 numpy oracles; keep CPU matmuls in
# float32 rather than the bf16-3pass default.
jax.config.update("jax_default_matmul_precision", "highest")
