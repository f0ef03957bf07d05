"""refnerf_tpu: a TPU-native JAX/Flax/Pallas rebuild of Ref-NeRF.

A ground-up reimplementation of the capabilities of minfenli/refnerf-pl
(mip-NeRF 360 sampling machinery + Ref-NeRF reflection-aware appearance +
geometry/consistency regularizers), designed TPU-first:

- All hot-path math is pure jnp, traced once under `jax.jit` into a single
  fused XLA program per train/render step (no eager op dispatch).
- Hierarchical resampling uses the brute-force masked-reduction formulation
  (VPU-friendly; no gathers on the hot path).
- Density-gradient normals are a nested `jax.grad` inside the differentiated
  train step (replacing torch double-backprop).
- Data parallelism is `jax.sharding` over a device Mesh with XLA collectives
  riding ICI; rays are embarrassingly parallel along the batch axis.

Layout:
  ops/       pure math: stepfun, coord, ref_utils, geopoly, image, mathx
  cameras/   Rays/Pixels pytrees + camera/ray generation (device-side casting)
  data/      dataset loaders (blender/llff/rffr/tat/dtu) + host->device pipeline
  models/    Flax MLP + mip-NeRF 360 / Ref-NeRF cascade + volume rendering
  train/     losses, schedules, the jitted+sharded train step, checkpointing
  parallel/  device mesh + sharding helpers
  utils/     IO, minimal gin-compatible config parsing
"""

__version__ = "0.1.0"

# Lazy top-level API: refnerf_tpu.NeRFSystem, .load_dataset, .Config, ...
_API = {
    'Config': ('refnerf_tpu.configs', 'Config'),
    'load_config': ('refnerf_tpu.configs', 'load_config'),
    'NeRFSystem': ('refnerf_tpu.system', 'NeRFSystem'),
    'load_dataset': ('refnerf_tpu.data.datasets', 'load_dataset'),
    'construct_model': ('refnerf_tpu.models.construct', 'construct_model'),
    'setup_model': ('refnerf_tpu.models.construct', 'setup_model'),
    'render_image': ('refnerf_tpu.models.renderer', 'render_image'),
    'MetricHarness': ('refnerf_tpu.metrics', 'MetricHarness'),
    'export_serving': ('refnerf_tpu.serving', 'export_serving'),
    'load_serving': ('refnerf_tpu.serving', 'load_serving'),
}


def __getattr__(name):
  if name in _API:
    import importlib
    module, attr = _API[name]
    return getattr(importlib.import_module(module), attr)
  raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
