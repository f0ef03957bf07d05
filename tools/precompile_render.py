"""Seed the persistent XLA compile cache with the full-extras render program.

Usage (from the repo root, same flags as eval.py):

  python tools/precompile_render.py --gin_configs=... [--gin_bindings=...]

Builds the exact jitted program `system.test()` / `system.render()` compile
(same model from the same gin config, same `render_chunk_size` ray avals,
same arg order and function name as models/renderer.py::make_render_fn) and
AOT-compiles it through the remote compile service from abstract
ShapeDtypeStructs only — no parameter values, no device execution. The
resulting persistent-cache entry turns the eval/render phase's first
compile into a cache hit.

Why it exists: the remote TPU compile service is the least reliable phase
of a run (a degraded service has been observed to take >15 min for a
program that otherwise compiles in ~30 s). Because compilation happens on
the service rather than the chip, this tool can run while the chip is busy
training — e.g. seed the eval program during the training phase of
tools/run_full_protocol.sh. The train/eval/render CLIs write to the same
cache (refnerf_tpu/system.py::_enable_persistent_compile_cache).
"""

import os
import sys

CACHE = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                       os.path.expanduser('~/.cache/refnerf_tpu/xla'))

import jax
import jax.numpy as jnp

os.makedirs(CACHE, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from absl import flags  # noqa: E402
from refnerf_tpu import configs as configs_lib  # noqa: E402
from refnerf_tpu.data import datasets as datasets_lib  # noqa: E402
from refnerf_tpu.models import construct as construct_lib  # noqa: E402


def main():
  configs_lib.define_common_flags()
  flags.FLAGS(sys.argv)
  config, gin = configs_lib.load_config(scope='eval', save_config=False)

  model = construct_lib.construct_model(config, gin)
  params_avals = jax.eval_shape(
      lambda k: construct_lib.init_params(k, model), jax.random.PRNGKey(0))

  print('loading test split for exact ray avals...', flush=True)
  val = datasets_lib.load_dataset('test', config.data_dir, config)
  batch = val.generate_ray_batch(0)
  h, w = batch.rays.origins.shape[:2]
  rays = batch.rays.reshape(h * w)
  chunk = config.render_chunk_size
  chunk_rays = jax.tree_util.tree_map(lambda x: x[:chunk], rays)
  rays_avals = jax.tree_util.tree_map(
      lambda x: jax.ShapeDtypeStruct(jnp.asarray(x).shape,
                                     jnp.asarray(x).dtype), chunk_rays)

  # Mirrors models/renderer.py::make_render_fn exactly (function name and
  # argument order are part of the lowered module, which keys the cache).
  def apply_fn(params, rays, train_frac):
    return model.apply({'params': params}, rays, train_frac=train_frac,
                       compute_extras=True, train=False)

  tf_aval = jax.ShapeDtypeStruct((), jnp.float32)
  print('lowering...', flush=True)
  lowered = jax.jit(apply_fn).lower(params_avals, rays_avals, tf_aval)
  print(f'compiling for {jax.devices()[0].platform}...', flush=True)
  import time
  t0 = time.time()
  lowered.compile()
  print(f'compiled + cached in {time.time() - t0:.1f}s '
        f'(cache: {CACHE})', flush=True)


if __name__ == '__main__':
  main()
