"""Capture a jax.profiler trace of the flagship train step on the attached chip.

Reuses bench.py's setup (same config, same synthetic rays), wraps the measured
steps in jax.profiler.start_trace, then prints the per-category device-time
summary via tools/read_trace.py.

Usage:
  python tools/profile_step.py [outdir=/tmp/refnerf_trace] [steps=5]
Env: BENCH_BATCH / BENCH_MODE as for bench.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_SIZE = int(os.environ.get('BENCH_BATCH', 4096))
MODE = os.environ.get('BENCH_MODE', 'bf16')


def main():
  outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/refnerf_trace'
  steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

  import jax
  import jax.numpy as jnp
  os.makedirs('.jax_cache', exist_ok=True)
  jax.config.update('jax_compilation_cache_dir', '.jax_cache')

  from refnerf_tpu import configs as configs_lib
  from refnerf_tpu.cameras import rays as rays_lib
  from refnerf_tpu.models import construct
  from refnerf_tpu.train import step as step_lib

  config, gin = configs_lib.parse(
      [os.path.join(os.path.dirname(os.path.dirname(
          os.path.abspath(__file__))), 'configs', 'blender_refnerf.gin')],
      [f'Config.batch_size = {BATCH_SIZE}',
       'Config.randomized = False',
       'Config.sample_noise_size = 0'] +
      (["NerfMLP.compute_dtype = 'bfloat16'"] if MODE == 'bf16' else []))

  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  state = step_lib.create_train_state(config, model, params)

  rng = np.random.RandomState(0)
  d = rng.randn(BATCH_SIZE, 3).astype(np.float32)
  v = d / np.linalg.norm(d, axis=-1, keepdims=True)
  rays = rays_lib.dummy_rays(BATCH_SIZE).replace(
      origins=jnp.asarray(rng.randn(BATCH_SIZE, 3).astype(np.float32) * 0.1),
      directions=jnp.asarray(d),
      viewdirs=jnp.asarray(v),
      radii=jnp.full((BATCH_SIZE, 1), 0.001),
      lossmult=jnp.ones((BATCH_SIZE, 1)),
      near=jnp.full((BATCH_SIZE, 1), float(config.near)),
      far=jnp.full((BATCH_SIZE, 1), float(config.far)))
  batch = rays_lib.Batch(
      rays=rays,
      rgb=jnp.asarray(rng.uniform(0, 1, (BATCH_SIZE, 3)).astype(np.float32)))

  train_step = jax.jit(step_lib.make_train_step(model, config),
                       donate_argnums=(0,))

  for _ in range(3):
    state, stats = train_step(state, batch)
  float(stats['loss'])

  jax.profiler.start_trace(outdir)
  t0 = time.perf_counter()
  for _ in range(steps):
    state, stats = train_step(state, batch)
  final = float(stats['loss'])
  elapsed = time.perf_counter() - t0
  jax.profiler.stop_trace()
  print(f'{steps} steps in {elapsed:.3f} s = {elapsed / steps * 1e3:.1f} '
        f'ms/step ({BATCH_SIZE * steps / elapsed:.0f} rays/s), loss={final:.4f}')

  sys.argv = ['read_trace.py', outdir, str(steps)]
  import importlib
  rt = importlib.import_module('tools.read_trace')
  rt.summarize(outdir, steps=steps, top=40)


if __name__ == '__main__':
  main()
