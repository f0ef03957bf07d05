"""Eval-rendering throughput: full-extras image rendering rays/sec.

The reference's benchmark surface includes per-image render times
(render_times.txt / avg_metrics.txt; SURVEY §6). This measures the same
pipeline (render_image with compute_extras=True, chunked) on synthetic
frames and prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

RES = int(os.environ.get('BENCH_RENDER_RES', 128))
CHUNK = int(os.environ.get('BENCH_RENDER_CHUNK', 4096))
FRAMES = int(os.environ.get('BENCH_RENDER_FRAMES', 5))


def main():
  import jax
  import numpy as np
  jax.config.update('jax_compilation_cache_dir',
                    os.path.join(os.path.dirname(__file__), '..',
                                 '.jax_cache'))
  from refnerf_tpu import configs as configs_lib
  from refnerf_tpu.cameras import camera_utils
  from refnerf_tpu.models import construct, renderer

  config, gin = configs_lib.parse(
      [os.path.join(os.path.dirname(__file__), '..', 'configs',
                    'blender_refnerf.gin')],
      [f'Config.render_chunk_size = {CHUNK}',
       "NerfMLP.compute_dtype = 'bfloat16'"])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  render_fn = renderer.make_render_fn(model, params, train_frac=1.0,
                                      compute_extras=True)

  c2w = np.eye(4)[:3].astype(np.float32)
  c2w[2, 3] = 4.0
  rays = camera_utils.cast_pinhole_rays(c2w, RES, RES, RES * 1.2,
                                        config.near, config.far)

  # Warmup (compile).
  rendering = renderer.render_image(render_fn, rays, config)
  t0 = time.perf_counter()
  for _ in range(FRAMES):
    rendering = renderer.render_image(render_fn, rays, config)
  elapsed = time.perf_counter() - t0
  rays_per_sec = RES * RES * FRAMES / elapsed

  print(json.dumps({
      'metric': 'render_rays_per_sec',
      'value': round(rays_per_sec, 1),
      'unit': 'rays/s',
      'seconds_per_frame': round(elapsed / FRAMES, 4),
      'resolution': RES,
  }))


if __name__ == '__main__':
  main()
