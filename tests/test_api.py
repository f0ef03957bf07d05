"""Top-level API surface."""

import jax
import jax.numpy as jnp
import numpy as np

import refnerf_tpu
from tests.test_train_step import _TINY


def test_lazy_exports():
  assert refnerf_tpu.Config is not None
  assert refnerf_tpu.NeRFSystem is not None
  assert callable(refnerf_tpu.load_dataset)
  assert callable(refnerf_tpu.render_image)
  assert refnerf_tpu.MetricHarness is not None
  assert callable(refnerf_tpu.export_serving)
  assert callable(refnerf_tpu.load_serving)


def test_setup_model_trains():
  from refnerf_tpu import configs as configs_lib
  from refnerf_tpu.cameras import rays as rays_lib
  config, gin = configs_lib.parse(None, [_TINY])
  model, state, train_step, render_fn = refnerf_tpu.setup_model(config, gin)

  b = config.batch_size
  rng = np.random.RandomState(0)
  d = rng.randn(b, 3).astype(np.float32)
  rays = rays_lib.dummy_rays(b).replace(
      directions=jnp.asarray(d),
      viewdirs=jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True)),
      radii=jnp.full((b, 1), 0.01), lossmult=jnp.ones((b, 1)),
      near=jnp.full((b, 1), 0.5), far=jnp.full((b, 1), 3.0))
  batch = rays_lib.Batch(
      rays=rays, rgb=jnp.asarray(rng.uniform(0, 1, (b, 3)).astype(np.float32)))
  state, stats = train_step(state, batch)
  assert np.isfinite(float(stats['loss']))
  renderings, _ = render_fn(state.params, rays)
  assert renderings[-1]['rgb'].shape == (b, 3)
