"""Every shipped gin config runs one real train step (tiny sizes).

test_ginlite proves the files PARSE; this proves the bound flag
combinations actually construct and step - the class of bug where a legal
config crosses a model path nothing else exercises (e.g. n_dot_v normals
sourcing, consistency losses on a mipnerf model)."""

import glob
import os

import jax
import numpy as np
import pytest

from refnerf_tpu import configs as configs_lib
from refnerf_tpu.models import construct
from refnerf_tpu.train import step as step_lib
from tests.test_train_step import _setup  # noqa: F401 (env setup side effects)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CONFIGS = sorted(glob.glob(os.path.join(_REPO, 'configs', '*.gin')))

_TINY = """
Config.batch_size = 16
Config.max_steps = 100
Config.randomized = False
Config.sample_noise_size = 8
Config.patch_size = 1
Model.num_prop_samples = 4
Model.num_nerf_samples = 4
NerfMLP.net_depth = 2
NerfMLP.net_width = 8
NerfMLP.net_depth_viewdirs = 1
NerfMLP.net_width_viewdirs = 8
NerfMLP.bottleneck_width = 4
NerfMLP.max_deg_point = 3
NerfMLP.deg_view = 2
NerfMLP.basis_subdivisions = 1
PropMLP.net_depth = 2
PropMLP.net_width = 8
PropMLP.max_deg_point = 3
PropMLP.basis_subdivisions = 1
"""


@pytest.mark.parametrize('gin_file', _CONFIGS,
                         ids=[os.path.basename(p) for p in _CONFIGS])
def test_shipped_config_takes_a_train_step(gin_file):
  config, gin = configs_lib.parse([gin_file], [_TINY])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  state = step_lib.create_train_state(config, model, params)

  from refnerf_tpu.cameras import rays as rays_lib
  import jax.numpy as jnp
  b = config.batch_size
  rng = np.random.RandomState(0)
  d = rng.randn(b, 3).astype(np.float32)
  rays = rays_lib.dummy_rays(b).replace(
      origins=jnp.asarray(rng.randn(b, 3).astype(np.float32) * 0.1),
      directions=jnp.asarray(d),
      viewdirs=jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True)),
      radii=jnp.full((b, 1), 0.01),
      lossmult=jnp.ones((b, 1)),
      near=jnp.full((b, 1), float(config.near)),
      far=jnp.full((b, 1), float(config.far)))
  batch = rays_lib.Batch(
      rays=rays,
      rgb=jnp.asarray(rng.uniform(0, 1, (b, 3)).astype(np.float32)))

  train_step = jax.jit(step_lib.make_train_step(model, config))
  state, stats = train_step(state, batch)
  assert np.isfinite(float(stats['loss'])), os.path.basename(gin_file)
  assert int(state.step) == 1
