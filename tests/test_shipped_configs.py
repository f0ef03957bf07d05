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


def _random_flags(rng):
  """One random-but-valid flag combination over the model/loss space."""
  disable_dn = bool(rng.integers(2))
  pred_normals = bool(rng.integers(2))
  single_mlp = bool(rng.integers(2))
  has_normals = pred_normals or not disable_dn
  # Normals-consuming LOSSES run on EVERY cascade level; with two MLPs the
  # default PropMLP has no normals, so they are only valid under
  # single_mlp (matching the shipped configs). Model features (reflections,
  # n_dot_v) only need the NerfMLP's normals.
  normal_losses_ok = has_normals and single_mlp
  use_refl = bool(rng.integers(2)) and has_normals
  n_dot_v = bool(rng.integers(2)) and has_normals
  diffuse = bool(rng.integers(2))
  tint = bool(rng.integers(2)) and diffuse
  lines = [
      f'NerfMLP.disable_density_normals = {disable_dn}',
      f'NerfMLP.enable_pred_normals = {pred_normals}',
      f'NerfMLP.use_directional_enc = {bool(rng.integers(2))}',
      f'NerfMLP.use_reflections = {use_refl}',
      f'NerfMLP.enable_pred_roughness = {bool(rng.integers(2))}',
      f'NerfMLP.use_diffuse_color = {diffuse}',
      f'NerfMLP.use_specular_tint = {tint}',
      f'NerfMLP.use_n_dot_v = {n_dot_v}',
      f'Model.single_mlp = {single_mlp}',
      f'Model.single_jitter = {bool(rng.integers(2))}',
      f'Config.randomized = {bool(rng.integers(2))}',
      f"Config.data_loss_type = '{rng.choice(['mse', 'charb'])}'",
      f'Config.interlevel_loss_mult = {float(rng.choice([0.0, 1.0]))}',
      f'Config.distortion_loss_mult = {float(rng.choice([0.0, 0.01]))}',
      f'Config.weights_entropy_loss_mult = {float(rng.choice([0.0, 1e-3]))}',
      f'Config.accumulated_weights_loss_mult = '
      f'{float(rng.choice([0.0, 1e-3]))}',
      f"Config.srgb_mapping_type = "
      f"'{rng.choice(['none', 'linear', 'norm_linear'])}'",
  ]
  if normal_losses_ok:
    lines += [
        f'Config.orientation_loss_mult = {float(rng.choice([0.0, 0.1]))}',
        f"Config.orientation_loss_target = "
        f"'{'normals_pred' if pred_normals else 'normals'}'",
    ]
    if pred_normals and not disable_dn:
      lines.append(
          f'Config.predicted_normal_loss_mult = '
          f'{float(rng.choice([0.0, 3e-4]))}')
  if diffuse and bool(rng.integers(2)):
    # Consistency suite (valid for any model; normal term needs normals).
    lines += [
        'Config.sample_noise_size = 8',
        'Config.sample_noise_angles = 2',
        'Config.consistency_diffuse_loss_mult = 1e-4',
        "Config.consistency_diffuse_loss_type = 'var'",
    ]
    if normal_losses_ok and pred_normals and not disable_dn:
      lines.append('Config.consistency_normal_loss_mult = 1e-4')
  return '\n'.join(lines) + '\n'


@pytest.mark.parametrize('seed', range(12))
def test_random_flag_combination_takes_a_train_step(seed):
  """Deterministic fuzz over the model/loss flag space: every generated
  combination is legal per the documented constraints, so construction +
  one train step must succeed with a finite loss. (The review sweep found
  several cross-flag trace crashes; this walks the space continuously.)"""
  rng = np.random.default_rng(seed)
  flags = _random_flags(rng)
  config, gin = configs_lib.parse(None, [_TINY + flags])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  state = step_lib.create_train_state(config, model, params)

  from refnerf_tpu.cameras import rays as rays_lib
  import jax.numpy as jnp
  b = config.batch_size
  r = np.random.RandomState(0)
  d = r.randn(b, 3).astype(np.float32)
  rays = rays_lib.dummy_rays(b).replace(
      origins=jnp.asarray(r.randn(b, 3).astype(np.float32) * 0.1),
      directions=jnp.asarray(d),
      viewdirs=jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True)),
      radii=jnp.full((b, 1), 0.01),
      lossmult=jnp.ones((b, 1)),
      near=jnp.full((b, 1), 0.5),
      far=jnp.full((b, 1), 3.0))
  batch = rays_lib.Batch(
      rays=rays,
      rgb=jnp.asarray(r.uniform(0, 1, (b, 3)).astype(np.float32)))

  train_step = jax.jit(step_lib.make_train_step(model, config))
  state, stats = train_step(state, batch)
  assert np.isfinite(float(stats['loss'])), flags
