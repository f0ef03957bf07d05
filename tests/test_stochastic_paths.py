"""Stochastic training paths: stratified sampling (rng), single_jitter,
density/bottleneck noise - the capabilities the reference's port left inert."""

import jax
import jax.numpy as jnp
import numpy as np

from refnerf_tpu import configs as configs_lib
from refnerf_tpu.models import construct
from refnerf_tpu.ops import stepfun
from tests.test_model import _TINY_MODEL, _REFNERF_FLAGS, _build


def test_model_randomized_sampling_varies_with_key():
  model, params, rays = _build(_REFNERF_FLAGS)
  out = {}
  for seed in [0, 1]:
    renders, _ = model.apply(
        {'params': params}, rays, train_frac=0.5, compute_extras=False,
        train=True, rng=jax.random.PRNGKey(seed))
    out[seed] = np.asarray(renders[-1]['rgb'])
  assert not np.allclose(out[0], out[1])
  for v in out.values():
    assert np.all(np.isfinite(v))


def test_model_rng_none_is_deterministic_linspace():
  model, params, rays = _build(_REFNERF_FLAGS)
  a, _ = model.apply({'params': params}, rays, train_frac=0.5,
                     compute_extras=False, train=True, rng=None)
  b, _ = model.apply({'params': params}, rays, train_frac=0.5,
                     compute_extras=False, train=True, rng=None)
  np.testing.assert_array_equal(np.asarray(a[-1]['rgb']),
                                np.asarray(b[-1]['rgb']))


def test_single_jitter_shares_offset_per_ray():
  # Uniform bins + uniform weights: the CDF inverse is affine, so sample
  # spacing directly reflects the jitter structure.
  t = jnp.broadcast_to(jnp.linspace(0, 1, 9), (4, 9))
  logits = jnp.zeros((4, 8))
  key = jax.random.PRNGKey(0)
  # With single_jitter, all samples in a ray shift by the same CDF offset:
  # for uniform weights, adjacent-sample spacing is exactly constant.
  s = np.asarray(stepfun.sample(key, jnp.asarray(t), logits, 8,
                                single_jitter=True))
  spacing = np.diff(s, axis=-1)
  np.testing.assert_allclose(
      spacing, np.broadcast_to(spacing[:, :1], spacing.shape), atol=1e-5)
  # Independent jitter produces non-constant spacing.
  s2 = np.asarray(stepfun.sample(key, jnp.asarray(t), logits, 8,
                                 single_jitter=False))
  assert np.abs(np.diff(s2, axis=-1) - np.diff(s2, axis=-1)[:, :1]).max() > 1e-4


def test_density_and_bottleneck_noise():
  config, gin = configs_lib.parse(None, [
      _TINY_MODEL + _REFNERF_FLAGS,
      'NerfMLP.density_noise = 0.5',
      'NerfMLP.bottleneck_noise = 0.1'])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  _, _, rays = _build(_REFNERF_FLAGS)
  outs = []
  for seed in [0, 1]:
    renders, _ = model.apply(
        {'params': params}, rays, train_frac=0.5, compute_extras=False,
        train=True, rng=jax.random.PRNGKey(seed))
    outs.append(np.asarray(renders[-1]['rgb']))
  assert not np.allclose(outs[0], outs[1])
  # Eval mode (rng=None, train=False) ignores noise entirely: deterministic.
  renders_eval, _ = model.apply(
      {'params': params}, rays, train_frac=0.5, compute_extras=False,
      train=False, rng=None)
  renders_eval2, _ = model.apply(
      {'params': params}, rays, train_frac=0.5, compute_extras=False,
      train=False, rng=None)
  np.testing.assert_array_equal(np.asarray(renders_eval[-1]['rgb']),
                                np.asarray(renders_eval2[-1]['rgb']))


def test_blender_factor_downsampling(tmp_path):
  from refnerf_tpu.data import datasets
  from tests.test_data import _make_blender_scene, _blender_config
  root = str(tmp_path / 'scene')
  _make_blender_scene(root, n_frames=2, res=16, split='train')
  cfg = _blender_config(factor=2)
  ds = datasets.load_dataset('train', root, cfg)
  assert ds.images.shape[1:3] == (8, 8)
  assert ds.width == ds.height == 8
