import jax
import jax.numpy as jnp
import numpy as np

from refnerf_tpu import configs as configs_lib
from refnerf_tpu import metrics as metrics_lib
from refnerf_tpu import vis as vis_lib
from refnerf_tpu.cameras import rays as rays_lib
from refnerf_tpu.models import construct, renderer
from tests.test_model import _TINY_MODEL, _REFNERF_FLAGS


def _image_rays(h, w):
  rng = np.random.RandomState(0)
  n = h * w
  d = rng.randn(n, 3).astype(np.float32)
  v = d / np.linalg.norm(d, axis=-1, keepdims=True)
  r = rays_lib.dummy_rays(n).replace(
      origins=jnp.zeros((n, 3)),
      directions=jnp.asarray(d),
      viewdirs=jnp.asarray(v),
      radii=jnp.full((n, 1), 0.01),
      lossmult=jnp.ones((n, 1)),
      near=jnp.full((n, 1), 0.5),
      far=jnp.full((n, 1), 3.0))
  return r.reshape(h, w)


def test_render_image_shapes_and_chunking():
  config, gin = configs_lib.parse(
      None, [_TINY_MODEL + _REFNERF_FLAGS, 'Config.render_chunk_size = 32',
             'Config.vis_num_rays = 4'])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  render_fn = renderer.make_render_fn(model, params)
  rays = _image_rays(9, 7)  # 63 rays: not a multiple of the chunk size
  rendering = renderer.render_image(render_fn, rays, config)
  assert rendering['rgb'].shape == (9, 7, 3)
  assert rendering['acc'].shape == (9, 7)
  assert rendering['distance_mean'].shape == (9, 7)
  assert len(rendering['ray_sdist']) == 2  # one bundle per level
  assert rendering['ray_sdist'][0].shape[0] == 4
  for v in jax.tree_util.tree_leaves(rendering):
    assert np.all(np.isfinite(np.asarray(v)))


def test_render_image_deferred_fetch_matches_eager():
  """fetch=False returns a finish() closure whose output is bit-identical
  to the eager path (the eval/render loops run the closure on a pipeline
  worker thread, so also exercise it off-thread)."""
  import concurrent.futures

  config, gin = configs_lib.parse(
      None, [_TINY_MODEL + _REFNERF_FLAGS, 'Config.render_chunk_size = 32',
             'Config.vis_num_rays = 4'])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  render_fn = renderer.make_render_fn(model, params)
  rays = _image_rays(9, 7)
  eager = renderer.render_image(render_fn, rays, config)
  finish = renderer.render_image(render_fn, rays, config, fetch=False)
  assert callable(finish)
  with concurrent.futures.ThreadPoolExecutor(1) as pool:
    deferred = pool.submit(finish).result()
  assert set(eager) == set(deferred)
  for k in eager:
    a, b = eager[k], deferred[k]
    if isinstance(a, list):  # per-level ray bundles
      assert len(a) == len(b), k
      for i, (ai, bi) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(np.asarray(ai), np.asarray(bi),
                                      err_msg=f'{k}[{i}]')
    else:
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=k)


def test_render_image_chunks_agree_with_single_chunk():
  config, gin = configs_lib.parse(
      None, [_TINY_MODEL + _REFNERF_FLAGS, 'Config.render_chunk_size = 16'])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  render_fn = renderer.make_render_fn(model, params)
  rays = _image_rays(4, 8)
  small = renderer.render_image(render_fn, rays, config)
  config2, _ = configs_lib.parse(None, ['Config.render_chunk_size = 32'])
  big = renderer.render_image(render_fn, rays, config2)
  np.testing.assert_allclose(small['rgb'], big['rgb'], atol=1e-5)
  np.testing.assert_allclose(small['distance_mean'], big['distance_mean'],
                             atol=1e-5)


def test_metric_harness_basic():
  rng = np.random.RandomState(1)
  gt = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
  noisy = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1).astype(np.float32)
  harness = metrics_lib.MetricHarness()
  m_same = harness(gt, gt)
  m_noisy = harness(noisy, gt)
  assert m_same['psnr'] > 60
  assert np.isclose(m_same['ssim'], 1.0, atol=1e-4)
  assert m_noisy['psnr'] < m_same['psnr']
  assert m_noisy['ssim'] < 1.0
  assert 'lpips' not in m_noisy  # no weights available in this environment


def test_metric_harness_name_fn():
  harness = metrics_lib.MetricHarness()
  m = harness(np.zeros((16, 16, 3), np.float32),
              np.zeros((16, 16, 3), np.float32), name_fn=lambda s: f'cc_{s}')
  assert 'cc_psnr' in m and 'cc_ssim' in m


def test_vis_suite_panels():
  config, gin = configs_lib.parse(
      None, [_TINY_MODEL + _REFNERF_FLAGS, 'Config.render_chunk_size = 64',
             'Config.vis_num_rays = 4'])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  render_fn = renderer.make_render_fn(model, params)
  rays = _image_rays(8, 8)
  rendering = renderer.render_image(render_fn, rays, config)
  vis = vis_lib.visualize_suite(rendering, rays)
  for k in ['color', 'acc', 'color_matte', 'depth_mean', 'depth_median',
            'depth_triplet', 'coords_mod', 'ray_colors', 'ray_weights',
            'normals_pred', 'roughness', 'diffuse', 'specular', 'tint']:
    assert k in vis, k
    assert np.all(np.isfinite(np.asarray(vis[k]))), k


def test_sinebow_and_matte():
  h = np.linspace(0, 1, 16)
  c = vis_lib.sinebow(h)
  assert c.shape == (16, 3)
  assert np.all((c >= 0) & (c <= 1))
  img = np.ones((16, 16, 3), np.float32) * 0.5
  acc = np.zeros((16, 16), np.float32)
  matted = vis_lib.matte(img, acc)
  # Fully transparent -> pure checkerboard in {0.8, 1.0}.
  assert set(np.unique(np.round(matted, 3))) <= {0.8, 1.0}


def test_weighted_percentile_vis():
  x = np.array([1.0, 2.0, 3.0, 4.0])
  w = np.ones(4)
  p = vis_lib.weighted_percentile(x, w, [50])
  assert 2.0 <= p[0] <= 3.0


def test_make_render_fn_reuses_compiled_program():
  """Repeated make_render_fn calls (periodic validation) must reuse ONE
  jitted program - params/train_frac are traced arguments, not baked
  constants - and typed PRNG keys work for the vis-bundle seed."""
  config, gin = configs_lib.parse(
      None, [_TINY_MODEL + _REFNERF_FLAGS, 'Config.render_chunk_size = 32',
             'Config.vis_num_rays = 4'])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)

  renderer.clear_render_programs()
  fn1 = renderer.make_render_fn(model, params, train_frac=0.25)
  fn2 = renderer.make_render_fn(model, params, train_frac=0.75)
  # One entry for this (model, extras) pair, shared by both train_fracs,
  # regardless of what other tests left in the (bounded LRU) cache.
  assert len(renderer._RENDER_PROGRAMS) == 1
  assert (id(model), True) in renderer._RENDER_PROGRAMS

  rays = _image_rays(4, 8)
  out1 = renderer.render_image(fn1, rays, config,
                               rng=jax.random.key(3))  # typed key
  out2 = renderer.render_image(fn2, rays, config,
                               rng=jax.random.PRNGKey(3))  # raw key
  assert out1['rgb'].shape == out2['rgb'].shape == (4, 8, 3)
  _, jitted = renderer._RENDER_PROGRAMS[(id(model), True)]
  # Both train_fracs ran through the same executable (no retrace):
  assert jitted._cache_size() == 1
