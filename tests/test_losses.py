import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refnerf_tpu import configs as configs_lib
from refnerf_tpu.cameras import rays as rays_lib
from refnerf_tpu.train import losses, sampling


def _config(**kw):
  c = configs_lib.Config()
  for k, v in kw.items():
    setattr(c, k, v)
  return c


def _fake_level(rng, b, s, with_normals=True):
  w = rng.uniform(0, 1, size=(b, s)).astype(np.float32)
  w = w / w.sum(-1, keepdims=True) * 0.95
  sdist = np.sort(rng.uniform(0, 1, size=(b, s + 1)), -1).astype(np.float32)
  sdist[:, 0], sdist[:, -1] = 0, 1
  h = {'weights': jnp.asarray(w), 'sdist': jnp.asarray(sdist)}
  if with_normals:
    n = rng.randn(b, s, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    npred = rng.randn(b, s, 3).astype(np.float32)
    npred /= np.linalg.norm(npred, axis=-1, keepdims=True)
    h['normals'] = jnp.asarray(n)
    h['normals_pred'] = jnp.asarray(npred)
  return h


def _fake_rendering(rng, b):
  return {
      'rgb': jnp.asarray(rng.uniform(0, 1, (b, 3)).astype(np.float32)),
      'diffuse': jnp.asarray(rng.uniform(0, 1, (b, 3)).astype(np.float32)),
      'specular': jnp.asarray(rng.uniform(0, 1, (b, 3)).astype(np.float32)),
      'acc': jnp.asarray(rng.uniform(0, 1, (b,)).astype(np.float32)),
      'distance': jnp.asarray(
          rng.uniform(1, 5, (b, 1)).astype(np.float32)),
      'normals': jnp.asarray(rng.randn(b, 3).astype(np.float32)),
      'normals_pred': jnp.asarray(rng.randn(b, 3).astype(np.float32)),
  }


def _rays(b):
  r = rays_lib.dummy_rays(b)
  return r.replace(lossmult=jnp.ones((b, 1)),
                   viewdirs=jnp.broadcast_to(jnp.array([0., 0., 1.]), (b, 3)))


def test_data_loss_zero_for_perfect_prediction():
  rng = np.random.RandomState(0)
  b = 16
  gt = rng.uniform(0, 1, (b, 3)).astype(np.float32)
  batch = rays_lib.Batch(rays=_rays(b), rgb=jnp.asarray(gt))
  rendering = {'rgb': jnp.asarray(gt)}
  cfg = _config(data_loss_type='mse', data_coarse_loss_mult=0.1)
  loss, stats = losses.compute_data_loss(batch, [rendering], batch.rays, cfg)
  assert float(loss) < 1e-10
  np.testing.assert_allclose(np.asarray(stats['mses']), 0, atol=1e-10)


def test_data_loss_mse_value():
  b = 8
  gt = np.zeros((b, 3), np.float32)
  pred = np.full((b, 3), 0.5, np.float32)
  batch = rays_lib.Batch(rays=_rays(b), rgb=jnp.asarray(gt))
  cfg = _config(data_loss_type='mse', data_loss_mult=1.0,
                data_coarse_loss_mult=0.1)
  # Two levels: coarse contributes 0.1x, fine 1x.
  loss, stats = losses.compute_data_loss(
      batch, [{'rgb': jnp.asarray(pred)}, {'rgb': jnp.asarray(pred)}],
      batch.rays, cfg)
  np.testing.assert_allclose(float(loss), 1.1 * 0.25, rtol=1e-5)
  assert stats['mses'].shape == (2,)


def test_data_loss_charb_approximates_l1():
  b = 8
  gt = np.zeros((b, 3), np.float32)
  pred = np.full((b, 3), 0.5, np.float32)
  batch = rays_lib.Batch(rays=_rays(b), rgb=jnp.asarray(gt))
  cfg = _config(data_loss_type='charb', charb_padding=1e-6,
                data_coarse_loss_mult=0.0)
  loss, _ = losses.compute_data_loss(
      batch, [{'rgb': jnp.asarray(pred)}], batch.rays, cfg)
  np.testing.assert_allclose(float(loss), 0.5, rtol=1e-4)


def test_interlevel_loss_zero_when_prop_dominates():
  rng = np.random.RandomState(1)
  nerf = _fake_level(rng, 4, 8, with_normals=False)
  prop = dict(nerf)
  prop['weights'] = nerf['weights'] * 0 + 1.0  # envelope dominates everywhere
  cfg = _config(interlevel_loss_mult=1.0)
  loss = losses.interlevel_loss([prop, nerf], cfg)
  np.testing.assert_allclose(float(loss), 0.0, atol=1e-7)


def test_interlevel_loss_positive_when_prop_misses():
  rng = np.random.RandomState(2)
  nerf = _fake_level(rng, 4, 8, with_normals=False)
  prop = dict(nerf)
  prop['weights'] = jnp.zeros_like(nerf['weights'])
  cfg = _config(interlevel_loss_mult=1.0)
  loss = losses.interlevel_loss([prop, nerf], cfg)
  assert float(loss) > 0.0


def test_orientation_loss_penalizes_backfacing():
  b, s = 4, 8
  w = jnp.ones((b, s))
  viewdirs = jnp.broadcast_to(jnp.array([0., 0., 1.]), (b, 3))
  rays = _rays(b).replace(viewdirs=viewdirs)
  # Normals pointing away from the camera (same dir as viewdirs).
  n_back = jnp.broadcast_to(jnp.array([0., 0., 1.]), (b, s, 3))
  n_front = -n_back
  cfg = _config(orientation_loss_mult=1.0, orientation_coarse_loss_mult=0.0,
                orientation_loss_target='normals_pred')
  h_back = [{'weights': w, 'normals_pred': n_back}]
  h_front = [{'weights': w, 'normals_pred': n_front}]
  assert float(losses.orientation_loss(rays, 1, h_back, cfg)) > 0.9 * s
  np.testing.assert_allclose(
      float(losses.orientation_loss(rays, 1, h_front, cfg)), 0.0, atol=1e-7)


def test_predicted_normal_loss_zero_when_aligned():
  rng = np.random.RandomState(3)
  h = _fake_level(rng, 4, 8)
  h['normals_pred'] = h['normals']
  cfg = _config(predicted_normal_loss_mult=1.0)
  loss = losses.predicted_normal_loss(1, [h], cfg)
  np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)
  h2 = dict(h)
  h2['normals_pred'] = -h['normals']
  loss2 = losses.predicted_normal_loss(1, [h2], cfg)
  assert float(loss2) > 0


def test_accumulated_weights_loss():
  cfg = _config(accumulated_weights_loss_mult=2.0)
  r = {'acc': jnp.full((8,), 0.5)}
  loss = losses.accumulated_weights_loss([r], cfg)
  np.testing.assert_allclose(float(loss), 2.0 * 0.25, rtol=1e-6)


def test_weights_entropy_loss_prefers_peaked():
  cfg = _config(weights_entropy_loss_mult=1.0,
                acc_threshold_for_weights_entropy_loss=0.0)
  b, s = 4, 8
  peaked = np.zeros((b, s), np.float32)
  peaked[:, 3] = 1.0
  uniform = np.full((b, s), 1 / s, np.float32)
  r = {'acc': jnp.ones((b,))}
  l_peaked = losses.weights_entropy_loss(
      1, [r], [{'weights': jnp.asarray(peaked)}], cfg, 1.0)
  l_uniform = losses.weights_entropy_loss(
      1, [r], [{'weights': jnp.asarray(uniform)}], cfg, 1.0)
  assert float(l_uniform) > float(l_peaked)
  np.testing.assert_allclose(float(l_peaked), 0.0, atol=1e-5)


def test_weights_entropy_loss_respects_mask():
  cfg = _config(weights_entropy_loss_mult=1.0,
                acc_threshold_for_weights_entropy_loss=0.5)
  b, s = 4, 8
  uniform = jnp.full((b, s), 1 / s)
  # All rays below threshold -> masked mean over empty set -> 0.
  r = {'acc': jnp.full((b,), 0.1)}
  loss = losses.weights_entropy_loss(
      1, [r], [{'weights': uniform}], cfg, 1.0)
  np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_noisy_consistency_loss_zero_for_identical_renderings():
  rng = np.random.RandomState(4)
  b, angles = 16, 2
  cfg = _config(sample_noise_size=b, sample_noise_angles=angles,
                patch_size=1,
                consistency_diffuse_loss_type='mse',
                consistency_diffuse_loss_mult=1.0,
                consistency_specular_loss_mult=0.0,
                consistency_normal_loss_mult=1.0,
                consistency_normal_loss_target='normals',
                acc_threshold_for_consistency_loss=0.0)
  r = _fake_rendering(rng, b)
  # Unit-normalize normals so 1 - n.n == 0.
  for k in ['normals', 'normals_pred']:
    r[k] = r[k] / jnp.linalg.norm(r[k], axis=-1, keepdims=True)
  # Noise renderings identical to the originals, sample-major layout.
  r_noise = {k: jnp.repeat(v, angles, axis=0) for k, v in r.items()}
  d, s, n = losses.noisy_consistency_loss(1, [r], [r_noise], cfg, 1.0)
  np.testing.assert_allclose(float(d), 0.0, atol=1e-6)
  np.testing.assert_allclose(float(n), 0.0, atol=1e-5)


def test_noisy_consistency_var_type_and_negated_specular():
  rng = np.random.RandomState(5)
  b, angles = 8, 3
  cfg = _config(sample_noise_size=b, sample_noise_angles=angles, patch_size=1,
                consistency_diffuse_loss_type='var',
                consistency_diffuse_loss_mult=1.0,
                consistency_specular_loss_type='var',
                consistency_specular_loss_mult=1.0,
                consistency_normal_loss_mult=0.0,
                consistency_normal_loss_target='normals',
                acc_threshold_for_consistency_loss=0.0)
  r = _fake_rendering(rng, b)
  r_noise = {k: jnp.asarray(
      rng.uniform(0, 1, (b * angles,) + tuple(np.shape(v)[1:])).astype(
          np.float32)) for k, v in r.items()}
  d, s, n = losses.noisy_consistency_loss(1, [r], [r_noise], cfg, 1.0)
  assert float(d) > 0      # diffuse should be consistent -> positive penalty
  assert float(s) < 0      # specular is encouraged to vary -> negative term


def test_noisy_distance_consistency_zero_for_same_point():
  rng = np.random.RandomState(6)
  b, angles = 8, 2
  cfg = _config(sample_noise_size=b, sample_noise_angles=angles, patch_size=1,
                consistency_distance_loss_mult=1.0,
                acc_threshold_for_consistency_loss=0.0)
  rays = _rays(b)
  r = _fake_rendering(rng, b)
  key = jax.random.PRNGKey(0)
  noisy = sampling.sample_noisy_rays(key, rays, r, 5.0, b, angles, 1.0)
  r_noise = {k: jnp.repeat(v[:b], angles, axis=0) for k, v in r.items()}
  # noisy rays preserve origin + d*dir by construction -> loss == 0.
  loss = losses.noisy_distance_consistency_loss(
      1, rays, noisy, [r], [r_noise], cfg, 1.0)
  np.testing.assert_allclose(float(loss), 0.0, atol=1e-9)


def test_depth_smoothness_loss_flat_vs_rough():
  cfg = _config(depth_smoothness_loss_mult=1.0,
                depth_smoothness_coarse_loss_mult=0.0)
  n, p = 4, 4
  rng = np.random.RandomState(7)
  rgb = jnp.asarray(rng.uniform(0, 1, (n, p, p, 3)).astype(np.float32))
  acc = jnp.ones((n, p, p))
  flat = {'distance': jnp.ones((n, p, p, 1)), 'acc': acc, 'rgb': rgb}
  rough = {'distance': jnp.asarray(
      rng.uniform(0, 5, (n, p, p, 1)).astype(np.float32)),
      'acc': acc, 'rgb': rgb}
  l_flat = losses.compute_depth_smoothness_loss([flat], cfg)
  l_rough = losses.compute_depth_smoothness_loss([rough], cfg)
  np.testing.assert_allclose(float(l_flat), 0.0, atol=1e-7)
  assert float(l_rough) > 0


def test_distortion_loss_positive():
  rng = np.random.RandomState(8)
  h = _fake_level(rng, 4, 8, with_normals=False)
  cfg = _config(distortion_loss_mult=0.01)
  assert float(losses.distortion_loss([h], cfg)) > 0


def test_euler_angles_identity():
  m = sampling.euler_angles_to_matrix(jnp.zeros(3))
  np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=1e-6)


def test_sample_noisy_rays_preserves_surface_point():
  rng = np.random.RandomState(9)
  b, angles = 8, 3
  rays = _rays(b).replace(
      origins=jnp.asarray(rng.randn(b, 3).astype(np.float32)),
      directions=jnp.asarray(rng.randn(b, 3).astype(np.float32)))
  rendering = {'distance': jnp.asarray(
      rng.uniform(1, 3, (b, 1)).astype(np.float32))}
  noisy = sampling.sample_noisy_rays(
      jax.random.PRNGKey(1), rays, rendering, 10.0, b, angles, 1.0)
  assert noisy.origins.shape == (b * angles, 3)
  d = jnp.repeat(rendering['distance'], angles, axis=0)
  orig_pt = np.repeat(
      np.asarray(rays.origins + rendering['distance'] * rays.directions),
      angles, axis=0)
  noisy_pt = np.asarray(noisy.origins + d * noisy.directions)
  np.testing.assert_allclose(noisy_pt, orig_pt, atol=1e-5)


def test_sample_noisy_rays_patch_shaped():
  # Patch-mode ray bundles carry extra [p, p] dims; rotation must broadcast.
  rng = np.random.RandomState(10)
  n, p, angles = 4, 2, 3
  mk = lambda c: jnp.asarray(rng.randn(n, p, p, c).astype(np.float32))
  rays = rays_lib.Rays(
      origins=mk(3), directions=mk(3), viewdirs=mk(3), radii=mk(1),
      imageplane=mk(2), lossmult=mk(1), near=mk(1), far=mk(1),
      cam_idx=jnp.zeros((n, p, p, 1), jnp.int32))
  rendering = {'distance': jnp.asarray(
      rng.uniform(1, 3, (n, p, p, 1)).astype(np.float32))}
  noisy = sampling.sample_noisy_rays(
      jax.random.PRNGKey(3), rays, rendering, 10.0, n, angles, 1.0)
  assert noisy.origins.shape == (n * angles, p, p, 3)
  # Surface points preserved.
  d = jnp.repeat(rendering['distance'], angles, axis=0)
  orig_pt = np.repeat(
      np.asarray(rays.origins + rendering['distance'] * rays.directions),
      angles, axis=0)
  noisy_pt = np.asarray(noisy.origins + d * noisy.directions)
  np.testing.assert_allclose(noisy_pt, orig_pt, atol=1e-5)
  # Rotations preserve norms.
  np.testing.assert_allclose(
      np.linalg.norm(np.asarray(noisy.viewdirs), axis=-1),
      np.repeat(np.linalg.norm(np.asarray(rays.viewdirs), axis=-1), angles,
                axis=0), atol=1e-5)


def test_sample_noisy_rays_rotates_directions():
  b, angles = 4, 1
  rays = _rays(b)
  rendering = {'distance': jnp.ones((b, 1))}
  noisy = sampling.sample_noisy_rays(
      jax.random.PRNGKey(2), rays, rendering, 45.0, b, angles, 1.0)
  # With a large angle range the directions should have moved.
  assert not np.allclose(np.asarray(noisy.viewdirs),
                         np.asarray(rays.viewdirs), atol=1e-4)
  # Rotations preserve direction norms.
  np.testing.assert_allclose(
      np.linalg.norm(np.asarray(noisy.viewdirs), axis=-1),
      np.linalg.norm(np.asarray(rays.viewdirs), axis=-1), atol=1e-5)


def test_consistency_without_normals_model():
  """Diffuse/specular-only consistency must work on a normals-less model's
  renderings (no 'normals' key), and the normal term must raise the
  intended ValueError when switched on without normals."""
  from types import SimpleNamespace

  cfg = SimpleNamespace(
      sample_noise_angles=2,
      acc_threshold_for_consistency_loss=0.1,
      consistency_diffuse_loss_type='mse',
      consistency_specular_loss_type='mse',
      consistency_normal_loss_target='normals',
      consistency_normal_loss_mult=0.0,
      consistency_normal_coarse_loss_mult=0.0,
      consistency_diffuse_loss_mult=1.0,
      consistency_diffuse_coarse_loss_mult=0.0,
      consistency_specular_loss_mult=1.0,
      consistency_specular_coarse_loss_mult=0.0,
  )
  rng = np.random.RandomState(0)
  n, a = 4, 2
  rendering = {
      'diffuse': jnp.asarray(rng.rand(n, 3).astype(np.float32)),
      'specular': jnp.asarray(rng.rand(n, 3).astype(np.float32)),
      'acc': jnp.ones((n,), jnp.float32),
  }
  noise = {
      'diffuse': jnp.asarray(rng.rand(n * a, 3).astype(np.float32)),
      'specular': jnp.asarray(rng.rand(n * a, 3).astype(np.float32)),
  }
  d, s, nl = losses.noisy_consistency_loss(1, [rendering], [noise], cfg)
  assert np.isfinite(float(d)) and np.isfinite(float(s))
  assert float(nl) == 0.0

  cfg.consistency_normal_loss_mult = 1.0
  with pytest.raises(ValueError, match='normals cannot be None'):
    losses.noisy_consistency_loss(1, [rendering], [noise], cfg)
