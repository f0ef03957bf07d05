import jax.numpy as jnp
import numpy as np

from refnerf_tpu.models import render


def test_conical_frustum_gaussian_matches_monte_carlo():
  # Sample points uniformly in a conical frustum and compare moments.
  rng = np.random.RandomState(0)
  d = np.array([0.0, 0.0, 1.0], dtype=np.float32)
  t0, t1, base_radius = 0.9, 1.1, 0.05

  # Monte-Carlo: sample t with density prop. to t^2 (cone cross-section area),
  # then a disk of radius base_radius * t.
  n = 400000
  u = rng.uniform(size=n)
  t = (t0**3 + u * (t1**3 - t0**3)) ** (1 / 3)
  r = base_radius * t * np.sqrt(rng.uniform(size=n))
  theta = rng.uniform(0, 2 * np.pi, size=n)
  pts = np.stack([r * np.cos(theta), r * np.sin(theta), t], -1)

  mean_mc = pts.mean(0)
  cov_mc = np.cov(pts.T)

  mean, cov = render.conical_frustum_to_gaussian(
      jnp.asarray(d), jnp.asarray(t0), jnp.asarray(t1),
      jnp.asarray(base_radius), diag=False)
  np.testing.assert_allclose(np.asarray(mean).squeeze(), mean_mc, atol=1e-3)
  np.testing.assert_allclose(np.asarray(cov).squeeze(), cov_mc, atol=1e-4)


def test_cylinder_gaussian_matches_monte_carlo():
  rng = np.random.RandomState(1)
  d = np.array([0.0, 0.0, 1.0], dtype=np.float32)
  t0, t1, radius = 1.0, 2.0, 0.1
  n = 400000
  t = rng.uniform(t0, t1, size=n)
  r = radius * np.sqrt(rng.uniform(size=n))
  theta = rng.uniform(0, 2 * np.pi, size=n)
  pts = np.stack([r * np.cos(theta), r * np.sin(theta), t], -1)

  mean, cov = render.cylinder_to_gaussian(
      jnp.asarray(d), jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(radius),
      diag=True)
  np.testing.assert_allclose(np.asarray(mean).squeeze(), pts.mean(0),
                             atol=2e-3)
  np.testing.assert_allclose(np.asarray(cov).squeeze(), pts.var(0), rtol=2e-2)


def test_cast_rays_offsets_by_origin():
  tdist = jnp.array([[1.0, 2.0, 3.0]])
  origins = jnp.array([[1.0, 2.0, 3.0]])
  directions = jnp.array([[0.0, 0.0, 1.0]])
  radii = jnp.array([[0.01]])
  means, covs = render.cast_rays(tdist, origins, directions, radii, 'cone',
                                 diag=False)
  assert means.shape == (1, 2, 3)
  assert covs.shape == (1, 2, 3, 3)
  # Means sit near origin + direction * t_mid (plus the cone's forward shift).
  np.testing.assert_allclose(np.asarray(means)[0, 0], [1.0, 2.0, 4.5],
                             atol=0.15)


def test_compute_alpha_weights_zero_density():
  density = jnp.zeros((2, 4))
  tdist = jnp.broadcast_to(jnp.linspace(0, 1, 5), (2, 5))
  dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (2, 3))
  weights, alpha, trans = render.compute_alpha_weights(density, tdist, dirs)
  np.testing.assert_allclose(np.asarray(weights), 0.0)
  np.testing.assert_allclose(np.asarray(trans), 1.0)


def test_compute_alpha_weights_opaque_wall():
  # Huge density in bin 1 -> all weight lands there, nothing passes through.
  density = jnp.array([[0.0, 1e8, 0.0, 0.0]])
  tdist = jnp.asarray(np.linspace(0, 1, 5)[None])
  dirs = jnp.array([[0.0, 0.0, 1.0]])
  weights, _, _ = render.compute_alpha_weights(density, tdist, dirs)
  w = np.asarray(weights)[0]
  np.testing.assert_allclose(w[1], 1.0, atol=1e-6)
  np.testing.assert_allclose(w[[0, 2, 3]], 0.0, atol=1e-6)


def test_compute_alpha_weights_opaque_background():
  density = jnp.zeros((1, 4))
  tdist = jnp.asarray(np.linspace(0, 1, 5)[None])
  dirs = jnp.array([[0.0, 0.0, 1.0]])
  weights, _, _ = render.compute_alpha_weights(density, tdist, dirs,
                                               opaque_background=True)
  # All the mass is forced into the final (infinitely wide) interval.
  np.testing.assert_allclose(np.asarray(weights).sum(-1), 1.0, atol=1e-6)


def test_compute_alpha_weights_sum_le_one():
  rng = np.random.RandomState(2)
  density = jnp.asarray(rng.uniform(0, 5, size=(8, 16)).astype(np.float32))
  tdist = jnp.asarray(
      np.sort(rng.uniform(0, 1, size=(8, 17)), -1).astype(np.float32))
  dirs = jnp.asarray(rng.randn(8, 3).astype(np.float32))
  weights, _, _ = render.compute_alpha_weights(density, tdist, dirs)
  assert np.all(np.asarray(weights).sum(-1) <= 1.0 + 1e-5)
  assert np.all(np.asarray(weights) >= 0.0)


def _simple_rendering(compute_extras, srgb_mapping='none'):
  b, s = 4, 8
  rng = np.random.RandomState(3)
  rgbs = jnp.asarray(rng.uniform(0, 1, size=(b, s, 3)).astype(np.float32))
  weights = rng.uniform(0, 1, size=(b, s)).astype(np.float32)
  weights = jnp.asarray(weights / weights.sum(-1, keepdims=True) * 0.9)
  tdist = jnp.asarray(
      np.broadcast_to(np.linspace(2, 6, s + 1), (b, s + 1)).astype(np.float32))
  t_far = jnp.full((b, 1), 6.0)
  return render.volumetric_rendering(
      rgbs, rgbs, jnp.zeros_like(rgbs), weights, tdist, 1.0, t_far,
      compute_extras, extras=None, srgb_mapping=srgb_mapping)


def test_volumetric_rendering_basic():
  r = _simple_rendering(False)
  assert set(r) == {'rgb', 'diffuse', 'specular', 'distance', 'acc'}
  assert r['rgb'].shape == (4, 3)
  np.testing.assert_allclose(np.asarray(r['acc']), 0.9, atol=1e-5)


def test_volumetric_rendering_extras():
  r = _simple_rendering(True)
  for k in ['distance_mean', 'distance_median', 'distance_percentile_5',
            'distance_percentile_95']:
    assert k in r
    v = np.asarray(r[k])
    assert np.all((v >= 2.0 - 1e-4) & (v <= 6.0 + 1e-4))
  p5 = np.asarray(r['distance_percentile_5'])
  p95 = np.asarray(r['distance_percentile_95'])
  assert np.all(p5 <= p95)


def test_volumetric_rendering_background_fill():
  # Zero weights -> pure background color.
  rgbs = jnp.zeros((2, 4, 3))
  weights = jnp.zeros((2, 4))
  tdist = jnp.asarray(np.broadcast_to(np.linspace(0, 1, 5), (2, 5)))
  r = render.volumetric_rendering(
      rgbs, rgbs, rgbs, weights, tdist, 0.75, jnp.ones((2, 1)), False)
  np.testing.assert_allclose(np.asarray(r['rgb']), 0.75, atol=1e-6)


def test_srgb_mapping_modes():
  for mode in ['none', 'linear', 'norm_linear', 'srgb', 'norm_srgb']:
    r = _simple_rendering(False, srgb_mapping=mode)
    assert np.all(np.isfinite(np.asarray(r['rgb'])))
    if mode != 'none':
      assert np.asarray(r['rgb']).max() <= 1.0 + 1e-6
