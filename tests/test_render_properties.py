"""Property tests for volume-rendering invariants."""

import jax.numpy as jnp
import numpy as np
import pytest

from refnerf_tpu.models import render

SEEDS = [0, 1, 2]


def _inputs(seed, n=16, s=24):
  rng = np.random.RandomState(seed)
  tdist = np.sort(rng.uniform(1.0, 6.0, (n, s + 1)).astype(np.float32), -1)
  density = rng.exponential(0.5, (n, s)).astype(np.float32)
  density[rng.uniform(size=density.shape) < 0.2] = 0.0
  dirs = rng.randn(n, 3).astype(np.float32)
  return jnp.asarray(tdist), jnp.asarray(density), jnp.asarray(dirs)


@pytest.mark.parametrize('seed', SEEDS)
@pytest.mark.parametrize('opaque', [False, True])
def test_alpha_weights_are_a_subprobability(seed, opaque):
  tdist, density, dirs = _inputs(seed)
  weights, alpha, trans = render.compute_alpha_weights(
      density, tdist, dirs, opaque_background=opaque)
  assert bool(jnp.all(weights >= 0)) and bool(jnp.all(weights <= 1 + 1e-6))
  assert bool(jnp.all(alpha >= 0)) and bool(jnp.all(alpha <= 1 + 1e-6))
  # Transmittance is monotone nonincreasing and starts at 1.
  np.testing.assert_allclose(trans[..., 0], 1.0, atol=1e-6)
  assert bool(jnp.all(jnp.diff(trans, axis=-1) <= 1e-6))
  total = weights.sum(-1)
  if opaque:
    # Infinite final interval forces full opacity.
    np.testing.assert_allclose(total, 1.0, atol=1e-5)
  else:
    assert bool(jnp.all(total <= 1 + 1e-5))


@pytest.mark.parametrize('seed', SEEDS)
def test_weights_equal_transmittance_decrements(seed):
  """w_i = T_i - T_{i+1}: compositing is exactly the telescoping of the
  transmittance curve (so 'acc' is 1 - final transmittance)."""
  tdist, density, dirs = _inputs(seed)
  weights, alpha, trans = render.compute_alpha_weights(density, tdist, dirs)
  t_next = trans * (1.0 - alpha)
  np.testing.assert_allclose(weights, trans - t_next, atol=1e-6)


@pytest.mark.parametrize('seed', SEEDS)
def test_volumetric_rendering_color_convexity(seed):
  """The composited color is a convex combination of sample colors and the
  background, so it lies in their hull (per channel)."""
  tdist, density, dirs = _inputs(seed)
  weights, _, _ = render.compute_alpha_weights(density, tdist, dirs)
  rng = np.random.RandomState(100 + seed)
  n, s = density.shape
  rgbs = jnp.asarray(rng.uniform(0, 1, (n, s, 3)).astype(np.float32))
  bg = 0.5
  rendering = render.volumetric_rendering(
      rgbs, rgbs, jnp.zeros_like(rgbs), weights, tdist, bg,
      jnp.full((n, 1), 6.0), compute_extras=True, extras={})
  lo = jnp.minimum(rgbs.min(axis=-2), bg) - 1e-5
  hi = jnp.maximum(rgbs.max(axis=-2), bg) + 1e-5
  assert bool(jnp.all(rendering['rgb'] >= lo))
  assert bool(jnp.all(rendering['rgb'] <= hi))
  # 'distance' is the UNNORMALIZED expectation sum(w * t_mid) (reference
  # render.py:221-223 - no /acc); normalizing by acc gives a convex
  # combination of interval midpoints, which must lie in the t-range.
  acc = weights.sum(-1)
  norm_dist = rendering['distance'][..., 0] / jnp.maximum(acc, 1e-6)
  inside = acc > 1e-3
  assert bool(jnp.all(jnp.where(inside,
                                norm_dist >= tdist[..., 0] - 1e-4, True)))
  assert bool(jnp.all(jnp.where(inside,
                                norm_dist <= tdist[..., -1] + 1e-4, True)))
  # acc = 1 - final transmittance in [0, 1].
  assert bool(jnp.all((rendering['acc'] >= -1e-6) &
                      (rendering['acc'] <= 1 + 1e-6)))
  # Percentile distances are ordered p05 <= p50 <= p95.
  assert bool(jnp.all(rendering['distance_percentile_5'] <=
                      rendering['distance_median'] + 1e-5))
  assert bool(jnp.all(rendering['distance_median'] <=
                      rendering['distance_percentile_95'] + 1e-5))


@pytest.mark.parametrize('seed', SEEDS)
def test_gaussian_moments_inside_frustum(seed):
  """Cone/cylinder moment matching: t_mean within [t0, t1], variances
  positive, means on the ray."""
  rng = np.random.RandomState(seed)
  n, s = 12, 9
  tdist = jnp.asarray(
      np.sort(rng.uniform(0.5, 8.0, (n, s + 1)).astype(np.float32), -1))
  origins = jnp.asarray(rng.randn(n, 3).astype(np.float32))
  d = jnp.asarray(rng.randn(n, 3).astype(np.float32))
  radii = jnp.asarray(rng.uniform(1e-3, 1e-2, (n, 1)).astype(np.float32))
  for shape in ('cone', 'cylinder'):
    means, covs = render.cast_rays(tdist, origins, d, radii, shape,
                                   diag=False)
    # Means lie on the ray: (mean - o) parallel to d.
    rel = np.asarray(means) - np.asarray(origins)[:, None, :]
    cross = np.cross(rel, np.asarray(d)[:, None, :])
    np.testing.assert_allclose(
        cross / np.linalg.norm(rel, axis=-1, keepdims=True), 0.0, atol=1e-5)
    # t along the ray within the interval (cones bias toward the wide end
    # but stay inside).
    t_along = np.sum(rel * np.asarray(d)[:, None, :], -1) / np.sum(
        np.asarray(d)**2, -1, keepdims=True)
    t0, t1 = np.asarray(tdist[..., :-1]), np.asarray(tdist[..., 1:])
    assert np.all(t_along >= t0 - 1e-4) and np.all(t_along <= t1 + 1e-4)
    # Covariance PSD on the diagonal (numerically: nonneg eigenvalues).
    eig = np.linalg.eigvalsh(np.asarray(covs))
    assert np.all(eig >= -1e-6)
