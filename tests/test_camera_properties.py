"""Property tests for the ray/camera layer's geometric invariants."""

import jax.numpy as jnp
import numpy as np
import pytest

from refnerf_tpu.cameras import camera_utils as cu

SEEDS = [0, 1, 2]


def _pinhole(width=16, height=12, focal=20.0):
  return cu.get_pixtocam(focal, width, height)


def _identity_pose():
  # Camera at origin looking down -z (OpenGL convention after the flip).
  return jnp.eye(3, 4)


@pytest.mark.parametrize('seed', SEEDS)
def test_pixels_to_rays_basic_invariants(seed):
  rng = np.random.RandomState(seed)
  w, h = 16, 12
  px = jnp.asarray(rng.randint(0, w, (40,)))
  py = jnp.asarray(rng.randint(0, h, (40,)))
  origins, directions, viewdirs, radii, imageplane = cu.pixels_to_rays(
      px, py, _pinhole(w, h), _identity_pose())
  np.testing.assert_allclose(np.linalg.norm(viewdirs, axis=-1), 1.0,
                             atol=1e-5)
  # viewdirs is the normalized direction (exactly parallel, same sign).
  cos = np.sum(np.asarray(viewdirs) * np.asarray(directions), -1)
  np.testing.assert_allclose(cos, np.linalg.norm(directions, axis=-1),
                             rtol=1e-5)
  assert bool(jnp.all(radii > 0))
  assert origins.shape == directions.shape == (40, 3)
  assert imageplane.shape == (40, 2)
  # Identity pose: all origins at the camera center (zero).
  np.testing.assert_allclose(np.asarray(origins), 0.0, atol=1e-6)
  # OpenGL convention: rays leave through -z.
  assert bool(jnp.all(directions[..., 2] < 0))


def test_center_pixel_ray_is_optical_axis():
  w, h, f = 17, 13, 20.0
  # get_pixtocam centers the principal point at (w/2, h/2); the pixel whose
  # CENTER hits it is (w/2 - 0.5, h/2 - 0.5) = (8, 6) for 17x13.
  origins, directions, viewdirs, _, _ = cu.pixels_to_rays(
      jnp.asarray([8]), jnp.asarray([6]), _pinhole(w, h, f),
      _identity_pose())
  np.testing.assert_allclose(np.asarray(viewdirs[0]), [0.0, 0.0, -1.0],
                             atol=1e-6)


@pytest.mark.parametrize('seed', SEEDS)
def test_radii_match_neighbor_spacing(seed):
  """radii = mean neighbor offset * 2/sqrt(12) (reference
  camera_utils.py:602-614): for an undistorted pinhole the offset is
  focal-scaled pixel pitch rotated to world space."""
  rng = np.random.RandomState(seed)
  w, h, f = 16, 12, 20.0
  px = jnp.asarray(rng.randint(0, w - 1, (10,)))
  py = jnp.asarray(rng.randint(0, h - 1, (10,)))
  _, d0, _, radii, _ = cu.pixels_to_rays(px, py, _pinhole(w, h, f),
                                         _identity_pose())
  _, dx, _, _, _ = cu.pixels_to_rays(px + 1, py, _pinhole(w, h, f),
                                     _identity_pose())
  _, dy, _, _, _ = cu.pixels_to_rays(px, py + 1, _pinhole(w, h, f),
                                     _identity_pose())
  expect = 0.5 * (np.linalg.norm(dx - d0, axis=-1) +
                  np.linalg.norm(dy - d0, axis=-1)) * 2 / np.sqrt(12)
  np.testing.assert_allclose(np.asarray(radii[:, 0]), expect, rtol=1e-5)


@pytest.mark.parametrize('seed', SEEDS)
def test_undistort_inverts_distortion(seed):
  rng = np.random.RandomState(seed)
  k1, k2 = 0.05 * rng.randn(), 0.02 * rng.randn()
  p1, p2 = 0.01 * rng.randn(), 0.01 * rng.randn()
  x = jnp.asarray(rng.uniform(-0.4, 0.4, (64,)).astype(np.float32))
  y = jnp.asarray(rng.uniform(-0.4, 0.4, (64,)).astype(np.float32))
  # Apply the forward OpenCV distortion model...
  r2 = x * x + y * y
  radial = 1.0 + r2 * (k1 + r2 * k2)
  xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
  yd = y * radial + 2 * p2 * x * y + p1 * (r2 + 2 * y * y)
  # ...and Newton-undistort it back.
  xu, yu = cu.radial_and_tangential_undistort(xd, yd, k1=k1, k2=k2,
                                              p1=p1, p2=p2)
  np.testing.assert_allclose(np.asarray(xu), np.asarray(x), atol=1e-4)
  np.testing.assert_allclose(np.asarray(yu), np.asarray(y), atol=1e-4)


def test_spherical_rays_cover_the_sphere():
  rays = cu.cast_spherical_rays(jnp.eye(3, 4), height=24, width=48,
                                near=0.1, far=10.0)
  d = np.asarray(rays.viewdirs).reshape(-1, 3)
  np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
  # Panorama actually covers all octants of direction space.
  for axis in range(3):
    assert d[:, axis].min() < -0.5 and d[:, axis].max() > 0.5


@pytest.mark.parametrize('seed', SEEDS)
def test_ndc_maps_into_unit_cube_axes(seed):
  rng = np.random.RandomState(seed)
  w, h, f = 32, 24, 30.0
  pixtocam = _pinhole(w, h, f)
  px = jnp.asarray(rng.randint(0, w, (50,)))
  py = jnp.asarray(rng.randint(0, h, (50,)))
  origins, directions, _, _, _ = cu.pixels_to_rays(
      px, py, pixtocam, _identity_pose(), pixtocam_ndc=pixtocam)
  # NDC origins lie on the near plane z=-1... z in [-1, 1) along the ray.
  o = np.asarray(origins)
  d = np.asarray(directions)
  np.testing.assert_allclose(o[:, 2], -1.0, atol=1e-5)
  # The far plane (t=1 in NDC parameterization) lands at z=1.
  np.testing.assert_allclose((o + d)[:, 2], 1.0, atol=1e-5)
  assert bool(np.all(np.abs(o[:, :2]) < 1.5))


def test_pose_utils_orthonormal():
  rng = np.random.RandomState(0)
  poses = []
  for _ in range(6):
    # Random orthonormal rotation via QR + random position.
    q, _ = np.linalg.qr(rng.randn(3, 3))
    q *= np.sign(np.linalg.det(q))
    poses.append(np.concatenate([q, rng.randn(3, 1)], axis=1))
  poses = np.stack(poses).astype(np.float32)
  recentered, _ = cu.recenter_poses(poses)
  for p in recentered:
    rot = p[:3, :3]
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-4)
  # PCA transform keeps rotations orthonormal and returns a 3x4 transform.
  transformed, transform = cu.transform_poses_pca(poses)
  for p in transformed:
    rot = p[:3, :3]
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-4)
  assert transform.shape[-2:] == (3, 4) or transform.shape[-2:] == (4, 4)
