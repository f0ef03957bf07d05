import jax.numpy as jnp
import numpy as np

from refnerf_tpu.cameras import camera_utils, rays as rays_lib


def test_viewmatrix_orthonormal():
  m = camera_utils.viewmatrix(np.array([0.3, 0.2, 1.0]),
                              np.array([0.0, 1.0, 0.0]),
                              np.array([1.0, 2.0, 3.0]))
  r = m[:3, :3]
  np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-7)
  np.testing.assert_allclose(m[:, 3], [1.0, 2.0, 3.0])


def test_recenter_poses_zeroes_mean():
  rng = np.random.RandomState(0)
  poses = []
  for _ in range(8):
    q, _ = np.linalg.qr(rng.randn(3, 3))
    poses.append(np.concatenate([q, rng.randn(3, 1)], 1))
  poses = np.stack(poses)
  recentered, transform = camera_utils.recenter_poses(poses)
  # The average pose maps to (near) identity.
  avg = camera_utils.average_pose(recentered)
  np.testing.assert_allclose(avg[:, 3], 0, atol=1e-6)
  assert transform.shape == (4, 4)


def test_transform_poses_pca_bounds():
  rng = np.random.RandomState(1)
  poses = []
  for _ in range(10):
    q, _ = np.linalg.qr(rng.randn(3, 3))
    t = rng.randn(3) * np.array([5.0, 2.0, 0.5]) + np.array([10, -3, 2])
    poses.append(np.concatenate([q, t[:, None]], 1))
  poses = np.stack(poses)
  out, transform = camera_utils.transform_poses_pca(poses)
  assert np.max(np.abs(out[:, :3, 3])) <= 1.0 + 1e-6
  assert transform.shape == (4, 4)


def test_focus_point_convergent_cameras():
  # Cameras on a circle looking at a common target.
  target = np.array([0.5, -0.2, 0.3])
  poses = []
  for theta in np.linspace(0, 2 * np.pi, 8, endpoint=False):
    pos = target + 3 * np.array([np.cos(theta), np.sin(theta), 0.3])
    z = (pos - target) / np.linalg.norm(pos - target)  # camera looks down -z
    m = camera_utils.viewmatrix(z, np.array([0.0, 0.0, 1.0]), pos)
    poses.append(m)
  poses = np.stack(poses)
  focus = camera_utils.focus_point_fn(poses)
  np.testing.assert_allclose(focus, target, atol=1e-5)


def test_get_pixtocam_center_ray():
  p2c = camera_utils.get_pixtocam(100.0, 64, 48)
  center = p2c @ np.array([32.0, 24.0, 1.0])
  np.testing.assert_allclose(center[:2], 0.0, atol=1e-7)


def test_pixels_to_rays_through_center():
  # A camera at origin with identity rotation: center pixel ray ~ -z (OpenGL).
  pixtocam = jnp.asarray(camera_utils.get_pixtocam(50.0, 64, 64))
  camtoworld = jnp.asarray(np.eye(4)[:3].astype(np.float32))
  px = jnp.asarray(np.array([[31]], np.int32))  # +0.5 offset -> exact center
  py = jnp.asarray(np.array([[31]], np.int32))
  origins, directions, viewdirs, radii, imageplane = (
      camera_utils.pixels_to_rays(px, py, pixtocam, camtoworld))
  np.testing.assert_allclose(np.asarray(origins)[0, 0], 0, atol=1e-6)
  d = np.asarray(viewdirs)[0, 0]
  # Pixel centers are offset by half a pixel from the principal point.
  np.testing.assert_allclose(d, [0, 0, -1], atol=0.02)
  assert np.asarray(radii)[0, 0, 0] > 0


def test_pixels_to_rays_radii_scale_with_focal():
  # Halving the focal length doubles the pixel footprint (radii).
  c2w = jnp.asarray(np.eye(4)[:3].astype(np.float32))
  px = jnp.asarray(np.array([[10]], np.int32))
  py = jnp.asarray(np.array([[20]], np.int32))
  r_long = camera_utils.pixels_to_rays(
      px, py, jnp.asarray(camera_utils.get_pixtocam(100.0, 64, 64)), c2w)[3]
  r_short = camera_utils.pixels_to_rays(
      px, py, jnp.asarray(camera_utils.get_pixtocam(50.0, 64, 64)), c2w)[3]
  ratio = float(r_short[0, 0, 0] / r_long[0, 0, 0])
  assert np.isclose(ratio, 2.0, rtol=0.1)


def test_undistort_roundtrip():
  # distort(undistort(x)) == x for the radial/tangential model.
  rng = np.random.RandomState(2)
  k1, k2, p1, p2 = 0.05, -0.01, 0.001, 0.002
  x = rng.uniform(-0.5, 0.5, (32,)).astype(np.float32)
  y = rng.uniform(-0.5, 0.5, (32,)).astype(np.float32)
  # Apply forward distortion.
  r = x * x + y * y
  d = 1 + k1 * r + k2 * r ** 2
  xd = x * d + 2 * p1 * x * y + p2 * (r + 2 * x * x)
  yd = y * d + 2 * p2 * x * y + p1 * (r + 2 * y * y)
  xu, yu = camera_utils.radial_and_tangential_undistort(
      jnp.asarray(xd), jnp.asarray(yd), k1=k1, k2=k2, p1=p1, p2=p2)
  np.testing.assert_allclose(np.asarray(xu), x, atol=1e-5)
  np.testing.assert_allclose(np.asarray(yu), y, atol=1e-5)


def test_convert_to_ndc_bounds():
  # Rays from a forward-facing camera map near plane -> z=-1, infinity -> z=1.
  pixtocam = camera_utils.get_pixtocam(50.0, 64, 64)
  origins = jnp.asarray(np.zeros((5, 3), np.float32))
  rng = np.random.RandomState(3)
  d = rng.uniform(-0.2, 0.2, (5, 3)).astype(np.float32)
  d[:, 2] = -1.0  # forward (-z)
  o_ndc, d_ndc = camera_utils.convert_to_ndc(
      origins, jnp.asarray(d), jnp.asarray(pixtocam))
  np.testing.assert_allclose(np.asarray(o_ndc)[:, 2], -1.0, atol=1e-6)
  np.testing.assert_allclose(np.asarray(o_ndc + d_ndc)[:, 2], 1.0, atol=1e-6)


def test_cast_ray_batch_indexes_cameras():
  n_cams = 3
  rng = np.random.RandomState(4)
  pixtocams = np.stack(
      [camera_utils.get_pixtocam(50.0 + 10 * i, 64, 64)
       for i in range(n_cams)])
  camtoworlds = np.stack([
      np.concatenate([np.eye(3), np.array([[i], [0.0], [0.0]])], 1)
      for i in range(n_cams)]).astype(np.float32)
  cameras = (pixtocams, camtoworlds, None, None)
  n = 6
  pixels = rays_lib.Pixels(
      pix_x_int=np.full((n, 1), 10, np.int32),
      pix_y_int=np.full((n, 1), 12, np.int32),
      lossmult=np.ones((n, 1), np.float32),
      near=np.full((n, 1), 1.0, np.float32),
      far=np.full((n, 1), 5.0, np.float32),
      cam_idx=np.arange(n).reshape(n, 1).astype(np.int32) % n_cams)
  rays = camera_utils.cast_ray_batch(cameras, pixels)
  o = np.asarray(rays.origins).reshape(n, 3)
  # Origin x equals the camera index (camera centers at x=i).
  np.testing.assert_allclose(o[:, 0], np.arange(n) % n_cams, atol=1e-6)
  v = np.asarray(rays.viewdirs).reshape(n, 3)
  np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-6)


def test_cast_spherical_rays_cover_sphere():
  rays = camera_utils.cast_spherical_rays(
      np.eye(4)[:3].astype(np.float32), 16, 32, 0.1, 10.0)
  d = np.asarray(rays.directions).reshape(-1, 3)
  np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
  # Directions point both up and down, left and right.
  assert d[:, 1].max() > 0.9 and d[:, 1].min() < -0.9
  assert d[:, 0].max() > 0.9 and d[:, 0].min() < -0.9


def test_generate_spiral_and_ellipse_paths():
  rng = np.random.RandomState(5)
  poses = []
  for theta in np.linspace(0, 2 * np.pi, 12, endpoint=False):
    pos = np.array([np.cos(theta), np.sin(theta), 0.1])
    z = pos / np.linalg.norm(pos)
    poses.append(camera_utils.viewmatrix(z, np.array([0.0, 0, 1]), pos))
  poses = np.stack(poses)
  spiral = camera_utils.generate_spiral_path(
      poses, np.array([1.0, 10.0]), n_frames=30)
  assert spiral.shape == (30, 3, 4)
  ellipse = camera_utils.generate_ellipse_path(poses, n_frames=30)
  assert ellipse.shape == (30, 3, 4)
  for path in (spiral, ellipse):
    r = path[:, :3, :3]
    np.testing.assert_allclose(
        np.einsum('nij,nkj->nik', r, r),
        np.broadcast_to(np.eye(3), (30, 3, 3)), atol=1e-5)


def test_generate_interpolated_path():
  rng = np.random.RandomState(6)
  poses = []
  for i in range(4):
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
      q = -q
    poses.append(np.concatenate([q, rng.randn(3, 1)], 1))
  poses = np.stack(poses)
  out = camera_utils.generate_interpolated_path(poses, n_interp=10,
                                                spline_degree=3,
                                                smoothness=0.0)
  assert out.shape == (30, 3, 4)
