"""Camera poses + ray generation.

Split by execution site (unlike the reference's dual-backend `xnp` functions,
camera_utils.py:28):
  - Pose preprocessing (recenter/PCA/render paths) is host-side numpy - runs
    once at dataset load.
  - Ray generation (`pixels_to_rays`, `cast_ray_batch`, NDC) is pure jnp and
    is designed to run INSIDE the jitted train step: cameras live on device,
    the host ships only integer pixel ids, and ray casting fuses with the
    model forward (the reference's optional `cast_rays_in_train_step` fast
    path, nerf_system.py:85-87, made the default).
"""

from __future__ import annotations

import enum
import jax.numpy as jnp
import numpy as np
import scipy.interpolate

from refnerf_tpu.cameras import rays as rays_lib
from refnerf_tpu.ops import stepfun


class ProjectionType(enum.Enum):
  PERSPECTIVE = 'perspective'
  FISHEYE = 'fisheye'


# ---------------------------------------------------------------------------
# Host-side pose math (numpy; runs once per dataset).
# ---------------------------------------------------------------------------


def normalize(x):
  return x / np.linalg.norm(x)


def pad_poses(p):
  """Append the homogeneous [0,0,0,1] row to [..., 3, 4] poses."""
  bottom = np.broadcast_to([0, 0, 0, 1.0], p[..., :1, :4].shape)
  return np.concatenate([p[..., :3, :4], bottom], axis=-2)


def unpad_poses(p):
  return p[..., :3, :4]


def viewmatrix(lookdir, up, position):
  """Construct a camera-to-world lookat matrix [3, 4]."""
  vec2 = normalize(lookdir)
  vec0 = normalize(np.cross(up, vec2))
  vec1 = normalize(np.cross(vec2, vec0))
  return np.stack([vec0, vec1, vec2, position], axis=1)


def average_pose(poses):
  """Pose with mean position, viewing direction, and up vector."""
  position = poses[:, :3, 3].mean(0)
  z_axis = poses[:, :3, 2].mean(0)
  up = poses[:, :3, 1].mean(0)
  return viewmatrix(z_axis, up, position)


def recenter_poses(poses):
  """Recenter poses about the average pose; returns (poses, transform)."""
  cam2world = average_pose(poses)
  transform = np.linalg.inv(pad_poses(cam2world))
  poses = transform @ pad_poses(poses)
  return unpad_poses(poses), transform


def focus_point_fn(poses):
  """Point minimizing squared distance to all camera focal axes."""
  directions, origins = poses[:, :3, 2:3], poses[:, :3, 3:4]
  m = np.eye(3) - directions * np.transpose(directions, [0, 2, 1])
  mt_m = np.transpose(m, [0, 2, 1]) @ m
  return np.linalg.inv(mt_m.mean(0)) @ (mt_m @ origins).mean(0)[:, 0]


def transform_poses_pca(poses):
  """Rotate/scale poses so principal components align with XYZ in [-1,1]^3."""
  t = poses[:, :3, 3]
  t_mean = t.mean(axis=0)
  t = t - t_mean

  eigval, eigvec = np.linalg.eig(t.T @ t)
  inds = np.argsort(eigval)[::-1]
  eigvec = eigvec[:, inds]
  rot = eigvec.T
  if np.linalg.det(rot) < 0:
    rot = np.diag(np.array([1, 1, -1])) @ rot

  transform = np.concatenate([rot, rot @ -t_mean[:, None]], -1)
  poses_recentered = unpad_poses(transform @ pad_poses(poses))
  transform = np.concatenate([transform, np.eye(4)[3:]], axis=0)

  # Flip so the average up vector points up (+z of y-axis).
  if poses_recentered.mean(axis=0)[2, 1] < 0:
    poses_recentered = np.diag(np.array([1, -1, -1])) @ poses_recentered
    transform = np.diag(np.array([1, -1, -1, 1])) @ transform

  scale_factor = 1.0 / np.max(np.abs(poses_recentered[:, :3, 3]))
  poses_recentered[:, :3, 3] *= scale_factor
  transform = np.diag(np.array([scale_factor] * 3 + [1])) @ transform
  return poses_recentered, transform


# generate_spiral_path constants (forward-facing render paths).
NEAR_STRETCH = 0.9
FAR_STRETCH = 5.0
FOCUS_DISTANCE = 0.75


def generate_spiral_path(poses, bounds, n_frames=120, n_rots=2, zrate=0.5):
  """Forward-facing spiral render path (ref: camera_utils.py:158-188)."""
  near_bound = bounds.min() * NEAR_STRETCH
  far_bound = bounds.max() * FAR_STRETCH
  # Focus depth: weighted harmonic mean of the stretched near/far bounds.
  focal = 1 / ((1 - FOCUS_DISTANCE) / near_bound + FOCUS_DISTANCE / far_bound)

  positions = poses[:, :3, 3]
  radii = np.percentile(np.abs(positions), 90, 0)
  radii = np.concatenate([radii, [1.0]])

  render_poses = []
  cam2world = average_pose(poses)
  up = poses[:, :3, 1].mean(0)
  for theta in np.linspace(0.0, 2.0 * np.pi * n_rots, n_frames,
                           endpoint=False):
    t = radii * [np.cos(theta), -np.sin(theta), -np.sin(theta * zrate), 1.0]
    position = cam2world @ t
    lookat = cam2world @ [0, 0, -focal, 1.0]
    z_axis = position - lookat
    render_poses.append(viewmatrix(z_axis, up, position))
  return np.stack(render_poses, axis=0)


def generate_ellipse_path(poses, n_frames=120, const_speed=True,
                          z_variation=0.0, z_phase=0.0):
  """Elliptical render path around the capture's focus point
  (ref: camera_utils.py:230-278). Constant-speed resampling reuses the
  framework's own inverse-CDF sampler."""
  center = focus_point_fn(poses)
  offset = np.array([center[0], center[1], 0])

  sc = np.percentile(np.abs(poses[:, :3, 3] - offset), 90, axis=0)
  low = -sc + offset
  high = sc + offset
  z_low = np.percentile(poses[:, :3, 3], 10, axis=0)
  z_high = np.percentile(poses[:, :3, 3], 90, axis=0)

  def get_positions(theta):
    return np.stack([
        low[0] + (high - low)[0] * (np.cos(theta) * 0.5 + 0.5),
        low[1] + (high - low)[1] * (np.sin(theta) * 0.5 + 0.5),
        z_variation * (z_low[2] + (z_high - z_low)[2] *
                       (np.cos(theta + 2 * np.pi * z_phase) * 0.5 + 0.5)),
    ], -1)

  theta = np.linspace(0, 2.0 * np.pi, n_frames + 1, endpoint=True)
  positions = get_positions(theta)

  if const_speed:
    # Resample thetas so arc-length speed is approximately constant.
    lengths = np.linalg.norm(positions[1:] - positions[:-1], axis=-1)
    theta = np.asarray(stepfun.sample(
        None, jnp.asarray(theta), jnp.log(jnp.asarray(lengths)), n_frames + 1))
    positions = get_positions(theta)

  positions = positions[:-1]  # drop duplicated endpoint

  avg_up = poses[:, :3, 1].mean(0)
  avg_up = avg_up / np.linalg.norm(avg_up)
  ind_up = np.argmax(np.abs(avg_up))
  up = np.eye(3)[ind_up] * np.sign(avg_up[ind_up])

  return np.stack([viewmatrix(p - center, up, p) for p in positions])


def generate_interpolated_path(poses, n_interp, spline_degree=5,
                               smoothness=0.03, rot_weight=0.1):
  """B-spline interpolation through keyframe poses in
  (position, lookat, up) point form (ref: camera_utils.py:281-328)."""

  def poses_to_points(poses, dist):
    pos = poses[:, :3, -1]
    lookat = poses[:, :3, -1] - dist * poses[:, :3, 2]
    up = poses[:, :3, -1] + dist * poses[:, :3, 1]
    return np.stack([pos, lookat, up], 1)

  def points_to_poses(points):
    return np.array([viewmatrix(p - l, u - p, p) for p, l, u in points])

  def interp(points, n, k, s):
    sh = points.shape
    pts = np.reshape(points, (sh[0], -1))
    k = min(k, sh[0] - 1)
    tck, _ = scipy.interpolate.splprep(pts.T, k=k, s=s)
    u = np.linspace(0, 1, n, endpoint=False)
    new_points = np.array(scipy.interpolate.splev(u, tck))
    return np.reshape(new_points.T, (n, sh[1], sh[2]))

  points = poses_to_points(poses, dist=rot_weight)
  new_points = interp(points, n_interp * (points.shape[0] - 1),
                      k=spline_degree, s=smoothness)
  return points_to_poses(new_points)


def interpolate_1d(x, n_interp, spline_degree, smoothness):
  """Spline-upsample a 1D signal by a factor of n_interp."""
  t = np.linspace(0, 1, len(x), endpoint=True)
  tck = scipy.interpolate.splrep(t, x, s=smoothness, k=spline_degree)
  n = n_interp * (len(x) - 1)
  u = np.linspace(0, 1, n, endpoint=False)
  return scipy.interpolate.splev(u, tck)


def create_render_spline_path(config, image_names, poses):
  """Spline render path through keyframes named by file or directory
  (ref: camera_utils.py:343-377)."""
  import os
  if os.path.isdir(config.render_spline_keyframes):
    keyframe_names = sorted(os.listdir(config.render_spline_keyframes))
  else:
    with open(config.render_spline_keyframes, 'r') as fp:
      keyframe_names = fp.read().splitlines()
  spline_indices = np.array(
      [i for i, n in enumerate(image_names) if n in keyframe_names])
  keyframes = poses[spline_indices]
  render_poses = generate_interpolated_path(
      keyframes,
      n_interp=config.render_spline_n_interp,
      spline_degree=config.render_spline_degree,
      smoothness=config.render_spline_smoothness,
      rot_weight=0.1)
  return spline_indices, render_poses


def intrinsic_matrix(fx, fy, cx, cy):
  """OpenCV-convention pinhole intrinsics."""
  return np.array([
      [fx, 0, cx],
      [0, fy, cy],
      [0, 0, 1.0],
  ])


def get_pixtocam(focal, width, height):
  """Inverse intrinsics of a centered pinhole camera."""
  camtopix = intrinsic_matrix(focal, focal, width * 0.5, height * 0.5)
  return np.linalg.inv(camtopix).astype(np.float32)


def pixel_coordinates(width, height):
  """Integer (x, y) meshgrid over an image."""
  return np.meshgrid(np.arange(width), np.arange(height), indexing='xy')


# ---------------------------------------------------------------------------
# Device-side ray generation (jnp; runs inside jit).
# ---------------------------------------------------------------------------


def convert_to_ndc(origins, directions, pixtocam, near=1.0):
  """Map rays into the NDC cube of a forward-facing pinhole capture.

  Valid for any ray with dz < 0; after the map, near/far planes sit at 0/1
  along z (NeRF Appendix C; ref: camera_utils.py:31-97).
  """
  # Slide origins onto the near plane (oz = -near) so the new near bound is 0.
  t = -(near + origins[..., 2]) / directions[..., 2]
  origins = origins + t[..., None] * directions

  dx, dy, dz = jnp.moveaxis(directions, -1, 0)
  ox, oy, oz = jnp.moveaxis(origins, -1, 0)

  xmult = 1.0 / pixtocam[0, 2]  # == -2 * focal / width
  ymult = 1.0 / pixtocam[1, 2]  # == -2 * focal / height

  # Projections of the t=0 points and the t=infinity points.
  origins_ndc = jnp.stack(
      [xmult * ox / oz, ymult * oy / oz, -jnp.ones_like(oz)], axis=-1)
  infinity_ndc = jnp.stack(
      [xmult * dx / dz, ymult * dy / dz, jnp.ones_like(oz)], axis=-1)

  directions_ndc = infinity_ndc - origins_ndc
  return origins_ndc, directions_ndc


def _distortion_residual_and_jacobian(x, y, xd, yd, k1, k2, k3, k4, p1, p2):
  """Residual + Jacobian of the radial/tangential distortion model at (x,y)."""
  r = x * x + y * y
  d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))

  fx = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x) - xd
  fy = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y) - yd

  d_r = k1 + r * (2.0 * k2 + r * (3.0 * k3 + r * 4.0 * k4))
  d_x = 2.0 * x * d_r
  d_y = 2.0 * y * d_r

  fx_x = d + d_x * x + 2.0 * p1 * y + 6.0 * p2 * x
  fx_y = d_y * x + 2.0 * p1 * x + 2.0 * p2 * y
  fy_x = d_x * y + 2.0 * p2 * y + 2.0 * p1 * x
  fy_y = d + d_y * y + 2.0 * p2 * x + 6.0 * p1 * y
  return fx, fy, fx_x, fx_y, fy_x, fy_y


def radial_and_tangential_undistort(xd, yd, k1=0.0, k2=0.0, k3=0.0, k4=0.0,
                                    p1=0.0, p2=0.0, eps=1e-9,
                                    max_iterations=10):
  """Invert the distortion model by `max_iterations` unrolled Newton steps.

  Unrolled (static trip count) so it compiles to straight-line XLA with no
  dynamic control flow (ref: camera_utils.py:459-493).
  """
  x, y = xd, yd
  for _ in range(max_iterations):
    fx, fy, fx_x, fx_y, fy_x, fy_y = _distortion_residual_and_jacobian(
        x, y, xd, yd, k1, k2, k3, k4, p1, p2)
    denominator = fy_x * fx_y - fx_x * fy_y
    x_numerator = fx * fy_y - fy * fx_y
    y_numerator = fy * fx_x - fx * fy_x
    safe = jnp.abs(denominator) > eps
    denom_safe = jnp.where(safe, denominator, 1.0)
    x = x + jnp.where(safe, x_numerator / denom_safe, 0.0)
    y = y + jnp.where(safe, y_numerator / denom_safe, 0.0)
  return x, y


def pixels_to_rays(pix_x_int, pix_y_int, pixtocams, camtoworlds,
                   distortion_params=None, pixtocam_ndc=None,
                   camtype=ProjectionType.PERSPECTIVE):
  """Pixel centers -> world-space rays with mip radii.

  Shoots the center ray plus +1-pixel x/y neighbor rays to derive the cone
  radii (neighbor spacing * 2/sqrt(12); ref: camera_utils.py:502-614).
  Everything is jnp and batched - this is traced into the train step.

  Args:
    pix_x_int/pix_y_int: int arrays, shape SH.
    pixtocams: [SH.., 3, 3] or [3, 3] inverse intrinsics.
    camtoworlds: [SH.., 3, 4] or [3, 4] extrinsics.
    distortion_params: optional static dict of distortion floats.
    pixtocam_ndc: optional [3, 3] inverse intrinsics for the NDC warp.
    camtype: perspective or fisheye.

  Returns:
    (origins, directions, viewdirs, radii, imageplane).
  """
  def pix_to_dir(x, y):
    return jnp.stack([x + 0.5, y + 0.5, jnp.ones_like(x)], axis=-1)

  # Center ray + x/y neighbors for ray differentials.
  pixel_dirs_stacked = jnp.stack([
      pix_to_dir(pix_x_int, pix_y_int),
      pix_to_dir(pix_x_int + 1, pix_y_int),
      pix_to_dir(pix_x_int, pix_y_int + 1)
  ], axis=0).astype(jnp.float32)

  mat_vec_mul = lambda A, b: jnp.matmul(A, b[..., None])[..., 0]

  camera_dirs_stacked = mat_vec_mul(pixtocams, pixel_dirs_stacked)

  if distortion_params is not None:
    x, y = radial_and_tangential_undistort(
        camera_dirs_stacked[..., 0], camera_dirs_stacked[..., 1],
        **distortion_params)
    camera_dirs_stacked = jnp.stack([x, y, jnp.ones_like(x)], -1)

  if camtype == ProjectionType.FISHEYE:
    theta = jnp.sqrt(
        jnp.sum(jnp.square(camera_dirs_stacked[..., :2]), axis=-1))
    theta = jnp.minimum(jnp.pi, theta)
    # sinc: the ray through the principal point has theta == 0 exactly
    # (half-integer principal points); the limit is 1, not 0/0 = NaN.
    sin_theta_over_theta = jnp.where(
        theta > 1e-8, jnp.sin(theta) / jnp.maximum(theta, 1e-8), 1.0)
    camera_dirs_stacked = jnp.stack([
        camera_dirs_stacked[..., 0] * sin_theta_over_theta,
        camera_dirs_stacked[..., 1] * sin_theta_over_theta,
        jnp.cos(theta),
    ], axis=-1)

  # OpenCV -> OpenGL: negate y and z.
  camera_dirs_stacked = camera_dirs_stacked * jnp.array([1.0, -1.0, -1.0])

  imageplane = camera_dirs_stacked[0, ..., :2]

  directions_stacked = mat_vec_mul(camtoworlds[..., :3, :3],
                                   camera_dirs_stacked)
  directions, dx, dy = directions_stacked

  origins = jnp.broadcast_to(camtoworlds[..., :3, -1], directions.shape)
  viewdirs = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)

  if pixtocam_ndc is None:
    dx_norm = jnp.linalg.norm(dx - directions, axis=-1)
    dy_norm = jnp.linalg.norm(dy - directions, axis=-1)
  else:
    # In NDC, use origin offsets instead of direction offsets.
    origins_dx, _ = convert_to_ndc(origins, dx, pixtocam_ndc)
    origins_dy, _ = convert_to_ndc(origins, dy, pixtocam_ndc)
    origins, directions = convert_to_ndc(origins, directions, pixtocam_ndc)
    dx_norm = jnp.linalg.norm(origins_dx - origins, axis=-1)
    dy_norm = jnp.linalg.norm(origins_dy - origins, axis=-1)

  # Half the neighbor spacing, scaled to the stddev of a unit-box pixel.
  radii = (0.5 * (dx_norm + dy_norm))[..., None] * 2 / jnp.sqrt(12)

  return origins, directions, viewdirs, radii, imageplane


def cast_ray_batch(cameras, pixels, camtype=ProjectionType.PERSPECTIVE):
  """Pixels + camera bank -> Rays, fully on device.

  cameras = (pixtocams [N,3,3], camtoworlds [N,3,4], distortion_params
  (static dict or None), pixtocam_ndc ([3,3] or None)). Per-ray camera
  indexing is one gather over the (tiny) camera bank
  (ref: camera_utils.py:617-670).
  """
  pixtocams, camtoworlds, distortion_params, pixtocam_ndc = cameras

  # Per-pixel camera index, broadcast (left-aligned) to the full pixel shape
  # so indexed camera matrices batch-match the stacked pixel directions.
  cam_idx = pixels.cam_idx[..., 0]
  extra = pixels.pix_x_int.ndim - cam_idx.ndim
  cam_idx = jnp.broadcast_to(
      jnp.reshape(cam_idx, cam_idx.shape + (1,) * extra),
      pixels.pix_x_int.shape)
  batch_index = lambda arr: arr if arr.ndim == 2 else arr[cam_idx]

  origins, directions, viewdirs, radii, imageplane = pixels_to_rays(
      pixels.pix_x_int,
      pixels.pix_y_int,
      batch_index(jnp.asarray(pixtocams)),
      batch_index(jnp.asarray(camtoworlds)),
      distortion_params=distortion_params,
      pixtocam_ndc=None if pixtocam_ndc is None else jnp.asarray(pixtocam_ndc),
      camtype=camtype)

  return rays_lib.Rays(
      origins=origins,
      directions=directions,
      viewdirs=viewdirs,
      radii=radii,
      imageplane=imageplane,
      lossmult=pixels.lossmult,
      near=pixels.near,
      far=pixels.far,
      cam_idx=pixels.cam_idx)


def cast_pinhole_rays(camtoworld, height, width, focal, near, far):
  """Full-image pinhole ray batch (no distortion), for path rendering."""
  pix_x_int, pix_y_int = pixel_coordinates(width, height)
  pix_x_int, pix_y_int = jnp.asarray(pix_x_int), jnp.asarray(pix_y_int)
  pixtocam = jnp.asarray(get_pixtocam(focal, width, height))

  ray_args = pixels_to_rays(pix_x_int, pix_y_int, pixtocam,
                            jnp.asarray(camtoworld))

  broadcast_scalar = lambda x: jnp.broadcast_to(
      jnp.asarray(x, jnp.float32), pix_x_int.shape)[..., None]
  return rays_lib.Rays(
      *ray_args,
      lossmult=broadcast_scalar(1.0),
      near=broadcast_scalar(near),
      far=broadcast_scalar(far),
      cam_idx=broadcast_scalar(0).astype(jnp.int32))


def cast_spherical_rays(camtoworld, height, width, near, far):
  """Full-pano equirectangular ray batch (ref: camera_utils.py:700-746)."""
  camtoworld = jnp.asarray(camtoworld)
  theta_vals = jnp.linspace(0, 2 * jnp.pi, width + 1)
  phi_vals = jnp.linspace(0, jnp.pi, height + 1)
  theta, phi = jnp.meshgrid(theta_vals, phi_vals, indexing='xy')

  directions = jnp.stack([
      -jnp.sin(phi) * jnp.sin(theta),
      jnp.cos(phi),
      jnp.sin(phi) * jnp.cos(theta),
  ], axis=-1)

  directions = jnp.matmul(camtoworld[:3, :3], directions[..., None])[..., 0]

  dy = jnp.diff(directions[:, :-1], axis=0)
  dx = jnp.diff(directions[:-1, :], axis=1)
  directions = directions[:-1, :-1]
  viewdirs = directions

  origins = jnp.broadcast_to(camtoworld[:3, -1], directions.shape)

  dx_norm = jnp.linalg.norm(dx, axis=-1)
  dy_norm = jnp.linalg.norm(dy, axis=-1)
  radii = (0.5 * (dx_norm + dy_norm))[..., None] * 2 / jnp.sqrt(12)

  imageplane = jnp.zeros_like(directions[..., :2])

  broadcast_scalar = lambda x: jnp.broadcast_to(
      jnp.asarray(x, jnp.float32), radii.shape[:-1])[..., None]
  return rays_lib.Rays(
      origins, directions, viewdirs, radii, imageplane,
      lossmult=broadcast_scalar(1.0),
      near=broadcast_scalar(near),
      far=broadcast_scalar(far),
      cam_idx=broadcast_scalar(0).astype(jnp.int32))
