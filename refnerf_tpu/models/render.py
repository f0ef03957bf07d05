"""Volume-rendering ops: frustum Gaussians, transmittance, compositing.

Behavioral parity with reference internal/render.py; pure jnp so the whole
cast->composite path fuses with the MLP into one XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from refnerf_tpu.ops import image as image_ops
from refnerf_tpu.ops import stepfun

_EPS = float(np.finfo(np.float32).eps)


def lift_gaussian(d, t_mean, t_var, r_var, diag):
  """Lift a per-ray 1D Gaussian to 3D along direction `d`."""
  mean = d[..., None, :] * t_mean[..., None]

  d_mag_sq = jnp.maximum(1e-10, jnp.sum(d**2, axis=-1, keepdims=True))

  if diag:
    d_outer_diag = d**2
    null_outer_diag = 1 - d_outer_diag / d_mag_sq
    t_cov_diag = t_var[..., None] * d_outer_diag[..., None, :]
    xy_cov_diag = r_var[..., None] * null_outer_diag[..., None, :]
    return mean, t_cov_diag + xy_cov_diag
  else:
    d_outer = d[..., :, None] * d[..., None, :]
    eye = jnp.eye(d.shape[-1])
    null_outer = eye - d[..., :, None] * (d / d_mag_sq)[..., None, :]
    t_cov = t_var[..., None, None] * d_outer[..., None, :, :]
    xy_cov = r_var[..., None, None] * null_outer[..., None, :, :]
    return mean, t_cov + xy_cov


def _cone_moments(t0, t1):
  """Stable 1D/radial moments of a conical frustum (mip-NeRF Eq 7).

  Returns (t_mean, t_var, r_var_unit) with r_var_unit the radial variance
  per unit base radius squared.
  """
  mu = (t0 + t1) / 2
  hw = (t1 - t0) / 2
  t_mean = mu + (2 * mu * hw**2) / jnp.maximum(_EPS, 3 * mu**2 + hw**2)
  denom = jnp.maximum(_EPS, 3 * mu**2 + hw**2)
  t_var = (hw**2) / 3 - (4 / 15) * hw**4 * (12 * mu**2 - hw**2) / denom**2
  r_var = (mu**2) / 4 + (5 / 12) * hw**2 - (4 / 15) * (hw**4) / denom
  return t_mean, t_var, r_var


def conical_frustum_to_gaussian(d, t0, t1, base_radius, diag, stable=True):
  """Moment-match a conical frustum with a Gaussian (mip-NeRF Eq 7).

  `stable=True` uses the numerically-stable reparameterization in terms of
  the frustum midpoint/half-width; False uses the raw power expressions
  (catastrophic cancellation; kept for testing only).
  """
  if stable:
    t_mean, t_var, r_var = _cone_moments(t0, t1)
  else:
    t_mean = (3 * (t1**4 - t0**4)) / (4 * (t1**3 - t0**3))
    r_var = 3 / 20 * (t1**5 - t0**5) / (t1**3 - t0**3)
    t_mosq = 3 / 5 * (t1**5 - t0**5) / (t1**3 - t0**3)
    t_var = t_mosq - t_mean**2
  r_var = r_var * base_radius**2
  return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cylinder_to_gaussian(d, t0, t1, radius, diag):
  """Moment-match a cylinder segment with a Gaussian."""
  t_mean = (t0 + t1) / 2
  r_var = radius**2 / 4
  t_var = (t1 - t0)**2 / 12
  return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cast_rays(tdist, origins, directions, radii, ray_shape, diag=True):
  """Turn fencepost distances along each ray into sample Gaussians."""
  t0 = tdist[..., :-1]
  t1 = tdist[..., 1:]
  if ray_shape == 'cone':
    gaussian_fn = conical_frustum_to_gaussian
  elif ray_shape == 'cylinder':
    gaussian_fn = cylinder_to_gaussian
  else:
    raise ValueError("ray_shape must be 'cone' or 'cylinder'")
  means, covs = gaussian_fn(directions, t0, t1, radii, diag)
  means = means + origins[..., None, :]
  return means, covs


def cast_rays_lifted(tdist, origins, directions, radii, ray_shape, basis):
  """Sample Gaussians pre-projected onto `basis`: (means, lm, lv).

  Algebraically equal to `coord.lift_and_diagonalize(*cast_rays(...,
  diag=False), basis)` (reference internal/render.py:105-129 +
  internal/coord.py:129-133) but in closed form: with the frustum Gaussian

      cov = t_var (d d^T) + r_var (I - d d^T / |d|^2),

  the projected diagonal is p^T cov p = t_var (d.p)^2 +
  r_var (|p|^2 - (d.p)^2 / |d|^2), so the lift needs only per-RAY basis
  dot products plus the per-sample 1D moments. Every tensor is
  [..., samples] or [..., n_basis] wide - full VPU lanes on TPU - and the
  [..., samples, 3, 3] covariances never enter the program (XLA cannot do
  this algebra itself; the 3x3 formulation runs 3-lane-occupied).

  Args:
    tdist: [..., s+1] fencepost distances.
    origins, directions: [..., 3] rays (directions need not be unit).
    radii: [..., 1] base radii.
    ray_shape: 'cone' | 'cylinder'.
    basis: [3, n_basis] projection basis.

  Returns:
    means [..., s, 3], lifted means [..., s, n_basis], lifted variance
    diagonal [..., s, n_basis].
  """
  t0 = tdist[..., :-1]
  t1 = tdist[..., 1:]
  if ray_shape == 'cone':
    t_mean, t_var, r_var = _cone_moments(t0, t1)
  elif ray_shape == 'cylinder':
    t_mean = (t0 + t1) / 2
    t_var = (t1 - t0)**2 / 12
    r_var = jnp.full_like(t_mean, 0.25)
  else:
    raise ValueError("ray_shape must be 'cone' or 'cylinder'")
  r_var = r_var * radii**2  # radii broadcast over the sample axis

  dp = jnp.matmul(directions, basis)   # [..., n] per-ray direction . p_j
  op = jnp.matmul(origins, basis)      # [..., n] per-ray origin . p_j
  pp = jnp.sum(basis * basis, axis=0)  # [n] static |p_j|^2
  d_mag_sq = jnp.maximum(
      1e-10, jnp.sum(directions**2, axis=-1, keepdims=True))
  dp2 = dp**2
  null_p = pp - dp2 / d_mag_sq

  lm = op[..., None, :] + t_mean[..., None] * dp[..., None, :]
  lv = (t_var[..., None] * dp2[..., None, :]
        + r_var[..., None] * null_p[..., None, :])
  means = (origins[..., None, :]
           + directions[..., None, :] * t_mean[..., None])
  return means, lm, lv


def compute_alpha_weights(density, tdist, dirs, opaque_background=False):
  """Transmittance-based compositing weights from densities.

  Returns (weights, alpha, trans); weights = alpha * accumulated transmittance
  (ref: internal/render.py:132-149).
  """
  t_delta = tdist[..., 1:] - tdist[..., :-1]
  delta = t_delta * jnp.linalg.norm(dirs[..., None, :], axis=-1)
  density_delta = density * delta

  if opaque_background:
    # Equivalent to making the final t-interval infinitely wide.
    density_delta = jnp.concatenate([
        density_delta[..., :-1],
        jnp.full_like(density_delta[..., -1:], jnp.inf)], axis=-1)

  alpha = 1 - jnp.exp(-density_delta)
  trans = jnp.exp(-jnp.concatenate([
      jnp.zeros_like(density_delta[..., :1]),
      jnp.cumsum(density_delta[..., :-1], axis=-1)], axis=-1))
  weights = alpha * trans
  return weights, alpha, trans


def _apply_srgb_mapping(rgb, diffuse_rgb, specular_rgb, srgb_mapping):
  """The 5 sRGB mapping modes of the reference (render.py:186-216)."""
  if srgb_mapping == 'none':
    return rgb, diffuse_rgb, specular_rgb
  if srgb_mapping == 'linear':
    return (jnp.clip(rgb, 0.0, 1.0), jnp.clip(diffuse_rgb, 0.0, 1.0),
            jnp.clip(specular_rgb, 0.0, 1.0))
  if srgb_mapping == 'norm_linear':
    rgb_norm = jnp.maximum(rgb.max(axis=-1, keepdims=True),
                           jnp.ones_like(rgb[..., :1]))
    return (jnp.clip(rgb / rgb_norm, 0.0, 1.0),
            jnp.clip(diffuse_rgb, 0.0, 1.0),
            jnp.clip(specular_rgb, 0.0, 1.0))
  if srgb_mapping == 'srgb':
    return (jnp.clip(image_ops.linear_to_srgb(rgb), 0.0, 1.0),
            jnp.clip(image_ops.linear_to_srgb(diffuse_rgb), 0.0, 1.0),
            jnp.clip(image_ops.linear_to_srgb(specular_rgb), 0.0, 1.0))
  if srgb_mapping == 'norm_srgb':
    rgb_norm = jnp.maximum(rgb.max(axis=-1, keepdims=True),
                           jnp.ones_like(rgb[..., :1]))
    return (jnp.clip(image_ops.linear_to_srgb(rgb / rgb_norm), 0.0, 1.0),
            jnp.clip(image_ops.linear_to_srgb(diffuse_rgb), 0.0, 1.0),
            jnp.clip(image_ops.linear_to_srgb(specular_rgb), 0.0, 1.0))
  raise ValueError(
      'Mapping types are none, linear, norm_linear, srgb, norm_srgb')


def volumetric_rendering(rgbs, diffuse_rgbs, specular_rgbs, weights, tdist,
                         bg_rgbs, t_far, compute_extras, extras=None,
                         srgb_mapping='none'):
  """Composite per-sample colors into per-ray renderings.

  Composites three parallel color buffers (full/diffuse/specular - the
  Ref-NeRF decomposition), the expected distance, accumulated opacity, and
  optionally extras (normals/roughness/tint bundles) plus log-space distance
  statistics and weighted distance percentiles
  (ref: internal/render.py:152-254).
  """
  rendering = {}

  acc = weights.sum(axis=-1)
  bg_w = jnp.maximum(0, 1 - acc[..., None])  # background weight
  rgb = (weights[..., None] * rgbs).sum(axis=-2) + bg_w * bg_rgbs
  diffuse_rgb = (weights[..., None] * diffuse_rgbs).sum(axis=-2) + bg_w * bg_rgbs
  specular_rgb = (weights[..., None] * specular_rgbs).sum(axis=-2) + bg_w * bg_rgbs

  rgb, diffuse_rgb, specular_rgb = _apply_srgb_mapping(
      rgb, diffuse_rgb, specular_rgb, srgb_mapping)
  rendering['rgb'] = rgb
  rendering['diffuse'] = diffuse_rgb
  rendering['specular'] = specular_rgb

  t_mids = 0.5 * (tdist[..., :-1] + tdist[..., 1:])
  rendering['distance'] = (weights[..., None] * t_mids[..., None]).sum(axis=-2)
  rendering['acc'] = acc

  if compute_extras:
    if extras is not None:
      for k, v in extras.items():
        if v is not None:
          rendering[k] = (weights[..., None] * v).sum(axis=-2)

    expectation = lambda x: (weights * x).sum(axis=-1) / jnp.maximum(_EPS, acc)

    # Log-space distance expectation for numerical stability.
    rendering['distance_mean'] = jnp.clip(
        jnp.nan_to_num(jnp.exp(expectation(jnp.log(t_mids))), posinf=jnp.inf),
        tdist[..., 0], tdist[..., -1])

    # Extra fencepost at the far plane so the weight vector sums to exactly 1.
    t_aug = jnp.concatenate([tdist, t_far], axis=-1)
    weights_aug = jnp.concatenate([weights, bg_w], axis=-1)

    ps = [5, 50, 95]
    distance_percentiles = stepfun.weighted_percentile(t_aug, weights_aug, ps)

    for i, p in enumerate(ps):
      s = 'median' if p == 50 else 'percentile_' + str(p)
      rendering['distance_' + s] = distance_percentiles[..., i]

  return rendering
