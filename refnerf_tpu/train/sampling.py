"""Noisy-view ray sampling for the consistency losses.

Parity with reference internal/sample_utils.py, expressed as a pure function
of an explicit PRNG key (the torch version mutates global RNG state under
no_grad; here the caller stop-gradients the result).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from refnerf_tpu.cameras import rays as rays_lib


def euler_angles_to_matrix(euler_angles):
  """XYZ-convention Euler angles [..., 3] -> rotation matrices [..., 3, 3]."""
  if euler_angles.ndim == 0 or euler_angles.shape[-1] != 3:
    raise ValueError('Invalid input euler angles.')

  def axis_rot(axis, angle):
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == 'X':
      flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == 'Y':
      flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    else:  # 'Z'
      flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    return jnp.stack(flat, -1).reshape(angle.shape + (3, 3))

  mx, my, mz = [
      axis_rot(c, e)
      for c, e in zip('XYZ', jnp.moveaxis(euler_angles, -1, 0))]
  return mx @ my @ mz


def sample_noisy_rays(rng, rays, rendering, sample_angle_range=0.0,
                      sample_noise_size=128, sample_noise_angles=1,
                      warmup_ratio=1.0):
  """Rotate the first `sample_noise_size` rays by random small Euler angles.

  Origins are re-derived so each ray's expected surface point
  (origin + distance * direction) is preserved under the rotation
  (ref: internal/sample_utils.py:39-80). The result carries no gradients.

  Ordering: rays are laid out SAMPLE-major - ray i's `sample_noise_angles`
  rotated copies are contiguous - so the consistency losses' reshape to
  (n_samples, n_angles, ...) pairs each ray with its own perturbations. (The
  reference emits angle-major blocks, sample_utils.py:62-64, but reshapes
  sample-major in the loss, train_utils.py:217 - a grouping mismatch this
  rebuild fixes.)

  Returns a Rays bundle with sample_noise_size * sample_noise_angles rays.
  """
  n = min(sample_noise_size, rendering['distance'].shape[0])
  a = sample_noise_angles

  xyz_angles = jax.random.uniform(
      rng, (a, 3), minval=0.0,
      maxval=sample_angle_range / 180.0 * jnp.pi * warmup_ratio)
  rot = euler_angles_to_matrix(xyz_angles)  # [a, 3, 3]

  distance = rendering['distance'][:n]
  if distance.ndim == rays.origins.ndim - 1:
    distance = distance[..., None]
  elif distance.ndim != rays.origins.ndim:
    raise ValueError('The dimension of distance is wrong.')
  distance = jnp.repeat(distance, a, axis=0)

  def tile(x):
    return jnp.repeat(x[:n], a, axis=0)

  def rotate(x):
    # [n, ..., 3] x [a, 3, 3] -> sample-major [n*a, ..., 3] (ray i's `a`
    # rotated copies contiguous; supports patch-shaped ray bundles).
    rotated = jnp.einsum('...j,akj->...ak', x[:n], rot)   # [n, ..., a, 3]
    rotated = jnp.moveaxis(rotated, -2, 1)                # [n, a, ..., 3]
    return rotated.reshape((n * a,) + x.shape[1:])

  viewdirs_ = rotate(rays.viewdirs)
  directions_ = rotate(rays.directions)

  origins = tile(rays.origins)
  directions = tile(rays.directions)
  origins_ = origins + distance * directions - distance * directions_

  noisy = rays_lib.Rays(
      origins=origins_,
      directions=directions_,
      viewdirs=viewdirs_,
      radii=tile(rays.radii),
      imageplane=tile(rays.imageplane),
      lossmult=tile(rays.lossmult),
      near=tile(rays.near),
      far=tile(rays.far),
      cam_idx=tile(rays.cam_idx))
  return jax.lax.stop_gradient(noisy)
