"""Coordinate-space and ray-distance tools (ref: internal/coord.py).

Includes `track_linearize`, which the torch port could not express (it is
commented out at reference coord.py:38-60) - in JAX it is just
`jax.linearize`, restoring the multinerf capability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from refnerf_tpu.ops import mathx

_EPS = float(np.finfo(np.float32).eps)


def contract(x):
  """Contract points toward the origin (Eq 10 of arxiv.org/abs/2111.12077)."""
  # Clamping to eps prevents non-finite gradients when x == 0.
  x_mag_sq = jnp.maximum(_EPS, jnp.sum(x**2, axis=-1, keepdims=True))
  z = jnp.where(x_mag_sq <= 1, x,
                ((2 * jnp.sqrt(x_mag_sq) - 1) / x_mag_sq) * x)
  return z


def inv_contract(z):
  """The inverse of contract()."""
  z_mag_sq = jnp.maximum(_EPS, jnp.sum(z**2, axis=-1, keepdims=True))
  x = jnp.where(z_mag_sq <= 1, z, z / (2 * jnp.sqrt(z_mag_sq) - z_mag_sq))
  return x


def track_linearize(fn, mean, cov):
  """Push a Gaussian (mean, diag-cov) through `fn` by linearizing around mean.

  Uses Covar[Ax + y] = A Covar[x] A^T with A = dfn/dx. Restores the feature
  the torch reference dropped (ref: internal/coord.py:38-60).

  Args:
    fn: R^d -> R^d function applied pointwise over the last axis.
    mean: [..., d] means.
    cov: [..., d, d] covariances.

  Returns:
    (fn_mean, fn_cov) transformed means [..., d] and covariances [..., d, d].
  """
  if (mean.ndim + 1) != cov.ndim:
    raise ValueError('cov must be non-diagonal')
  fn_mean, lin_fn = jax.linearize(fn, mean)
  # Apply the JVP to each column of cov, then to each row of the result.
  fn_cov = jax.vmap(lin_fn, -1, -2)(jax.vmap(lin_fn, -1, -2)(cov))
  return fn_mean, fn_cov


# String names accepted for the ray-distance curve in gin configs.
_RAYDIST_FNS = {
    'reciprocal': (jnp.reciprocal, jnp.reciprocal),
    'log': (jnp.log, jnp.exp),
    'exp': (jnp.exp, jnp.log),
    'sqrt': (jnp.sqrt, jnp.square),
    'square': (jnp.square, jnp.sqrt),
}


def construct_ray_warps(fn, t_near, t_far):
  """Bijection between metric distance t and normalized distance s in [0,1].

  (ref: internal/coord.py:63-99.) `fn` may be None (identity), the string
  'piecewise', one of the names in _RAYDIST_FNS, or a callable whose __name__
  is one of those names.

  Returns:
    (t_to_s, s_to_t) forward/inverse maps.
  """
  if fn is None:
    fn_fwd = lambda x: x
    fn_inv = lambda x: x
  elif fn == 'piecewise':
    # Piecewise spacing combining identity and 1/x to allow t_near == 0.
    fn_fwd = lambda x: jnp.where(x < 1, 0.5 * x, 1 - 0.5 / x)
    fn_inv = lambda x: jnp.where(x < 0.5, 2 * x, 0.5 / (1 - x))
  else:
    name = fn if isinstance(fn, str) else fn.__name__
    if name not in _RAYDIST_FNS:
      raise ValueError(f'Unknown raydist_fn {fn!r}')
    fn_fwd, fn_inv = _RAYDIST_FNS[name]

  s_near, s_far = [fn_fwd(jnp.asarray(x)) for x in (t_near, t_far)]
  t_to_s = lambda t: (fn_fwd(t) - s_near) / (s_far - s_near)
  s_to_t = lambda s: fn_inv(s * s_far + (1 - s) * s_near)
  return t_to_s, s_to_t


def expected_sin(mean, var):
  """E[sin(x)] for x ~ N(mean, var); decays to 0 as var grows."""
  return jnp.exp(-0.5 * var) * mathx.safe_sin(mean)


def integrated_pos_enc(mean, var, min_deg, max_deg):
  """Integrated positional encoding: E[sin/cos] of 2^k-scaled coordinates.

  (mip-NeRF Eq 14; ref: internal/coord.py:107-126.)

  Args:
    mean: [..., d] coordinate means.
    var: [..., d] coordinate (diagonal) variances.
    min_deg, max_deg: encode with scales 2^[min_deg, max_deg).

  Returns:
    [..., 2*d*(max_deg-min_deg)] encoding.
  """
  scales = 2.0 ** jnp.arange(min_deg, max_deg)
  shape = mean.shape[:-1] + (-1,)
  scaled_mean = jnp.reshape(mean[..., None, :] * scales[:, None], shape)
  scaled_var = jnp.reshape(var[..., None, :] * scales[:, None]**2, shape)

  return expected_sin(
      jnp.concatenate([scaled_mean, scaled_mean + 0.5 * jnp.pi], axis=-1),
      jnp.concatenate([scaled_var] * 2, axis=-1))


def lift_and_diagonalize(mean, cov, basis):
  """Project mean/cov onto `basis` [d, n] and keep the diagonal of the cov.

  All batched matmuls - MXU work (ref: internal/coord.py:129-133).
  """
  fn_mean = jnp.matmul(mean, basis)
  fn_cov_diag = jnp.sum(basis * jnp.matmul(cov, basis), axis=-2)
  return fn_mean, fn_cov_diag


def pos_enc(x, min_deg, max_deg, append_identity=True):
  """Classic NeRF positional encoding (no integration)."""
  scales = 2.0 ** jnp.arange(min_deg, max_deg)
  shape = x.shape[:-1] + (-1,)
  scaled_x = jnp.reshape(x[..., None, :] * scales[:, None], shape)
  four_feat = jnp.sin(
      jnp.concatenate([scaled_x, scaled_x + 0.5 * jnp.pi], axis=-1))
  if append_identity:
    return jnp.concatenate([x, four_feat], axis=-1)
  return four_feat
