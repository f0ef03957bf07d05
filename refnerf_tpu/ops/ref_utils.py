"""Reflection directions and (integrated) directional encodings.

Parity with reference internal/ref_utils.py, but the IDE is computed entirely
in real arithmetic: the complex Vandermonde (x+iy)^m of the reference
(ref_utils.py:148) is expanded into an explicit re/im recurrence, since TPU
vector units have no complex dtype and XLA lowers complex ops to slower
scalarized pairs. The spherical-harmonic coefficient matrix is precomputed in
float64 numpy at trace time.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


_EPS = float(np.finfo(np.float32).eps)


def reflect(viewdirs, normals):
  """Reflect view directions about unit normals: u = 2 (n.v) n - v."""
  return 2.0 * jnp.sum(
      normals * viewdirs, axis=-1, keepdims=True) * normals - viewdirs


def l2_normalize(x, eps=_EPS):
  """Normalize x to unit length along the last axis (grad-safe at 0)."""
  return x / jnp.sqrt(
      jnp.maximum(jnp.sum(x**2, axis=-1, keepdims=True), eps))


def compute_weighted_mae(weights, normals, normals_gt):
  """Weighted mean angular error in degrees; normals assumed unit length."""
  one_eps = 1 - _EPS
  return (weights * jnp.arccos(
      jnp.clip((normals * normals_gt).sum(-1), -one_eps,
               one_eps))).sum() / weights.sum() * 180.0 / jnp.pi


def generalized_binomial_coeff(a, k):
  """Generalized binomial coefficient (a choose k) for real a."""
  return np.prod(a - np.arange(k)) / math.factorial(k)


def assoc_legendre_coeff(l, m, k):
  """Coefficient of cos^k sin^m in the associated Legendre polynomial P_l^m."""
  return ((-1)**m * 2**l * math.factorial(l) / math.factorial(k) /
          math.factorial(l - k - m) *
          generalized_binomial_coeff(0.5 * (l + k + m - 1.0), l))


def sph_harm_coeff(l, m, k):
  """Spherical harmonic normalization * associated Legendre coefficient."""
  return (np.sqrt(
      (2.0 * l + 1.0) * math.factorial(l - m) /
      (4.0 * np.pi * math.factorial(l + m))) * assoc_legendre_coeff(l, m, k))


def get_ml_array(deg_view):
  """All (m, l) pairs used by the encoding: l in {1,2,4,...}, m in [0, l]."""
  ml_list = []
  for i in range(deg_view):
    l = 2**i
    # Only nonnegative m; real/imaginary parts are split explicitly below.
    for m in range(l + 1):
      ml_list.append((m, l))
  return np.array(ml_list).T


@functools.lru_cache(maxsize=None)
def _ide_constants(deg_view):
  """Precompute (ml_array, coefficient matrix, vMF sigmas) on the host."""
  ml_array = get_ml_array(deg_view)
  l_max = 2**(deg_view - 1)

  # mat[k, i] multiplies z^k to produce the z-dependence of harmonic i.
  mat = np.zeros((l_max + 1, ml_array.shape[1]), dtype=np.float64)
  for i, (m, l) in enumerate(ml_array.T):
    for k in range(l - m + 1):
      mat[k, i] = sph_harm_coeff(l, m, k)

  sigma = 0.5 * ml_array[1, :] * (ml_array[1, :] + 1)
  return (ml_array.astype(np.int32), mat.astype(np.float32),
          sigma.astype(np.float32))


def generate_ide_fn(deg_view):
  """Integrated directional encoding (Ref-NeRF Eqs 6-8, arxiv 2112.03907).

  Returns a function (xyz [..., 3], kappa_inv [..., 1]) -> [..., 2*P]
  where P = number of (m, l) pairs. deg_view > 5 is numerically unstable
  (warning kept for parity with ref: internal/ref_utils.py:113-115).
  """
  if deg_view > 5:
    print('WARNING: Only deg_view of at most 5 is numerically stable.')

  ml_array, mat_np, sigma_np = _ide_constants(deg_view)
  l_max = 2**(deg_view - 1)
  m_values = list(ml_array[0, :])  # python ints: static gather at trace time

  def integrated_dir_enc_fn(xyz, kappa_inv):
    # The running products operate on squeezed [...] arrays (full vector
    # lanes on TPU - [..., 1] columns tile at 1/128 lane utilization when
    # the leading shape is flat) and the per-harmonic columns materialize
    # in ONE stack each at the end. (A fully per-column formulation that
    # also expands the z-polynomial contraction was measured: it removes
    # the feature-major relayout copies but the un-fusable column residuals
    # overflow HBM at batch 4096 - reverted.)
    x = xyz[..., 0]
    y = xyz[..., 1]
    z = xyz[..., 2]

    # z Vandermonde: [1, z, z^2, ..., z^l_max] built by running product.
    vmz_cols = [jnp.ones_like(z)]
    for _ in range(l_max):
      vmz_cols.append(vmz_cols[-1] * z)
    vmz = jnp.stack(vmz_cols, axis=-1)

    # (x+iy)^m via a real/imag recurrence; gather needed powers statically.
    re_pows = [jnp.ones_like(x)]
    im_pows = [jnp.zeros_like(x)]
    for _ in range(max(m_values)):
      re_prev, im_prev = re_pows[-1], im_pows[-1]
      re_pows.append(re_prev * x - im_prev * y)
      im_pows.append(re_prev * y + im_prev * x)
    re_vmxy = jnp.stack([re_pows[m] for m in m_values], axis=-1)
    im_vmxy = jnp.stack([im_pows[m] for m in m_values], axis=-1)

    # Real z-dependence shared by re and im parts (a batched matmul -> MXU).
    mat = jnp.asarray(mat_np)
    z_part = jnp.matmul(vmz, mat)

    # von Mises-Fisher attenuation by concentration kappa = 1/kappa_inv.
    sigma = jnp.asarray(sigma_np)
    atten = jnp.exp(-sigma * kappa_inv)

    re_ide = re_vmxy * z_part * atten
    im_ide = im_vmxy * z_part * atten
    return jnp.concatenate([re_ide, im_ide], axis=-1)

  return integrated_dir_enc_fn


def generate_dir_enc_fn(deg_view):
  """Plain directional encoding: IDE evaluated at zero roughness."""
  integrated_dir_enc_fn = generate_ide_fn(deg_view)

  def dir_enc_fn(xyz):
    return integrated_dir_enc_fn(xyz, jnp.zeros_like(xyz[..., :1]))

  return dir_enc_fn


def orientation_loss_terms(w, n, v):
  """Per-sample back-facing penalty terms w * min(0, n.v)^2 (Ref-NeRF Eq 15).

  v points from the surface toward the camera. Returns [..., s] terms; callers
  reduce (ref loss wrapper lives in train/losses.py).
  """
  n_dot_v = (n * v[..., None, :]).sum(axis=-1)
  return w * jnp.minimum(0.0, n_dot_v) ** 2
