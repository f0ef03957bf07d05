"""Image-space ops and quality metrics (ref: internal/image.py).

sRGB transfer functions are jnp (device, differentiable). Color correction is
float64 numpy on the host for lstsq stability (the reference also leans on
float64 there, nerf_system.py:392-398). SSIM is implemented here directly
(dm_pix parity: 11-tap Gaussian, k1=0.01/k2=0.03) since dm_pix is not a
framework dependency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float32).eps)


def mse_to_psnr(mse):
  """PSNR from MSE, assuming max pixel value 1."""
  return -10.0 / jnp.log(10.0) * jnp.log(mse)


def psnr_to_mse(psnr):
  """MSE from PSNR, assuming max pixel value 1."""
  return jnp.exp(-0.1 * jnp.log(10.0) * psnr)


def ssim_to_dssim(ssim):
  return (1 - ssim) / 2


def dssim_to_ssim(dssim):
  return 1 - 2 * dssim


def linear_to_srgb(linear, eps=None):
  """sRGB OETF; assumes linear in [0, 1]."""
  if eps is None:
    eps = _EPS
  srgb0 = 323 / 25 * linear
  srgb1 = (211 * jnp.maximum(eps, linear)**(5 / 12) - 11) / 200
  return jnp.where(linear <= 0.0031308, srgb0, srgb1)


def srgb_to_linear(srgb, eps=None):
  """sRGB EOTF; assumes srgb in [0, 1]."""
  if eps is None:
    eps = _EPS
  linear0 = 25 / 323 * srgb
  linear1 = jnp.maximum(eps, (200 * srgb + 11) / 211)**(12 / 5)
  return jnp.where(srgb <= 0.04045, linear0, linear1)


def downsample(img, factor):
  """Area-downsample img; factor must divide height and width."""
  sh = img.shape
  if not (sh[0] % factor == 0 and sh[1] % factor == 0):
    raise ValueError(f'Downsampling factor {factor} does not '
                     f'evenly divide image shape {sh[:2]}')
  img = img.reshape((sh[0] // factor, factor, sh[1] // factor, factor) + sh[2:])
  return img.mean((1, 3))


def _color_correct_core(img_mat, ref_mat, num_iters, eps):
  """Jitted float64 body of color_correct (one trace per image shape).

  Identical math to the reference's per-channel masked lstsq
  (internal/image.py:84-127), but the zeroed-row least squares is solved via
  its normal equations: with M the row mask, minimizing |M A w - M b| over a
  full [N, 10] system equals solving the 10x10 system (MA)^T A w = (MA)^T b,
  and the rank-deficient/all-masked case degrades to the same minimum-norm
  solution through lstsq on the tiny system. This replaces 3 channels x 5
  iterations of SVD lstsq on [H*W, 10] (the dominant eval-loop cost at
  800x800: ~10 s/frame) with a handful of XLA matmuls (~0.1 s).
  Agreement with the direct lstsq formulation: <= 6e-12 end to end at
  800x800, ~2e-13 at the parity test's 40x40 (vs its 1e-10 pin).
  """
  num_channels = img_mat.shape[-1]
  is_unclipped = lambda z: (z >= eps) & (z <= (1 - eps))
  mask0 = is_unclipped(img_mat)
  ref_unclipped = is_unclipped(ref_mat)
  for _ in range(num_iters):
    # Left-hand side: quadratic expansion of each pixel + linear + bias terms.
    a_mat = []
    for c in range(num_channels):
      a_mat.append(img_mat[:, c:(c + 1)] * img_mat[:, c:])
    a_mat.append(img_mat)
    a_mat.append(jnp.ones_like(img_mat[:, :1]))
    a_mat = jnp.concatenate(a_mat, axis=-1)
    img_unclipped = is_unclipped(img_mat)
    warp = []
    for c in range(num_channels):
      # Ignore rows saturated in the input or in the current estimate.
      mask = mask0[:, c] & img_unclipped[:, c] & ref_unclipped[:, c]
      ma_mat = jnp.where(mask[:, None], a_mat, 0)
      gram = ma_mat.T @ ma_mat
      rhs = ma_mat.T @ jnp.where(mask, ref_mat[:, c], 0)
      warp.append(jnp.linalg.lstsq(gram, rhs)[0])
    warp = jnp.stack(warp, axis=-1)
    img_mat = jnp.clip(a_mat @ warp, 0, 1)
  return img_mat


def color_correct(img, ref, num_iters=5, eps=0.5 / 255):
  """Warp `img`'s colors to match `ref` via iterated masked least squares.

  Float64 on the host CPU backend for lstsq stability (the reference also
  leans on float64 there, nerf_system.py:392-398); the iteration itself is
  one jitted XLA program (see _color_correct_core).
  """
  img = np.asarray(img, dtype=np.float64)
  ref = np.asarray(ref, dtype=np.float64)
  if img.shape[-1] != ref.shape[-1]:
    raise ValueError(
        f"img's {img.shape[-1]} and ref's {ref.shape[-1]} channels must match")
  num_channels = img.shape[-1]
  with jax.enable_x64(), \
       jax.default_device(jax.local_devices(backend='cpu')[0]):
    out = _color_correct_jit(img.reshape([-1, num_channels]),
                             ref.reshape([-1, num_channels]),
                             int(num_iters), float(eps))
    out = np.asarray(out)
  assert np.all(np.isfinite(out))
  return out.reshape(img.shape)


_color_correct_jit = jax.jit(_color_correct_core,
                             static_argnames=('num_iters', 'eps'))


def _gaussian_kernel1d(size, sigma):
  x = np.arange(size, dtype=np.float64) - (size - 1) / 2
  k = np.exp(-0.5 * (x / sigma) ** 2)
  return (k / k.sum()).astype(np.float32)


def ssim(img0, img1, max_val=1.0, filter_size=11, filter_sigma=1.5,
         k1=0.01, k2=0.03, return_map=False):
  """Structural similarity (Wang et al. 2004), dm_pix-compatible defaults.

  img0/img1: [H, W, C] in [0, max_val]. Gaussian windowing with VALID padding,
  separable along H then W - two small convs that XLA vectorizes on the VPU.
  """
  img0 = jnp.asarray(img0, jnp.float32)
  img1 = jnp.asarray(img1, jnp.float32)
  kernel = jnp.asarray(_gaussian_kernel1d(filter_size, filter_sigma))

  def blur(x):
    # x: [H, W, C]; separable valid-mode Gaussian filter.
    def conv_h(z):  # convolve along axis 0
      return jax.vmap(lambda col: jnp.convolve(col, kernel, mode='valid'),
                      in_axes=1, out_axes=1)(z)
    x = jax.vmap(conv_h, in_axes=2, out_axes=2)(x)      # filter H
    x = jnp.swapaxes(x, 0, 1)
    x = jax.vmap(conv_h, in_axes=2, out_axes=2)(x)      # filter W
    return jnp.swapaxes(x, 0, 1)

  mu0 = blur(img0)
  mu1 = blur(img1)
  mu00 = mu0 * mu0
  mu11 = mu1 * mu1
  mu01 = mu0 * mu1
  sigma00 = blur(img0 * img0) - mu00
  sigma11 = blur(img1 * img1) - mu11
  sigma01 = blur(img0 * img1) - mu01

  # Clip variances/covariances to valid values (matches dm_pix/tf.image).
  sigma00 = jnp.maximum(0.0, sigma00)
  sigma11 = jnp.maximum(0.0, sigma11)
  sigma01 = jnp.sign(sigma01) * jnp.minimum(
      jnp.sqrt(sigma00 * sigma11), jnp.abs(sigma01))

  c1 = (k1 * max_val) ** 2
  c2 = (k2 * max_val) ** 2
  numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
  denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
  ssim_map = numer / denom
  if return_map:
    return ssim_map
  return jnp.mean(ssim_map)
