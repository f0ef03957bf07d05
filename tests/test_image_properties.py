"""Property tests for image-metric ops."""

import jax.numpy as jnp
import numpy as np
import pytest

from refnerf_tpu.ops import image as image_ops

SEEDS = [0, 1, 2]


@pytest.mark.parametrize('seed', SEEDS)
def test_srgb_roundtrip(seed):
  rng = np.random.RandomState(seed)
  lin = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
  srgb = image_ops.linear_to_srgb(lin)
  assert bool(jnp.all((srgb >= -1e-6) & (srgb <= 1 + 1e-6)))
  # Gamma curve is monotone and brightens mid-tones.
  np.testing.assert_allclose(image_ops.srgb_to_linear(srgb), lin, atol=1e-5)
  mid = jnp.asarray([[0.2, 0.5, 0.8]])
  assert bool(jnp.all(image_ops.linear_to_srgb(mid) > mid))


@pytest.mark.parametrize('seed', SEEDS)
def test_psnr_mse_inverse(seed):
  rng = np.random.RandomState(seed)
  mse = jnp.asarray(10.0 ** rng.uniform(-6, -1, (16,)).astype(np.float32))
  psnr = image_ops.mse_to_psnr(mse)
  np.testing.assert_allclose(image_ops.psnr_to_mse(psnr), mse, rtol=1e-4)
  # Lower mse -> higher psnr.
  order = np.argsort(np.asarray(mse))
  assert bool(np.all(np.diff(np.asarray(psnr)[order]) <= 1e-5))


def test_ssim_identity_and_range():
  rng = np.random.RandomState(0)
  img = jnp.asarray(rng.uniform(0, 1, (24, 24, 3)).astype(np.float32))
  np.testing.assert_allclose(image_ops.ssim(img, img), 1.0, atol=1e-5)
  noise = jnp.asarray(rng.uniform(0, 1, (24, 24, 3)).astype(np.float32))
  s = float(image_ops.ssim(img, noise))
  assert -1.0 - 1e-6 <= s < 0.9


def test_downsample_preserves_mean():
  rng = np.random.RandomState(1)
  img = jnp.asarray(rng.uniform(0, 1, (16, 24, 3)).astype(np.float32))
  down = image_ops.downsample(img, 4)
  assert down.shape == (4, 6, 3)
  np.testing.assert_allclose(down.mean(), img.mean(), atol=1e-6)
  # Area downsampling of a constant image is exact.
  const = jnp.full((8, 8, 3), 0.37)
  np.testing.assert_allclose(image_ops.downsample(const, 2), 0.37,
                             atol=1e-6)


@pytest.mark.parametrize('seed', SEEDS)
def test_color_correct_fixes_affine_casts(seed):
  """color_correct solves per-channel quadratic fits; an affine color cast
  must be recovered (near-)exactly on in-gamut images."""
  rng = np.random.RandomState(seed)
  ref = rng.uniform(0.1, 0.9, (24, 24, 3)).astype(np.float32)
  cast = np.clip(ref * [0.8, 1.1, 0.95] + [0.05, -0.03, 0.02], 0, 1)
  corrected = image_ops.color_correct(jnp.asarray(cast), jnp.asarray(ref))
  assert float(jnp.mean((corrected - ref) ** 2)) < 1e-5
  # Identity input is (close to) a fixed point.
  same = image_ops.color_correct(jnp.asarray(ref), jnp.asarray(ref))
  assert float(jnp.mean((same - ref) ** 2)) < 1e-6
