import jax.numpy as jnp
import numpy as np

from refnerf_tpu.ops import image


def test_psnr_mse_roundtrip():
  mse = jnp.asarray(1e-3)
  psnr = image.mse_to_psnr(mse)
  np.testing.assert_allclose(image.psnr_to_mse(psnr), mse, rtol=1e-4)
  np.testing.assert_allclose(float(psnr), 30.0, atol=1e-3)


def test_srgb_roundtrip():
  x = jnp.linspace(0, 1, 256)
  y = image.srgb_to_linear(image.linear_to_srgb(x))
  np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_srgb_reference_values():
  # Standard sRGB anchor points.
  np.testing.assert_allclose(
      float(image.linear_to_srgb(jnp.asarray(1.0))), 1.0, atol=1e-5)
  np.testing.assert_allclose(
      float(image.linear_to_srgb(jnp.asarray(0.0))), 0.0, atol=1e-5)
  # 18% gray -> ~0.4614
  np.testing.assert_allclose(
      float(image.linear_to_srgb(jnp.asarray(0.18))), 0.4614, atol=1e-3)


def test_downsample_mean():
  img = np.arange(16, dtype=np.float32).reshape(4, 4)
  out = np.asarray(image.downsample(jnp.asarray(img), 2))
  want = np.array([[2.5, 4.5], [10.5, 12.5]])
  np.testing.assert_allclose(out, want)


def test_ssim_identical_images():
  rng = np.random.RandomState(0)
  img = rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)
  s = float(image.ssim(img, img))
  assert np.isclose(s, 1.0, atol=1e-5)


def test_ssim_decreases_with_noise():
  rng = np.random.RandomState(1)
  img = rng.uniform(0.2, 0.8, size=(48, 48, 3)).astype(np.float32)
  light = np.clip(img + rng.normal(0, 0.01, img.shape), 0, 1).astype(
      np.float32)
  heavy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(np.float32)
  s_light = float(image.ssim(img, light))
  s_heavy = float(image.ssim(img, heavy))
  assert 1.0 > s_light > s_heavy > 0.0


def test_ssim_matches_skimage_if_available():
  try:
    from skimage.metrics import structural_similarity
  except ImportError:
    return
  rng = np.random.RandomState(2)
  a = rng.uniform(0, 1, size=(64, 64)).astype(np.float32)
  b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
  got = float(image.ssim(a[..., None], b[..., None]))
  want = structural_similarity(
      a, b, data_range=1.0, gaussian_weights=True, sigma=1.5,
      use_sample_covariance=False)
  assert np.isclose(got, want, atol=5e-3)


def test_color_correct_fixes_linear_shift():
  rng = np.random.RandomState(3)
  ref = rng.uniform(0.1, 0.9, size=(16, 16, 3))
  img = np.clip(0.8 * ref + 0.05, 0, 1)
  corrected = image.color_correct(img, ref)
  err_before = np.mean((img - ref) ** 2)
  err_after = np.mean((corrected - ref) ** 2)
  assert err_after < err_before * 0.05
