"""Cross-validation against the upstream reference implementation.

When the reference checkout is mounted (at REFNERF_REFERENCE_PATH or
/root/reference), its torch math modules serve as an oracle: we compare this
framework's jnp ops against them on random inputs. These tests SKIP when the
reference is unavailable - all behavior is independently covered by the
numpy-oracle tests elsewhere; this file pins exact numerical parity.
"""

import os
import sys

import numpy as np
import pytest

_REF = os.environ.get('REFNERF_REFERENCE_PATH', '/root/reference')

if os.path.isdir(_REF):
  sys.path.insert(0, _REF)
  try:
    import torch
    from internal import math as ref_math
    from internal import stepfun as ref_stepfun
    from internal import coord as ref_coord
    from internal import ref_utils as ref_refutils
    _HAVE_REF = True
  except Exception:  # noqa: BLE001 - any import failure just disables parity
    _HAVE_REF = False
else:
  _HAVE_REF = False

pytestmark = pytest.mark.skipif(not _HAVE_REF,
                                reason='reference checkout not available')

import jax.numpy as jnp  # noqa: E402

from refnerf_tpu.ops import coord, mathx, ref_utils, stepfun  # noqa: E402


def _rand_stepfun(rng, batch, n):
  t = np.sort(rng.uniform(0, 1, size=(batch, n + 1)), axis=-1).astype(
      np.float32)
  logits = rng.randn(batch, n).astype(np.float32)
  return t, logits


def test_sorted_interp_parity():
  rng = np.random.RandomState(0)
  xp = np.sort(rng.uniform(0, 1, (4, 16)), -1).astype(np.float32)
  fp = np.sort(rng.uniform(-1, 1, (4, 16)), -1).astype(np.float32)
  x = rng.uniform(-0.1, 1.1, (4, 8)).astype(np.float32)
  ours = np.asarray(mathx.sorted_interp(x, xp, fp))
  theirs = ref_math.sorted_interp(
      torch.tensor(x), torch.tensor(xp), torch.tensor(fp)).numpy()
  np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_sample_intervals_parity():
  rng = np.random.RandomState(1)
  t, logits = _rand_stepfun(rng, 4, 32)
  ours = np.asarray(stepfun.sample_intervals(
      None, jnp.asarray(t), jnp.asarray(logits), 16, domain=(0.0, 1.0)))
  theirs = ref_stepfun.sample_intervals(
      torch.tensor(t), torch.tensor(logits), 16, domain=(0.0, 1.0),
      use_gpu_resampling=False).numpy()
  np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_max_dilate_weights_parity():
  rng = np.random.RandomState(2)
  t, _ = _rand_stepfun(rng, 4, 16)
  w = rng.uniform(0, 1, (4, 16)).astype(np.float32)
  w /= w.sum(-1, keepdims=True)
  ours_t, ours_w = stepfun.max_dilate_weights(
      jnp.asarray(t), jnp.asarray(w), 0.02, domain=(0.0, 1.0),
      renormalize=True)
  theirs_t, theirs_w = ref_stepfun.max_dilate_weights(
      torch.tensor(t), torch.tensor(w), torch.tensor(0.02),
      domain=(torch.tensor(0.0), torch.tensor(1.0)), renormalize=True)
  np.testing.assert_allclose(np.asarray(ours_t), theirs_t.numpy(), atol=1e-6)
  np.testing.assert_allclose(np.asarray(ours_w), theirs_w.numpy(), atol=1e-5)


def test_lossfun_outer_parity():
  rng = np.random.RandomState(3)
  t, _ = _rand_stepfun(rng, 4, 16)
  w = rng.uniform(0, 1, (4, 16)).astype(np.float32)
  t_env, _ = _rand_stepfun(rng, 4, 8)
  w_env = rng.uniform(0, 1, (4, 8)).astype(np.float32)
  ours = np.asarray(stepfun.lossfun_outer(
      jnp.asarray(t), jnp.asarray(w), jnp.asarray(t_env), jnp.asarray(w_env)))
  theirs = ref_stepfun.lossfun_outer(
      torch.tensor(t), torch.tensor(w), torch.tensor(t_env),
      torch.tensor(w_env)).numpy()
  np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_lossfun_distortion_parity():
  rng = np.random.RandomState(4)
  t, _ = _rand_stepfun(rng, 4, 16)
  w = rng.uniform(0, 0.2, (4, 16)).astype(np.float32)
  ours = np.asarray(stepfun.lossfun_distortion(jnp.asarray(t), jnp.asarray(w)))
  theirs = ref_stepfun.lossfun_distortion(
      torch.tensor(t), torch.tensor(w)).numpy()
  np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_integrated_pos_enc_parity():
  rng = np.random.RandomState(5)
  mean = rng.randn(8, 3).astype(np.float32)
  var = rng.uniform(0, 0.1, (8, 3)).astype(np.float32)
  ours = np.asarray(coord.integrated_pos_enc(
      jnp.asarray(mean), jnp.asarray(var), 0, 8))
  theirs = ref_coord.integrated_pos_enc(
      torch.tensor(mean), torch.tensor(var), 0, 8).numpy()
  np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_expected_sin_parity():
  rng = np.random.RandomState(6)
  mean = rng.randn(32).astype(np.float32) * 10
  var = rng.uniform(0, 2, (32,)).astype(np.float32)
  ours = np.asarray(coord.expected_sin(jnp.asarray(mean), jnp.asarray(var)))
  theirs = ref_coord.expected_sin(
      torch.tensor(mean), torch.tensor(var)).numpy()
  np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_construct_ray_warps_parity():
  ours_ts, ours_st = coord.construct_ray_warps(
      None, jnp.asarray(2.0), jnp.asarray(6.0))
  theirs_ts, theirs_st = ref_coord.construct_ray_warps(
      None, torch.tensor(2.0), torch.tensor(6.0))
  s = np.linspace(0, 1, 9).astype(np.float32)
  np.testing.assert_allclose(
      np.asarray(ours_st(jnp.asarray(s))),
      theirs_st(torch.tensor(s)).numpy(), atol=1e-6)


def test_ide_parity():
  rng = np.random.RandomState(7)
  xyz = rng.randn(16, 3).astype(np.float32)
  xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
  kappa_inv = rng.uniform(0, 1, (16, 1)).astype(np.float32)
  try:
    ref_refutils.generate_ide_fn(2)
  except AttributeError:
    # The reference calls np.math.factorial, which numpy 2.x removed; the
    # IDE is independently pinned against a complex-arithmetic oracle in
    # test_ref_utils.py.
    pytest.skip('reference IDE incompatible with installed numpy')
  for deg in [2, 4, 5]:
    ours = np.asarray(ref_utils.generate_ide_fn(deg)(
        jnp.asarray(xyz), jnp.asarray(kappa_inv)))
    theirs = ref_refutils.generate_ide_fn(deg)(
        torch.tensor(xyz), torch.tensor(kappa_inv)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_reflect_parity():
  rng = np.random.RandomState(8)
  v = rng.randn(16, 3).astype(np.float32)
  n = rng.randn(16, 3).astype(np.float32)
  n /= np.linalg.norm(n, axis=-1, keepdims=True)
  ours = np.asarray(ref_utils.reflect(jnp.asarray(v), jnp.asarray(n)))
  theirs = ref_refutils.reflect(torch.tensor(v), torch.tensor(n)).numpy()
  np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_learning_rate_decay_parity():
  # The reference LambdaLR multiplier times lr_init equals our absolute LR.
  for step in [0, 10, 100, 512, 5000, 250000]:
    ours = mathx.learning_rate_decay(step, 2e-3, 2e-5, 250000, 512, 0.01)
    theirs = ref_math.learning_rate_decay(step, 2e-3, 2e-5, 250000, 512,
                                          0.01) * 2e-3
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_color_correct_parity_including_saturation_pathology():
  """Bit-parity of the iterative color-correct lstsq, incl. its documented
  failure mode: on majority-saturated images (e.g. a small object on a
  white background) the quadratic warp is fit only on in-gamut pixels and
  extrapolates the saturated background far out of gamut, so cc_psnr can
  come out far BELOW plain psnr. That is the reference's own behavior
  (internal/image.py:84-127) - verified identical here so nobody "fixes"
  it into divergence.
  """
  import refbridge
  refbridge.load_reference()  # installs the dm_pix/gin stand-ins
  from internal import image as ref_image
  from refnerf_tpu.ops import image as image_ops

  rng = np.random.RandomState(11)
  # ~60% saturated white background + a colorful in-gamut blob.
  ref_img = np.ones((40, 40, 3))
  blob = rng.uniform(0.1, 0.8, (40, 40, 3))
  mask = rng.rand(40, 40) < 0.4
  ref_img = np.where(mask[..., None], blob, ref_img)
  img = np.clip(ref_img * 0.9 + 0.03 + rng.normal(0, 0.02, ref_img.shape),
                0, 1)

  ours = np.asarray(image_ops.color_correct(img, ref_img))
  theirs = ref_image.color_correct(
      torch.tensor(img), torch.tensor(ref_img)).numpy()
  np.testing.assert_allclose(ours, theirs, atol=1e-10)
