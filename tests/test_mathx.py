import jax.numpy as jnp
import numpy as np

from refnerf_tpu.ops import mathx


def test_safe_sin_matches_sin_for_small_args():
  x = np.linspace(-10, 10, 101).astype(np.float32)
  np.testing.assert_allclose(mathx.safe_sin(x), np.sin(x), atol=1e-6)
  np.testing.assert_allclose(mathx.safe_cos(x), np.cos(x), atol=1e-6)


def test_safe_sin_finite_for_huge_args():
  x = np.array([1e10, -1e12, 1e20], dtype=np.float32)
  assert np.all(np.isfinite(mathx.safe_sin(x)))
  assert np.all(np.isfinite(mathx.safe_cos(x)))


def test_log_lerp_endpoints():
  assert np.isclose(mathx.log_lerp(0.0, 0.1, 0.001), 0.1)
  assert np.isclose(mathx.log_lerp(1.0, 0.1, 0.001), 0.001)
  # Midpoint in log space is the geometric mean.
  assert np.isclose(mathx.log_lerp(0.5, 1e-2, 1e-4), 1e-3)


def test_learning_rate_decay_no_delay():
  lr = mathx.learning_rate_decay(0, 2e-3, 2e-5, 1000)
  assert np.isclose(lr, 2e-3)
  lr = mathx.learning_rate_decay(1000, 2e-3, 2e-5, 1000)
  assert np.isclose(lr, 2e-5)


def test_learning_rate_decay_delay_warmup():
  # At step 0 with delay, LR is scaled down by lr_delay_mult.
  lr0 = mathx.learning_rate_decay(0, 2e-3, 2e-5, 1000, lr_delay_steps=100,
                                  lr_delay_mult=0.01)
  assert np.isclose(lr0, 0.01 * 2e-3, rtol=1e-5)
  # After the delay window the scale is back to 1.
  lr_mid = mathx.learning_rate_decay(100, 2e-3, 2e-5, 1000, lr_delay_steps=100,
                                     lr_delay_mult=0.01)
  expected = mathx.learning_rate_decay(100, 2e-3, 2e-5, 1000)
  assert np.isclose(lr_mid, expected, rtol=1e-5)


def test_sorted_interp_matches_numpy_interp():
  rng = np.random.RandomState(0)
  for _ in range(5):
    xp = np.sort(rng.uniform(-2, 2, size=(16,))).astype(np.float32)
    fp = np.sort(rng.uniform(-3, 3, size=(16,))).astype(np.float32)
    x = rng.uniform(-2.5, 2.5, size=(32,)).astype(np.float32)
    got = np.asarray(mathx.sorted_interp(x, xp, fp))
    want = np.interp(x, xp, fp)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sorted_interp_batched():
  rng = np.random.RandomState(1)
  xp = np.sort(rng.uniform(0, 1, size=(4, 8)), axis=-1).astype(np.float32)
  fp = np.sort(rng.uniform(0, 1, size=(4, 8)), axis=-1).astype(np.float32)
  x = rng.uniform(0, 1, size=(4, 5)).astype(np.float32)
  got = np.asarray(mathx.sorted_interp(x, xp, fp))
  for b in range(4):
    want = np.interp(x[b], xp[b], fp[b])
    np.testing.assert_allclose(got[b], want, atol=1e-5)


def test_safe_div():
  num = jnp.array([1.0, 2.0, 3.0])
  den = jnp.array([2.0, 0.0, 1.0])
  np.testing.assert_allclose(mathx.safe_div(num, den), [0.5, 0.0, 3.0])
