import jax
import jax.numpy as jnp
import numpy as np

from refnerf_tpu.ops import stepfun


def _rand_stepfun(rng, batch, n):
  t = np.sort(rng.uniform(0, 1, size=(batch, n + 1)), axis=-1).astype(
      np.float32)
  w = rng.uniform(0, 1, size=(batch, n)).astype(np.float32)
  w = w / w.sum(-1, keepdims=True)
  return t, w


def test_searchsorted_against_numpy():
  rng = np.random.RandomState(0)
  a = np.sort(rng.uniform(0, 1, size=(3, 9)), axis=-1).astype(np.float32)
  v = rng.uniform(0, 1, size=(3, 7)).astype(np.float32)
  lo, hi = stepfun.searchsorted(a, v)
  lo, hi = np.asarray(lo), np.asarray(hi)
  for b in range(3):
    want = np.searchsorted(a[b], v[b], side='right')
    inside = (v[b] >= a[b][0]) & (v[b] < a[b][-1])
    np.testing.assert_array_equal(hi[b][inside], want[inside])
    np.testing.assert_array_equal(lo[b][inside], want[inside] - 1)


def test_query_outside_support():
  t = jnp.array([[0.0, 1.0, 2.0]])
  y = jnp.array([[5.0, 7.0]])
  tq = jnp.array([[-1.0, 0.5, 1.5, 3.0]])
  got = stepfun.query(tq, t, y)
  np.testing.assert_allclose(got, [[0.0, 5.0, 7.0, 0.0]])


def test_integrate_weights_endpoints():
  rng = np.random.RandomState(1)
  _, w = _rand_stepfun(rng, 4, 8)
  cw = np.asarray(stepfun.integrate_weights(jnp.asarray(w)))
  assert cw.shape == (4, 9)
  np.testing.assert_allclose(cw[:, 0], 0.0)
  np.testing.assert_allclose(cw[:, -1], 1.0)
  assert np.all(np.diff(cw, axis=-1) >= -1e-6)


def test_inner_outer_bounds_resampled_weights():
  # Inner <= exact resampled mass <= outer for random step functions.
  rng = np.random.RandomState(2)
  t1, w1 = _rand_stepfun(rng, 1, 16)
  t0 = np.sort(rng.uniform(0, 1, size=(1, 9)), axis=-1).astype(np.float32)
  inner, outer = stepfun.inner_outer(t0, t1, w1)
  inner, outer = np.asarray(inner), np.asarray(outer)
  # Exact overlap integral computed densely in numpy.
  for i in range(t0.shape[-1] - 1):
    lo, hi = t0[0, i], t0[0, i + 1]
    exact = 0.0
    for j in range(t1.shape[-1] - 1):
      a, b = t1[0, j], t1[0, j + 1]
      ov = max(0.0, min(hi, b) - max(lo, a))
      if b > a:
        exact += w1[0, j] * ov / (b - a)
    assert inner[0, i] <= exact + 1e-5
    assert outer[0, i] >= exact - 1e-5


def test_lossfun_outer_zero_when_enveloped():
  rng = np.random.RandomState(3)
  t, w = _rand_stepfun(rng, 2, 8)
  # An envelope that strictly dominates: same t, weights doubled.
  loss = stepfun.lossfun_outer(jnp.asarray(t), jnp.asarray(w),
                               jnp.asarray(t), jnp.asarray(2 * w))
  np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-7)


def test_sample_deterministic_uniform_weights():
  # With uniform weights, deterministic sampling is near-linspace in t.
  t = jnp.array([[0.0, 0.25, 0.5, 0.75, 1.0]])
  logits = jnp.zeros((1, 4))
  samples = stepfun.sample(None, t, logits, 8)
  s = np.asarray(samples)[0]
  assert s[0] >= 0.0 and s[-1] <= 1.0
  np.testing.assert_allclose(np.diff(s), np.diff(s)[0] * np.ones(7), atol=1e-5)


def test_sample_concentrates_on_heavy_bin():
  t = jnp.array([[0.0, 0.25, 0.5, 0.75, 1.0]])
  logits = jnp.array([[-100.0, 100.0, -100.0, -100.0]])
  samples = np.asarray(stepfun.sample(None, t, logits, 16))[0]
  assert np.all(samples >= 0.25 - 1e-4)
  assert np.all(samples <= 0.5 + 1e-4)


def test_sample_stratified_within_bounds():
  rng = np.random.RandomState(4)
  t, w = _rand_stepfun(rng, 3, 8)
  logits = jnp.log(jnp.asarray(w) + 1e-8)
  key = jax.random.PRNGKey(0)
  s = np.asarray(stepfun.sample(key, jnp.asarray(t), logits, 32))
  assert np.all(s >= t[..., :1] - 1e-5)
  assert np.all(s <= t[..., -1:] + 1e-5)
  assert np.all(np.diff(s, axis=-1) >= -1e-5)  # sorted


def test_sample_intervals_shape_and_domain():
  rng = np.random.RandomState(5)
  t, w = _rand_stepfun(rng, 2, 16)
  logits = jnp.log(jnp.asarray(w) + 1e-8)
  si = stepfun.sample_intervals(None, jnp.asarray(t), logits, 32,
                                domain=(0.0, 1.0))
  si = np.asarray(si)
  assert si.shape == (2, 33)
  assert np.all(si >= 0.0) and np.all(si <= 1.0)
  assert np.all(np.diff(si, axis=-1) >= -1e-6)


def test_max_dilate_grows_support():
  t = jnp.array([[0.0, 0.3, 0.6, 1.0]])
  w = jnp.array([[0.0, 1.0, 0.0]])
  td, wd = stepfun.max_dilate(t, w, 0.1)
  td, wd = np.asarray(td), np.asarray(wd)
  # Mass must now cover [0.2, 0.7].
  covered = [(td[0, i], td[0, i + 1]) for i in range(td.shape[-1] - 1)
             if wd[0, i] > 0]
  lo = min(c[0] for c in covered)
  hi = max(c[1] for c in covered)
  assert lo <= 0.2 + 1e-6 and hi >= 0.7 - 1e-6


def test_max_dilate_weights_renormalizes():
  rng = np.random.RandomState(6)
  t, w = _rand_stepfun(rng, 4, 8)
  _, wd = stepfun.max_dilate_weights(
      jnp.asarray(t), jnp.asarray(w), 0.05, domain=(0.0, 1.0),
      renormalize=True)
  np.testing.assert_allclose(np.asarray(wd).sum(-1), 1.0, rtol=1e-5)


def test_lossfun_distortion_zero_for_point_mass():
  # All mass in one infinitesimally narrow bin -> distortion ~ width/3.
  t = jnp.array([[0.0, 0.499, 0.501, 1.0]])
  w = jnp.array([[0.0, 1.0, 0.0]])
  loss = float(stepfun.lossfun_distortion(t, w)[0])
  assert loss < 1e-2


def test_lossfun_distortion_large_for_spread_mass():
  t = jnp.array([[0.0, 0.5, 1.0]])
  w = jnp.array([[0.5, 0.5]])
  loss_spread = float(stepfun.lossfun_distortion(t, w)[0])
  t2 = jnp.array([[0.0, 0.01, 1.0]])
  w2 = jnp.array([[1.0, 0.0]])
  loss_tight = float(stepfun.lossfun_distortion(t2, w2)[0])
  assert loss_spread > loss_tight


def test_interval_distortion_matches_monte_carlo():
  rng = np.random.RandomState(7)
  t0 = np.sort(rng.uniform(0, 1, 2))
  t1 = np.sort(rng.uniform(0, 1, 2))
  got = float(stepfun.interval_distortion(t0[0], t0[1], t1[0], t1[1]))
  x = rng.uniform(t0[0], t0[1], 200000)
  y = rng.uniform(t1[0], t1[1], 200000)
  want = np.abs(x - y).mean()
  assert np.isclose(got, want, atol=5e-3)


def test_weighted_percentile_median_of_symmetric():
  t = jnp.array([[0.0, 0.25, 0.5, 0.75, 1.0]])
  w = jnp.array([[0.25, 0.25, 0.25, 0.25]])
  p = np.asarray(stepfun.weighted_percentile(t, w, [5, 50, 95]))
  assert np.isclose(p[0, 1], 0.5, atol=0.01)
  assert p[0, 0] < p[0, 1] < p[0, 2]


def test_resample_conserves_total_mass():
  rng = np.random.RandomState(8)
  tp, vp = _rand_stepfun(rng, 2, 8)
  # Resample onto a finer grid covering the same range.
  t = np.linspace(0, 1, 33).astype(np.float32)
  t = np.broadcast_to(t, (2, 33))
  t = np.sort(np.clip(t, tp[:, :1], tp[:, -1:]), axis=-1)
  v = np.asarray(stepfun.resample(jnp.asarray(t), jnp.asarray(tp),
                                  jnp.asarray(vp)))
  np.testing.assert_allclose(v.sum(-1), vp.sum(-1), rtol=1e-4)
