"""Property tests for the step-function core: invariants over random inputs.

The oracle tests (test_stepfun.py, test_reference_parity.py) pin exact
values; these pin the *invariants* the sampling cascade relies on -
monotonicity, domain containment, mass conservation - across many random
step functions, including degenerate ones (zero-width intervals, zero
weights) that fixed-value tests rarely hit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refnerf_tpu.ops import stepfun

SEEDS = [0, 1, 2, 3]


def _random_stepfn(seed, n_rays=8, n_bins=17, zero_width_frac=0.2):
  rng = np.random.RandomState(seed)
  deltas = rng.exponential(1.0, (n_rays, n_bins)).astype(np.float32)
  # Degenerate zero-width intervals are legal (sdist slicing makes them).
  deltas[rng.uniform(size=deltas.shape) < zero_width_frac] = 0.0
  t = np.concatenate([np.zeros((n_rays, 1), np.float32),
                      np.cumsum(deltas, axis=-1)], axis=-1)
  t /= np.maximum(t[:, -1:], 1e-6)  # support ~ [0, 1]
  w = rng.uniform(0.0, 1.0, (n_rays, n_bins)).astype(np.float32)
  w[rng.uniform(size=w.shape) < 0.1] = 0.0
  w /= np.maximum(w.sum(-1, keepdims=True), 1e-6)
  return jnp.asarray(t), jnp.asarray(w)


@pytest.mark.parametrize('seed', SEEDS)
def test_searchsorted_bracket_invariant(seed):
  t, _ = _random_stepfn(seed)
  rng = np.random.RandomState(100 + seed)
  v = jnp.asarray(rng.uniform(-0.2, 1.2, (t.shape[0], 13)).astype(np.float32))
  lo, hi = stepfun.searchsorted(t, v)
  a_lo = jnp.take_along_axis(t, lo, axis=-1)
  a_hi = jnp.take_along_axis(t, hi, axis=-1)
  inside = (v >= t[..., :1]) & (v < t[..., -1:])
  assert bool(jnp.all(jnp.where(inside, a_lo <= v, True)))
  assert bool(jnp.all(jnp.where(inside, v < a_hi, True)))
  # Out of range clamps to the end indices.
  below = v < t[..., :1]
  above = v >= t[..., -1:]
  assert bool(jnp.all(jnp.where(below, (lo == 0) & (hi == 0), True)))
  last = t.shape[-1] - 1
  assert bool(jnp.all(jnp.where(above, (lo == last) & (hi == last), True)))


@pytest.mark.parametrize('seed', SEEDS)
@pytest.mark.parametrize('single_jitter', [False, True])
def test_sample_in_domain_and_sorted(seed, single_jitter):
  t, w = _random_stepfn(seed)
  logits = jnp.log(w + 0.01)
  for key in [None, jax.random.PRNGKey(seed)]:
    s = stepfun.sample(key, t, logits, 32, single_jitter=single_jitter)
    assert s.shape == (t.shape[0], 32)
    assert bool(jnp.all(s >= t[..., :1] - 1e-6))
    assert bool(jnp.all(s <= t[..., -1:] + 1e-6))
    assert bool(jnp.all(jnp.diff(s, axis=-1) >= -1e-6)), 'samples not sorted'


@pytest.mark.parametrize('seed', SEEDS)
def test_sample_intervals_fenceposts(seed):
  t, w = _random_stepfn(seed)
  logits = jnp.log(w + 0.01)
  iv = stepfun.sample_intervals(jax.random.PRNGKey(seed), t, logits, 16,
                                single_jitter=True, domain=(0.0, 1.0))
  assert iv.shape == (t.shape[0], 17)
  assert bool(jnp.all(jnp.diff(iv, axis=-1) >= -1e-6))
  assert bool(jnp.all(iv >= -1e-6)) and bool(jnp.all(iv <= 1.0 + 1e-6))


@pytest.mark.parametrize('seed', SEEDS)
def test_max_dilate_contains_and_dominates(seed):
  t, w = _random_stepfn(seed)
  p = stepfun.weight_to_pdf(t, w)
  td, pd = stepfun.max_dilate(t, p, 0.05, domain=(0.0, 1.0))
  assert bool(jnp.all(jnp.diff(td, axis=-1) >= -1e-6)), 'dilated t unsorted'
  # Max-dilation dominates: querying the dilated fn at original interval
  # midpoints gives at least the original pdf there (within fp).
  mids = (t[..., :-1] + t[..., 1:]) / 2
  q = stepfun.query(mids, td, pd)
  strict_inside = (mids > td[..., :1] + 1e-6) & (mids < td[..., -1:] - 1e-6)
  nonzero_width = (t[..., 1:] - t[..., :-1]) > 1e-6
  check = strict_inside & nonzero_width
  assert bool(jnp.all(jnp.where(check, q >= p - 1e-4, True)))


@pytest.mark.parametrize('seed', SEEDS)
def test_integrate_weights_cdf_shape(seed):
  _, w = _random_stepfn(seed)
  cw = stepfun.integrate_weights(w / jnp.maximum(
      w.sum(-1, keepdims=True), 1e-6))
  assert bool(jnp.all(cw[..., 0] == 0.0))
  assert bool(jnp.all(cw[..., -1] == 1.0))
  assert bool(jnp.all(jnp.diff(cw, axis=-1) >= -1e-6))


@pytest.mark.parametrize('seed', SEEDS)
def test_resample_conserves_mass(seed):
  tp, vp = _random_stepfn(seed)
  # New endpoints strictly containing the support: total mass must be
  # conserved. (Endpoints exactly ON a duplicated boundary endpoint can
  # drop that zero-width interval's mass - an interp-side-choice artifact
  # shared with the reference formulation.)
  t = jnp.broadcast_to(jnp.linspace(-0.1, 1.1, 9), (tp.shape[0], 9))
  v = stepfun.resample(t, tp, vp)
  np.testing.assert_allclose(v.sum(-1), vp.sum(-1), atol=1e-4, rtol=1e-4)
  # Resampling onto the same endpoints is the identity - for strictly
  # positive widths. (With zero-width intervals the op merges their mass
  # into a neighbor, which conserves total mass but is not elementwise
  # identity; the generator above includes such intervals on purpose.)
  tp2, vp2 = _random_stepfn(1000 + seed, zero_width_frac=0.0)
  v_same = stepfun.resample(tp2, tp2, vp2)
  np.testing.assert_allclose(v_same, vp2, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize('seed', SEEDS)
def test_distortion_nonnegative_and_zero_for_point_mass(seed):
  t, w = _random_stepfn(seed)
  loss = stepfun.lossfun_distortion(t, w)
  assert bool(jnp.all(loss >= -1e-6))
  # All mass in one zero-width interval -> zero distortion.
  t0 = jnp.broadcast_to(
      jnp.asarray([0.0, 0.3, 0.3, 1.0]), (2, 4))
  w0 = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (2, 3))
  np.testing.assert_allclose(stepfun.lossfun_distortion(t0, w0),
                             np.zeros(2), atol=1e-6)


@pytest.mark.parametrize('seed', SEEDS)
def test_weighted_percentile_brackets_support(seed):
  t, w = _random_stepfn(seed)
  wp = stepfun.weighted_percentile(
      t, w / jnp.maximum(w.sum(-1, keepdims=True), 1e-6), [5, 50, 95])
  assert bool(jnp.all(wp >= t[..., :1] - 1e-6))
  assert bool(jnp.all(wp <= t[..., -1:] + 1e-6))
  assert bool(jnp.all(jnp.diff(wp, axis=-1) >= -1e-6))


def test_single_stratified_sample():
  """num_samples=1 with an rng jitters within the whole domain instead of
  dividing by zero (regression)."""
  t = jnp.asarray([0.0, 1.0, 2.0, 3.0])
  logits = jnp.asarray([0.0, 0.0, 0.0])
  s = stepfun.sample(jax.random.PRNGKey(0), t, logits, 1)
  assert s.shape == (1,)
  assert 0.0 <= float(s[0]) <= 3.0
