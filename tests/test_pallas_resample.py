"""The Pallas resampling kernel must match the jnp stepfun reference exactly
(interpret mode on CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refnerf_tpu.ops import stepfun
from refnerf_tpu.ops.pallas import resample


def _cases():
  rng = np.random.RandomState(0)
  cases = []
  for b, n, m in [(8, 16, 8), (256, 32, 16), (300, 128, 128)]:
    t = np.sort(rng.uniform(0, 1, (b, n + 1)), -1).astype(np.float32)
    t[:, 0], t[:, -1] = 0.0, 1.0
    logits = rng.randn(b, n).astype(np.float32)
    cases.append((t, logits, m))
  return cases


@pytest.mark.parametrize('case', range(3))
def test_matches_stepfun(case, monkeypatch):
  # On CPU the kernel runs via the Pallas interpreter.
  from jax.experimental import pallas as pl
  t, logits, m = _cases()[case]
  with jax.disable_jit():
    pass
  ref = np.asarray(stepfun.sample_intervals(
      None, jnp.asarray(t), jnp.asarray(logits), m, domain=(0.0, 1.0)))
  import functools
  from unittest import mock
  orig = pl.pallas_call
  with mock.patch.object(pl, 'pallas_call',
                         functools.partial(orig, interpret=True)):
    got = np.asarray(resample.sample_intervals_pallas(
        jnp.asarray(t), jnp.asarray(logits), m, domain=(0.0, 1.0)))
  np.testing.assert_allclose(got, ref, atol=2e-6)


def test_handles_neg_inf_logits(monkeypatch):
  from jax.experimental import pallas as pl
  import functools
  from unittest import mock
  rng = np.random.RandomState(1)
  t = np.sort(rng.uniform(0, 1, (8, 9)), -1).astype(np.float32)
  logits = rng.randn(8, 8).astype(np.float32)
  logits[:, ::2] = -np.inf  # zero-width intervals
  ref = np.asarray(stepfun.sample_intervals(
      None, jnp.asarray(t), jnp.asarray(logits), 8, domain=(0.0, 1.0)))
  orig = pl.pallas_call
  with mock.patch.object(pl, 'pallas_call',
                         functools.partial(orig, interpret=True)):
    got = np.asarray(resample.sample_intervals_pallas(
        jnp.asarray(t), jnp.asarray(logits), 8, domain=(0.0, 1.0)))
  assert np.all(np.isfinite(got))
  np.testing.assert_allclose(got, ref, atol=2e-6)
