"""Property tests for coord / ref_utils / mathx invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refnerf_tpu.ops import coord
from refnerf_tpu.ops import mathx
from refnerf_tpu.ops import ref_utils

SEEDS = [0, 1, 2]


def _unit(rng, shape):
  v = rng.randn(*shape).astype(np.float32)
  return v / np.linalg.norm(v, axis=-1, keepdims=True)


@pytest.mark.parametrize('seed', SEEDS)
def test_reflect_preserves_norm_and_involutes(seed):
  rng = np.random.RandomState(seed)
  v = _unit(rng, (64, 3))
  n = _unit(rng, (64, 3))
  r = ref_utils.reflect(v, n)
  np.testing.assert_allclose(np.linalg.norm(r, axis=-1), 1.0, atol=1e-5)
  # Reflection is an involution and preserves the normal component:
  np.testing.assert_allclose(ref_utils.reflect(r, n), v, atol=1e-5)
  np.testing.assert_allclose(np.sum(r * n, -1), np.sum(v * n, -1), atol=1e-5)


@pytest.mark.parametrize('seed', SEEDS)
def test_l2_normalize_unit_and_zero_safe(seed):
  rng = np.random.RandomState(seed)
  # Above the eps floor (sum_sq > float32 eps) normalization is genuine:
  x = rng.randn(32, 3).astype(np.float32) * 10 ** rng.uniform(-3, 3, (32, 1))
  u = ref_utils.l2_normalize(jnp.asarray(x))
  np.testing.assert_allclose(np.linalg.norm(u, axis=-1), 1.0, atol=1e-4)
  # Below it the grad-safe max(sum_sq, eps) denominator takes over
  # (reference internal/ref_utils.py:40-42): outputs shrink toward zero
  # and stay finite instead of dividing by ~0.
  tiny = ref_utils.l2_normalize(jnp.full((4, 3), 1e-8))
  assert bool(jnp.all(jnp.isfinite(tiny)))
  assert bool(jnp.all(jnp.linalg.norm(tiny, axis=-1) < 1e-3))
  z = ref_utils.l2_normalize(jnp.zeros((4, 3)))
  assert bool(jnp.all(jnp.isfinite(z)))


def test_contract_bounded_and_invertible():
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.randn(128, 3).astype(np.float32) *
                  10 ** rng.uniform(-2, 3, (128, 1)).astype(np.float32))
  z = coord.contract(x)
  assert bool(jnp.all(jnp.linalg.norm(z, axis=-1) <= 2.0 + 1e-5))
  np.testing.assert_allclose(coord.inv_contract(z), x, rtol=2e-3, atol=1e-4)
  # Inside the unit ball the contraction is the identity.
  inside = jnp.asarray(_unit(rng, (16, 3)) * 0.5)
  np.testing.assert_allclose(coord.contract(inside), inside, atol=1e-6)


@pytest.mark.parametrize('curve', [None, 'piecewise', 'reciprocal', 'log',
                                   'exp', 'sqrt', 'square'])
def test_ray_warps_bijective_and_normalized(curve):
  near = jnp.full((8, 1), 0.7)
  far = jnp.full((8, 1), 11.0)
  t_to_s, s_to_t = coord.construct_ray_warps(curve, near, far)
  np.testing.assert_allclose(t_to_s(near), 0.0, atol=1e-6)
  np.testing.assert_allclose(t_to_s(far), 1.0, atol=1e-6)
  s = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 33), (8, 33))
  t = s_to_t(s)
  assert bool(jnp.all(jnp.diff(t, axis=-1) > 0)), 'warp not monotone'
  np.testing.assert_allclose(t_to_s(t), s, atol=1e-4)


@pytest.mark.parametrize('seed', SEEDS)
def test_integrated_pos_enc_attenuates_with_variance(seed):
  rng = np.random.RandomState(seed)
  mean = jnp.asarray(rng.randn(16, 3).astype(np.float32))
  enc0 = coord.integrated_pos_enc(mean, jnp.zeros((16, 3)), 0, 6)
  enc1 = coord.integrated_pos_enc(mean, jnp.ones((16, 3)) * 5.0, 0, 6)
  # Zero variance reproduces the plain encoding's magnitude envelope;
  # large variance attenuates every feature toward zero.
  assert bool(jnp.all(jnp.abs(enc1) <= jnp.abs(enc0) + 1e-6))
  assert float(jnp.mean(jnp.abs(enc1))) < 0.1 * float(jnp.mean(jnp.abs(enc0)))
  assert bool(jnp.all(jnp.abs(enc0) <= 1.0 + 1e-6))


def test_safe_trig_finite_at_extreme_args():
  x = jnp.asarray([0.0, 1e6, -1e6, 1e10, -1e10, 3.7e15], jnp.float32)
  for f, ref in [(mathx.safe_sin, np.sin), (mathx.safe_cos, np.cos)]:
    y = f(x)
    assert bool(jnp.all(jnp.isfinite(y)))
    assert bool(jnp.all(jnp.abs(y) <= 1.0 + 1e-6))
    # Within the safe window it IS the trig function.
    small = jnp.asarray(np.linspace(-300.0, 300.0, 101), jnp.float32)
    np.testing.assert_allclose(f(small), ref(small), atol=1e-4)


@pytest.mark.parametrize('deg_view', [2, 4])
def test_ide_finite_and_roughness_attenuates(deg_view):
  rng = np.random.RandomState(0)
  d = jnp.asarray(_unit(rng, (32, 3)))
  ide_fn = ref_utils.generate_ide_fn(deg_view)
  sharp = ide_fn(d, jnp.zeros((32, 1)))
  rough = ide_fn(d, jnp.full((32, 1), 10.0))
  extreme = ide_fn(d, jnp.full((32, 1), 1e6))
  for e in (sharp, rough, extreme):
    assert bool(jnp.all(jnp.isfinite(e)))
  # vMF attenuation: roughness shrinks every band's energy.
  assert float(jnp.sum(rough ** 2)) < float(jnp.sum(sharp ** 2))
  # The l=1 bands and above vanish at extreme roughness.
  assert float(jnp.max(jnp.abs(extreme[..., 1:]))) < 1e-3


@pytest.mark.parametrize('seed', SEEDS)
def test_dir_enc_matches_ide_at_zero_roughness(seed):
  rng = np.random.RandomState(seed)
  d = jnp.asarray(_unit(rng, (16, 3)))
  ide = ref_utils.generate_ide_fn(3)(d, jnp.zeros((16, 1)))
  de = ref_utils.generate_dir_enc_fn(3)(d)
  np.testing.assert_allclose(ide, de, atol=1e-5)
