import jax
import jax.numpy as jnp
import numpy as np

from refnerf_tpu.ops import coord


def test_contract_identity_inside_unit_ball():
  x = jnp.array([[0.1, 0.2, -0.3], [0.0, 0.0, 0.5]])
  np.testing.assert_allclose(coord.contract(x), x, atol=1e-6)


def test_contract_bounded_by_2():
  x = jnp.array([[100.0, 0.0, 0.0], [50.0, 50.0, 50.0]])
  z = np.asarray(coord.contract(x))
  assert np.all(np.linalg.norm(z, axis=-1) < 2.0)


def test_inv_contract_roundtrip():
  rng = np.random.RandomState(0)
  x = rng.uniform(-3, 3, size=(32, 3)).astype(np.float32)
  z = coord.contract(jnp.asarray(x))
  x2 = np.asarray(coord.inv_contract(z))
  np.testing.assert_allclose(x2, x, rtol=1e-4, atol=1e-4)


def test_construct_ray_warps_identity():
  t_to_s, s_to_t = coord.construct_ray_warps(None, jnp.asarray(2.0),
                                             jnp.asarray(6.0))
  np.testing.assert_allclose(t_to_s(jnp.asarray(2.0)), 0.0, atol=1e-6)
  np.testing.assert_allclose(t_to_s(jnp.asarray(6.0)), 1.0, atol=1e-6)
  np.testing.assert_allclose(s_to_t(jnp.asarray(0.5)), 4.0, atol=1e-6)


def test_construct_ray_warps_reciprocal_roundtrip():
  t_to_s, s_to_t = coord.construct_ray_warps('reciprocal', jnp.asarray(1.0),
                                             jnp.asarray(100.0))
  t = jnp.linspace(1.0, 100.0, 17)
  np.testing.assert_allclose(s_to_t(t_to_s(t)), t, rtol=1e-4)


def test_construct_ray_warps_piecewise_allows_zero_near():
  t_to_s, s_to_t = coord.construct_ray_warps('piecewise', jnp.asarray(0.0),
                                             jnp.asarray(10.0))
  s = t_to_s(jnp.array([0.0, 1.0, 10.0]))
  assert np.all(np.isfinite(np.asarray(s)))
  t = s_to_t(s)
  np.testing.assert_allclose(t, [0.0, 1.0, 10.0], atol=1e-5)


def test_expected_sin_variance_attenuates():
  m = jnp.asarray(1.3)
  assert float(coord.expected_sin(m, jnp.asarray(0.0))) == float(jnp.sin(m))
  assert abs(float(coord.expected_sin(m, jnp.asarray(100.0)))) < 1e-6


def test_integrated_pos_enc_zero_var_matches_pos_enc():
  rng = np.random.RandomState(1)
  x = rng.uniform(-1, 1, size=(8, 3)).astype(np.float32)
  ipe = np.asarray(coord.integrated_pos_enc(
      jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)), 0, 4))
  pe = np.asarray(coord.pos_enc(jnp.asarray(x), 0, 4, append_identity=False))
  np.testing.assert_allclose(ipe, pe, atol=1e-5)


def test_integrated_pos_enc_shape():
  mean = jnp.zeros((5, 7, 3))
  var = jnp.ones((5, 7, 3))
  enc = coord.integrated_pos_enc(mean, var, 0, 12)
  assert enc.shape == (5, 7, 2 * 3 * 12)


def test_lift_and_diagonalize_identity_basis():
  rng = np.random.RandomState(2)
  mean = rng.randn(4, 3).astype(np.float32)
  a = rng.randn(4, 3, 3).astype(np.float32)
  cov = a @ np.swapaxes(a, -1, -2)
  basis = jnp.eye(3)
  m2, v2 = coord.lift_and_diagonalize(jnp.asarray(mean), jnp.asarray(cov),
                                      basis)
  np.testing.assert_allclose(m2, mean, rtol=1e-5)
  np.testing.assert_allclose(
      np.asarray(v2), np.diagonal(cov, axis1=-2, axis2=-1), rtol=1e-4)


def test_track_linearize_linear_function_exact():
  # For a linear fn, the linearization is exact: cov' = A cov A^T.
  rng = np.random.RandomState(3)
  amat = rng.randn(3, 3).astype(np.float32)
  fn = lambda x: x @ amat.T
  mean = rng.randn(5, 3).astype(np.float32)
  s = rng.randn(5, 3, 3).astype(np.float32)
  cov = s @ np.swapaxes(s, -1, -2)
  fn_mean, fn_cov = coord.track_linearize(fn, jnp.asarray(mean),
                                          jnp.asarray(cov))
  np.testing.assert_allclose(fn_mean, mean @ amat.T, rtol=1e-4, atol=1e-4)
  want = np.einsum('ij,bjk,lk->bil', amat, cov, amat)
  np.testing.assert_allclose(np.asarray(fn_cov), want, rtol=1e-3, atol=1e-3)
