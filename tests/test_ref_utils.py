import jax.numpy as jnp
import numpy as np

from refnerf_tpu.ops import ref_utils


def _rand_dirs(rng, n):
  v = rng.randn(n, 3).astype(np.float32)
  return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_reflect_preserves_norm_and_dot():
  rng = np.random.RandomState(0)
  v = _rand_dirs(rng, 64)
  n = _rand_dirs(rng, 64)
  u = np.asarray(ref_utils.reflect(jnp.asarray(v), jnp.asarray(n)))
  np.testing.assert_allclose(np.linalg.norm(u, axis=-1), 1.0, atol=1e-5)
  np.testing.assert_allclose((u * n).sum(-1), (v * n).sum(-1), atol=1e-5)


def test_reflect_normal_incidence():
  v = jnp.array([[0.0, 0.0, 1.0]])
  n = jnp.array([[0.0, 0.0, 1.0]])
  u = np.asarray(ref_utils.reflect(v, n))
  np.testing.assert_allclose(u, [[0.0, 0.0, 1.0]], atol=1e-6)


def test_l2_normalize():
  x = jnp.array([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]])
  y = np.asarray(ref_utils.l2_normalize(x))
  np.testing.assert_allclose(y[0], [0.6, 0.8, 0.0], atol=1e-6)
  assert np.all(np.isfinite(y[1]))  # zero vector stays finite


def test_compute_weighted_mae_zero_for_identical():
  rng = np.random.RandomState(1)
  n = _rand_dirs(rng, 32)
  w = rng.uniform(0.1, 1, size=(32,)).astype(np.float32)
  mae = float(ref_utils.compute_weighted_mae(
      jnp.asarray(w), jnp.asarray(n), jnp.asarray(n)))
  assert mae < 0.2  # degrees


def test_compute_weighted_mae_ninety_degrees():
  n0 = jnp.array([[1.0, 0.0, 0.0]])
  n1 = jnp.array([[0.0, 1.0, 0.0]])
  w = jnp.array([1.0])
  mae = float(ref_utils.compute_weighted_mae(w, n0, n1))
  assert np.isclose(mae, 90.0, atol=0.1)


def _ide_oracle(xyz, kappa_inv, deg_view):
  """Naive complex-arithmetic IDE oracle (mirrors Ref-NeRF Eqs 6-8)."""
  ml_array = ref_utils.get_ml_array(deg_view)
  l_max = 2 ** (deg_view - 1)
  mat = np.zeros((l_max + 1, ml_array.shape[1]))
  for i, (m, l) in enumerate(ml_array.T):
    for k in range(l - m + 1):
      mat[k, i] = ref_utils.sph_harm_coeff(l, m, k)
  x, y, z = xyz[..., 0:1], xyz[..., 1:2], xyz[..., 2:3]
  vmz = np.concatenate([z**i for i in range(mat.shape[0])], axis=-1)
  vmxy = np.concatenate(
      [(x + 1j * y)**m for m in ml_array[0, :]], axis=-1)
  sph_harms = vmxy * (vmz @ mat)
  sigma = 0.5 * ml_array[1, :] * (ml_array[1, :] + 1)
  ide = sph_harms * np.exp(-sigma * kappa_inv)
  return np.concatenate([np.real(ide), np.imag(ide)], axis=-1)


def test_ide_matches_complex_oracle():
  rng = np.random.RandomState(2)
  for deg_view in [1, 2, 4, 5]:
    xyz = _rand_dirs(rng, 16)
    kappa_inv = rng.uniform(0, 1, size=(16, 1)).astype(np.float32)
    fn = ref_utils.generate_ide_fn(deg_view)
    got = np.asarray(fn(jnp.asarray(xyz), jnp.asarray(kappa_inv)))
    want = _ide_oracle(xyz.astype(np.float64), kappa_inv.astype(np.float64),
                       deg_view)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ide_output_dim():
  # deg_view=5: sum over l in {1,2,4,8,16} of (l+1) pairs = 36, x2 for re/im.
  fn = ref_utils.generate_ide_fn(5)
  out = fn(jnp.ones((2, 3)) / np.sqrt(3), jnp.zeros((2, 1)))
  assert out.shape == (2, 72)


def test_ide_attenuation_kills_high_degrees():
  rng = np.random.RandomState(3)
  xyz = _rand_dirs(rng, 4)
  fn = ref_utils.generate_ide_fn(3)
  sharp = np.asarray(fn(jnp.asarray(xyz), jnp.zeros((4, 1))))
  rough = np.asarray(fn(jnp.asarray(xyz), 100 * jnp.ones((4, 1))))
  # Very rough surfaces -> encoding decays toward zero.
  assert np.abs(rough).max() < np.abs(sharp).max()
  assert np.abs(rough).max() < 1e-3


def test_dir_enc_fn_is_zero_roughness_ide():
  rng = np.random.RandomState(4)
  xyz = _rand_dirs(rng, 8)
  ide = ref_utils.generate_ide_fn(4)
  de = ref_utils.generate_dir_enc_fn(4)
  np.testing.assert_allclose(
      np.asarray(de(jnp.asarray(xyz))),
      np.asarray(ide(jnp.asarray(xyz), jnp.zeros((8, 1)))), atol=1e-6)


def test_orientation_loss_terms_zero_for_front_facing():
  # Normal pointing at the camera -> no penalty.
  w = jnp.ones((1, 4))
  n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (1, 4, 3))
  v = jnp.array([[0.0, 0.0, 1.0]])
  terms = np.asarray(ref_utils.orientation_loss_terms(w, n, v))
  np.testing.assert_allclose(terms, 0.0)
  # Back-facing -> quadratic penalty.
  terms2 = np.asarray(ref_utils.orientation_loss_terms(w, -n, v))
  np.testing.assert_allclose(terms2, 1.0)
