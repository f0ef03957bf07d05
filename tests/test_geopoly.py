import numpy as np

from refnerf_tpu.ops import geopoly


def test_octahedron_tess1_is_axes():
  basis = geopoly.generate_basis('octahedron', 1)
  # With symmetry removal, the octahedron at tesselation 1 reduces to the
  # 3 coordinate axes (the identity basis used by shipped Ref-NeRF configs).
  assert basis.shape == (3, 3)
  # Each row is (+-) a coordinate axis, and the three axes are all present.
  abs_basis = np.abs(basis)
  np.testing.assert_allclose(abs_basis.max(axis=-1), 1.0, atol=1e-6)
  np.testing.assert_allclose(abs_basis.sum(axis=-1), 1.0, atol=1e-6)
  np.testing.assert_allclose(abs_basis.sum(axis=0), 1.0, atol=1e-6)


def test_unit_norm_vertices():
  for shape, tess in [('icosahedron', 2), ('octahedron', 2)]:
    basis = geopoly.generate_basis(shape, tess)
    norms = np.linalg.norm(basis, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_no_symmetric_duplicates():
  basis = geopoly.generate_basis('icosahedron', 2)
  d = geopoly.compute_sq_dist(basis.T, -basis.T)
  # No vertex equals the negation of another (or itself).
  assert np.min(d) > 1e-4


def test_icosahedron_tess2_size():
  basis = geopoly.generate_basis('icosahedron', 2)
  # 42 vertices total, 21 after removing antipodal pairs.
  assert basis.shape == (21, 3)


def test_compute_sq_dist_matches_naive():
  rng = np.random.RandomState(0)
  a = rng.randn(3, 5)
  b = rng.randn(3, 4)
  got = geopoly.compute_sq_dist(a, b)
  want = ((a.T[:, None, :] - b.T[None, :, :]) ** 2).sum(-1)
  np.testing.assert_allclose(got, want, atol=1e-8)
