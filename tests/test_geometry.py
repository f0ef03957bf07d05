"""Mesh extraction (refnerf_tpu/geometry.py): marching-tetrahedra
correctness on analytic fields, density-grid plumbing through the real
MLP, and the PLY round trip."""

import numpy as np

from refnerf_tpu import geometry


def _sphere_grid(n=48, r=1.0, extent=1.6):
  ax = np.linspace(-extent, extent, n)
  x, y, z = np.meshgrid(ax, ax, ax, indexing='ij')
  # Smooth density: high inside, ~0 outside (logistic in signed distance).
  d = r - np.sqrt(x * x + y * y + z * z)
  grid = 100.0 / (1.0 + np.exp(-d / 0.05))
  spacing = 2 * extent / (n - 1)
  return grid, (-extent, -extent, -extent), spacing


def test_sphere_surface_accuracy():
  grid, origin, spacing = _sphere_grid()
  verts, faces, normals = geometry.marching_tetrahedra(
      grid, 50.0, origin, spacing)
  assert len(verts) > 500 and len(faces) > 500
  radii = np.linalg.norm(verts, axis=-1)
  # Every vertex sits on the r=1 sphere to within a lattice step.
  np.testing.assert_allclose(radii, 1.0, atol=spacing)
  assert abs(float(radii.mean()) - 1.0) < spacing / 4


def test_sphere_watertight_and_oriented():
  grid, origin, spacing = _sphere_grid(n=32)
  verts, faces, normals = geometry.marching_tetrahedra(
      grid, 50.0, origin, spacing)
  # Watertight: every undirected edge is shared by exactly two faces.
  edges = np.concatenate(
      [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0)
  edges = np.sort(edges, axis=-1)
  _, counts = np.unique(edges, axis=0, return_counts=True)
  assert (counts == 2).all()

  # Normals point outward on a sphere centered at the origin...
  vn = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
  assert float((vn * normals).sum(-1).min()) > 0.9
  # ...and face winding is counter-clockwise seen from outside.
  v0, v1, v2 = (verts[faces[:, i]].astype(np.float64) for i in range(3))
  fn = np.cross(v1 - v0, v2 - v0)
  centroid = (v0 + v1 + v2) / 3
  assert float((fn * centroid).sum(-1).min()) > 0

  # Total area approximates 4*pi*r^2 (tet meshes slightly overtessellate,
  # the area itself converges).
  area = 0.5 * np.linalg.norm(fn, axis=-1).sum()
  assert abs(area / (4 * np.pi) - 1) < 0.05


def test_empty_and_full_grids():
  grid = np.zeros((8, 8, 8))
  verts, faces, normals = geometry.marching_tetrahedra(grid, 0.5)
  assert len(verts) == 0 and len(faces) == 0
  verts, faces, _ = geometry.marching_tetrahedra(grid + 1.0, 0.5)
  assert len(faces) == 0  # fully inside: no crossing anywhere


def test_ply_roundtrip(tmp_path):
  grid, origin, spacing = _sphere_grid(n=24)
  verts, faces, normals = geometry.marching_tetrahedra(
      grid, 50.0, origin, spacing)
  path = str(tmp_path / 'mesh.ply')
  geometry.write_ply(path, verts, faces, normals)
  back = geometry.read_ply(path)
  np.testing.assert_allclose(back['verts'], verts, rtol=1e-6)
  np.testing.assert_array_equal(back['faces'], faces)
  np.testing.assert_allclose(back['normals'], normals, rtol=1e-6)


def test_density_grid_through_model():
  """Plumbing: the grid evaluates the real NerfMLP density head (chunked,
  padded tail) and extract_mesh runs end to end on an untrained model."""
  import jax

  from refnerf_tpu import configs as configs_lib
  from refnerf_tpu.models import construct
  import __graft_entry__ as ge

  config, gin = configs_lib.parse(None, [ge._tiny_bindings()])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)

  out = geometry.extract_mesh(model, params, resolution=17,
                              lower=(-1, -1, -1), upper=(1, 1, 1),
                              iso=0.5, chunk=1024)  # 17^3 pads the tail
  grid = out['grid']
  assert grid.shape == (17, 17, 17)
  assert np.isfinite(grid).all() and (grid >= 0).all()
  # An untrained field is roughly constant; whatever the iso relation, the
  # extraction must return consistent arrays.
  assert out['verts'].shape[1] == 3 and out['faces'].shape[1] == 3


def test_vertex_colors_and_colored_ply(tmp_path):
  """Diffuse vertex colors query the spatial stage's diffuse head and
  survive the uchar PLY round trip."""
  import jax

  from refnerf_tpu import configs as configs_lib
  from refnerf_tpu.models import construct
  import __graft_entry__ as ge

  config, gin = configs_lib.parse(None, [ge._tiny_bindings()])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)

  verts = np.random.RandomState(0).uniform(-1, 1, (37, 3)).astype(np.float32)
  colors = geometry.vertex_colors(model, params, verts, footprint=0.1,
                                  chunk=16)  # forces a padded tail
  assert colors.shape == (37, 3)
  assert (colors >= 0).all() and (colors <= 1).all()

  grid, origin, spacing = _sphere_grid(n=16)
  v, f, n = geometry.marching_tetrahedra(grid, 50.0, origin, spacing)
  c = np.random.RandomState(1).uniform(0, 1, (len(v), 3))
  path = str(tmp_path / 'colored.ply')
  geometry.write_ply(path, v, f, n, colors=c)
  back = geometry.read_ply(path)
  np.testing.assert_allclose(back['verts'], v, rtol=1e-6)
  np.testing.assert_allclose(back['normals'], n, rtol=1e-6)
  np.testing.assert_allclose(back['colors'], c, atol=1 / 255)


def test_random_fields_manifold_property():
  """On arbitrary smooth fields the extracted surface is a closed 2-manifold
  clipped by the grid box: every undirected edge borders exactly 2 faces,
  except edges whose both endpoints lie on the outermost cell layer (the
  clip boundary), which may border 1."""
  rng = np.random.RandomState(7)
  for trial in range(3):
    raw = rng.randn(6, 6, 6)
    # Smooth by separable box blur to get coherent crossings.
    k = np.ones(3) / 3
    grid = raw
    for ax in range(3):
      grid = np.apply_along_axis(
          lambda m: np.convolve(m, k, mode='same'), ax, grid)
    # Upsample by trilinear interpolation to a finer lattice.
    fine = 25
    pts = np.stack(np.meshgrid(*[np.linspace(0, 5, fine)] * 3,
                               indexing='ij'), axis=-1).reshape(-1, 3)
    grid_f = geometry._trilinear(grid[..., None], pts)[:, 0].reshape(
        fine, fine, fine)

    verts, faces, normals = geometry.marching_tetrahedra(grid_f, 0.0)
    if len(faces) == 0:
      continue
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0)
    edges = np.sort(edges, axis=-1)
    uniq, counts = np.unique(edges, axis=0, return_counts=True)
    assert counts.max() <= 2, 'non-manifold edge'
    boundary = ((verts < 1.0) | (verts > fine - 2.0)).any(-1)
    dangling = counts == 1
    assert (boundary[uniq[dangling, 0]] & boundary[uniq[dangling, 1]]).all()
    assert np.isfinite(verts).all() and np.isfinite(normals).all()
