"""Mesh extraction from a trained density field (beyond-reference feature).

The reference renders images only; downstream users routinely want the
geometry (relighting, collision, DCC import). This module evaluates the
NerfMLP density head on a 3D grid (chunked jit, TPU-friendly) and extracts
an isosurface as a triangle mesh with density-gradient normals, written as
PLY.

Isosurfacing is **marching tetrahedra**, not marching cubes: each grid cell
splits into 6 tetrahedra around its main diagonal, and the 16 per-tet cases
are derived programmatically from the inside/outside bit pattern (one
triangle for 1-or-3 inside corners, a split quad for 2) - no opaque
256-entry tables to get subtly wrong, no ambiguous saddle cases, and the
6-tet decomposition is face-consistent across neighboring cells so the
surface is crack-free. Triangle orientation is fixed afterwards against the
interpolated density gradient (outward = decreasing density), which also
provides per-vertex normals.
"""

from __future__ import annotations

import numpy as np

# Cube corners in bit order (x, y, z).
_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.int64)

# Face-consistent 6-tetrahedron decomposition around the 0-6 main diagonal:
# every face diagonal it induces coincides with the neighboring cell's.
_TETS = np.array([
    [0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6],
    [0, 7, 4, 6], [0, 4, 5, 6], [0, 5, 1, 6]], np.int64)


def _tet_case_table():
  """tris[case] = list of triangles; each triangle = 3 (inside, outside)
  local-corner edge pairs whose iso-crossings form the triangle."""
  table = []
  for case in range(16):
    ins = [i for i in range(4) if case >> i & 1]
    outs = [i for i in range(4) if not case >> i & 1]
    if len(ins) == 1:
      e = [(ins[0], o) for o in outs]
      tris = [(e[0], e[1], e[2])]
    elif len(ins) == 3:
      e = [(i, outs[0]) for i in ins]
      tris = [(e[0], e[1], e[2])]
    elif len(ins) == 2:
      (i1, i2), (o1, o2) = ins, outs
      a, b, c, d = (i1, o1), (i1, o2), (i2, o1), (i2, o2)
      tris = [(a, b, c), (c, b, d)]
    else:
      tris = []
    table.append(tris)
  return table


_CASES = _tet_case_table()


def marching_tetrahedra(grid, iso, origin=(0., 0., 0.), spacing=1.0):
  """Extract the `grid > iso` isosurface as a vertex-deduplicated mesh.

  Args:
    grid: [nx, ny, nz] scalar field sampled on a regular lattice.
    iso: isovalue.
    origin: world position of grid[0, 0, 0].
    spacing: scalar or [3] lattice step.

  Returns:
    (verts [V, 3] float32 world positions, faces [F, 3] int32 indices,
     normals [V, 3] float32 outward unit normals). Faces wind
    counter-clockwise seen from outside (normal side).
  """
  grid = np.asarray(grid, np.float64)
  nx, ny, nz = grid.shape
  origin = np.asarray(origin, np.float64)
  spacing = np.broadcast_to(np.asarray(spacing, np.float64), (3,))

  # Global vertex ids and flat values.
  flat = grid.ravel()
  ix, iy, iz = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                           np.arange(nz - 1), indexing='ij')
  base = (ix * ny + iy) * nz + iz  # [Ncells] id of corner 0
  base = base.ravel()
  corner_gid = (base[:, None]
                + ((_CORNERS[:, 0] * ny + _CORNERS[:, 1]) * nz
                   + _CORNERS[:, 2])[None, :])  # [Ncells, 8]

  edge_keys, edge_tvals, tri_edge_keys = [], [], []
  for tet in _TETS:
    gid = corner_gid[:, tet]                       # [N, 4]
    val = flat[gid]                                # [N, 4]
    inside = val > iso
    case = (inside @ np.array([1, 2, 4, 8])).astype(np.int64)
    for c in range(1, 15):
      tris = _CASES[c]
      if not tris:
        continue
      sel = np.nonzero(case == c)[0]
      if sel.size == 0:
        continue
      for tri in tris:
        tri_keys = []
        for (a, b) in tri:
          ga, gb = gid[sel, a], gid[sel, b]
          va, vb = val[sel, a], val[sel, b]
          t = (iso - va) / (vb - va)               # va>iso>=vb => finite
          key = (np.minimum(ga, gb).astype(np.int64) * (nx * ny * nz)
                 + np.maximum(ga, gb))
          # Canonical t (measured from the min-gid endpoint) so shared
          # edges dedup to one vertex position.
          t_canon = np.where(ga <= gb, t, 1.0 - t)
          edge_keys.append(key)
          edge_tvals.append(t_canon)
          tri_keys.append(key)
        tri_edge_keys.append(np.stack(tri_keys, axis=-1))  # [n, 3]

  if not tri_edge_keys:
    return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
            np.zeros((0, 3), np.float32))

  all_keys = np.concatenate(edge_keys)
  all_t = np.concatenate(edge_tvals)
  tri_keys = np.concatenate(tri_edge_keys, axis=0)   # [F, 3]

  uniq_keys, first = np.unique(all_keys, return_index=True)
  uniq_t = all_t[first]
  ga = uniq_keys // (nx * ny * nz)
  gb = uniq_keys % (nx * ny * nz)

  def gid_to_xyz(g):
    z = g % nz
    y = (g // nz) % ny
    x = g // (ny * nz)
    return np.stack([x, y, z], axis=-1).astype(np.float64)

  pa, pb = gid_to_xyz(ga), gid_to_xyz(gb)
  verts_lattice = pa + uniq_t[:, None] * (pb - pa)
  verts = (origin + verts_lattice * spacing).astype(np.float32)

  faces = np.searchsorted(uniq_keys, tri_keys).astype(np.int32)
  # A triangle's three (inside, outside) corner pairs are distinct
  # unordered lattice edges, so its three vertex indices are always
  # distinct. Corners sitting exactly on the isovalue can still yield
  # zero-AREA slivers (distinct edges crossing at a shared corner); they
  # are topologically consistent and harmless, so they are kept.

  # Outward normals: -gradient (density decreases outward), trilinearly
  # interpolated at the vertices; then orient faces to match.
  grads = np.stack(np.gradient(grid), axis=-1) / spacing  # [nx,ny,nz,3]
  g = _trilinear(grads, verts_lattice)
  normals = -g
  norm = np.linalg.norm(normals, axis=-1, keepdims=True)
  normals = (normals / np.maximum(norm, 1e-12)).astype(np.float32)

  v0, v1, v2 = (verts[faces[:, i]].astype(np.float64) for i in range(3))
  face_n = np.cross(v1 - v0, v2 - v0)
  face_ref = normals[faces[:, 0]] + normals[faces[:, 1]] + normals[faces[:, 2]]
  flip = (face_n * face_ref).sum(-1) < 0
  faces[flip] = faces[flip][:, [0, 2, 1]]
  return verts, faces, normals


def _trilinear(field, pts):
  """field: [nx, ny, nz, C]; pts: [N, 3] in lattice coords -> [N, C]."""
  nx, ny, nz = field.shape[:3]
  p = np.clip(pts, 0, [nx - 1, ny - 1, nz - 1])
  p0 = np.clip(np.floor(p).astype(np.int64), 0,
               [nx - 2, ny - 2, nz - 2])
  f = p - p0
  out = 0.0
  for dx in (0, 1):
    for dy in (0, 1):
      for dz in (0, 1):
        w = ((f[:, 0] if dx else 1 - f[:, 0])
             * (f[:, 1] if dy else 1 - f[:, 1])
             * (f[:, 2] if dz else 1 - f[:, 2]))
        out = out + w[:, None] * field[p0[:, 0] + dx, p0[:, 1] + dy,
                                       p0[:, 2] + dz]
  return out


def density_grid(model, params, resolution, lower, upper, chunk=2 ** 16):
  """Evaluate the NerfMLP density on a regular grid (chunked jit).

  Queries `MLP.predict_density` directly with per-point Gaussians whose
  diagonal covariance matches the lattice spacing (the IPE scale a ray
  sample at that footprint would see), so the field is the one training
  actually shaped.

  Returns [R, R, R] float32 densities (post-activation, incl. bias).
  """
  import jax
  import jax.numpy as jnp

  mlp = model.nerf_mlp
  key = next(k for k in params if 'nerf' in k.lower())
  sub = {'params': params[key]}
  lower = np.asarray(lower, np.float32)
  upper = np.asarray(upper, np.float32)
  spacing = (upper - lower) / (resolution - 1)
  var = np.float32((spacing.mean() / 2.0) ** 2)

  @jax.jit
  def run(pts):
    means = pts[:, None, :]
    covs = jnp.full(means.shape, var, means.dtype)
    raw, _ = mlp.apply(sub, means, covs, method=type(mlp).predict_density)
    return mlp.density_activation(raw[:, 0] + mlp.density_bias)

  axes = [np.linspace(lower[i], upper[i], resolution, dtype=np.float32)
          for i in range(3)]
  pts = np.stack(np.meshgrid(*axes, indexing='ij'), axis=-1).reshape(-1, 3)
  out = np.empty((pts.shape[0],), np.float32)
  # Fixed chunk => one compile; pad the tail.
  for i in range(0, pts.shape[0], chunk):
    block = pts[i:i + chunk]
    n = block.shape[0]
    if n < chunk:
      block = np.concatenate(
          [block, np.zeros((chunk - n, 3), np.float32)], axis=0)
    out[i:i + n] = np.asarray(run(jnp.asarray(block)))[:n]
  return out.reshape(resolution, resolution, resolution)


def vertex_colors(model, params, verts, footprint, chunk=2 ** 16):
  """Per-vertex diffuse albedo from the spatial stage (view-independent).

  Ref-NeRF's use_diffuse_color head is exactly the texture a mesh wants:
  sigmoid(raw - log 3) (+ the model's sRGB mapping), no view direction
  involved (mlp.py color combine). Returns [V, 3] float32 in [0, 1], or
  None when the model has no diffuse head.
  """
  import flax.linen as nn
  import jax
  import jax.numpy as jnp

  from refnerf_tpu.ops import image as image_ops

  mlp = model.nerf_mlp
  if not (mlp.use_diffuse_color and not mlp.disable_rgb):
    return None
  key = next(k for k in params if 'nerf' in k.lower())
  sub = {'params': params[key]}
  var = np.float32((float(footprint) / 2.0) ** 2)

  def diffuse(module, means, covs):
    _, x = module.predict_density(means, covs)
    d = nn.sigmoid(module.raw_rgb_diffuse_layer(x) - jnp.log(3.0))
    if module.srgb_mapping:
      d = jnp.clip(image_ops.linear_to_srgb(d), 0.0, 1.0)
    return d

  @jax.jit
  def run(pts):
    means = pts[:, None, :]
    covs = jnp.full(means.shape, var, means.dtype)
    return mlp.apply(sub, means, covs, method=diffuse)[:, 0, :]

  verts = np.asarray(verts, np.float32)
  out = np.empty((verts.shape[0], 3), np.float32)
  for i in range(0, verts.shape[0], chunk):
    block = verts[i:i + chunk]
    n = block.shape[0]
    if n < chunk:
      block = np.concatenate(
          [block, np.zeros((chunk - n, 3), np.float32)], axis=0)
    out[i:i + n] = np.asarray(run(jnp.asarray(block)))[:n]
  return out


def extract_mesh(model, params, resolution=128, lower=(-1.5, -1.5, -1.5),
                 upper=(1.5, 1.5, 1.5), iso=25.0, chunk=2 ** 16,
                 colors=True):
  """density_grid + marching_tetrahedra (+ diffuse vertex colors) in world
  coordinates.

  iso=25 calibrated on the 25k protocol checkpoint against its analytic
  scene: isos 10-25 put >99% of vertices within one lattice step of the
  true surface (median |err| ~ step/5), 50 biases ~0.05 inside, and the
  field midpoint lands far inside the density ramp. (sigma=25 is also
  where a typical sample interval of ~0.03 scene units saturates:
  1-exp(-25*0.03) ~ 0.53.) iso=None auto-picks the grid midpoint - a
  guaranteed crossing for untrained/smoke fields, not a good surface."""
  grid = density_grid(model, params, resolution, lower, upper, chunk=chunk)
  if iso is None:
    iso = float(grid.min() + grid.max()) / 2
  lower = np.asarray(lower, np.float32)
  upper = np.asarray(upper, np.float32)
  spacing = (upper - lower) / (resolution - 1)
  verts, faces, normals = marching_tetrahedra(grid, iso, lower, spacing)
  out = {'verts': verts, 'faces': faces, 'normals': normals, 'grid': grid,
         'colors': None}
  if colors and len(verts):
    out['colors'] = vertex_colors(model, params, verts,
                                  footprint=float(spacing.mean()),
                                  chunk=chunk)
  return out


def write_ply(path, verts, faces, normals=None, colors=None):
  """Binary little-endian PLY with optional per-vertex normals/colors
  (colors as uchar r/g/b, the convention DCC tools expect)."""
  verts = np.asarray(verts, '<f4')
  faces = np.asarray(faces, np.int32)
  props = ['property float x', 'property float y', 'property float z']
  cols = [verts]
  if normals is not None:
    props += ['property float nx', 'property float ny', 'property float nz']
    cols.append(np.asarray(normals, '<f4'))
  float_bytes = 4 * len(cols) * 3
  vrow = np.concatenate(cols, axis=-1).astype('<f4').view(np.uint8).reshape(
      len(verts), float_bytes)
  if colors is not None:
    props += ['property uchar red', 'property uchar green',
              'property uchar blue']
    rgb8 = np.clip(np.round(np.asarray(colors) * 255), 0, 255).astype(np.uint8)
    vrow = np.concatenate([vrow, rgb8], axis=-1)
  header = '\n'.join(
      ['ply', 'format binary_little_endian 1.0',
       f'element vertex {len(verts)}'] + props +
      [f'element face {len(faces)}',
       'property list uchar int vertex_indices', 'end_header', ''])
  fdata = np.empty(len(faces),
                   dtype=[('n', 'u1'), ('idx', '<i4', (3,))])
  fdata['n'] = 3
  fdata['idx'] = faces
  with open(path, 'wb') as f:
    f.write(header.encode('ascii'))
    f.write(vrow.tobytes())
    f.write(fdata.tobytes())


def read_ply(path):
  """Read back a PLY written by write_ply (tests / round-trips)."""
  with open(path, 'rb') as f:
    data = f.read()
  head_end = data.index(b'end_header\n') + len(b'end_header\n')
  head = data[:head_end].decode('ascii').splitlines()
  n_verts = int(next(l.split()[-1] for l in head
                     if l.startswith('element vertex')))
  n_faces = int(next(l.split()[-1] for l in head
                     if l.startswith('element face')))
  n_floats = sum(1 for l in head if l.startswith('property float'))
  n_uchar = sum(1 for l in head if l.startswith('property uchar')
                and 'list' not in l)
  row_bytes = 4 * n_floats + n_uchar
  vbytes = n_verts * row_bytes
  rows = np.frombuffer(data[head_end:head_end + vbytes],
                       np.uint8).reshape(n_verts, row_bytes)
  v = rows[:, :4 * n_floats].copy().view('<f4')
  fdt = np.dtype([('n', 'u1'), ('idx', '<i4', (3,))])
  fc = np.frombuffer(data[head_end + vbytes:], fdt, count=n_faces)
  out = {'verts': v[:, :3], 'faces': fc['idx'].copy()}
  if n_floats >= 6:
    out['normals'] = v[:, 3:6]
  if n_uchar >= 3:
    out['colors'] = rows[:, 4 * n_floats:4 * n_floats + 3].astype(
        np.float32) / 255.0
  return out
