"""Torch-reference checkpoint interop: Lightning state_dicts -> Flax params.

The reference (minfenli/refnerf-pl) trains with PyTorch-Lightning; its
checkpoints hold a `state_dict` whose MLP attribute names mirror this
framework's Flax tree one-to-one (reference internal/models.py:497-534:
spatial_net.N / raw_density / grad_pred / raw_roughness / raw_rgb_diffuse /
raw_tint / bottleneck / viewdir_mlp.N / rgb). Torch `Linear.weight` is
[out, in]; Flax `Dense.kernel` is [in, out] - a transpose.

The one genuinely tricky bit is the **geodesic-basis ordering**: both
implementations project sample Gaussians onto `geopoly.generate_basis(...)`
before the IPE, but the two tessellations enumerate vertices in a different
order (and keep antipodes of opposite sign). The basis is NOT stored in the
checkpoint (reference models.py:483 keeps it as a plain tensor attribute,
not a buffer), so a naive weight copy silently mis-wires every
first-layer/skip-layer encoding row. The fix is exact: our basis is a
signed permutation of theirs, `ours[j] = sign_j * theirs[sigma_j]`, under
which the IPE features transform as sin -> sign * sin, cos -> cos per
(degree, basis) row; permuting + sign-flipping those kernel rows makes the
imported model bit-for-bit equivalent.

`KNOWN_BASIS_MAPS` pins the signed permutations for the standard basis
configs (verified against the mounted reference in
tests/test_torch_import.py); any other (shape, subdivisions) needs the
reference's basis matrix passed explicitly (`ref_basis`, e.g. dumped with
`numpy.save('basis.npy', internal.geopoly.generate_basis(shape, n))`).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from refnerf_tpu.ops import geopoly

# (basis_shape, basis_subdivisions) -> (sigma, signs) with
# ours[j] == signs[j] * theirs[sigma[j]]. Derived by matching
# geopoly.generate_basis against the reference's internal/geopoly.py output
# vertex-by-vertex; asserted fresh when the reference tree is mounted
# (tests/test_torch_import.py::test_known_basis_maps_current).
KNOWN_BASIS_MAPS: Dict[Tuple[str, int], Tuple[Tuple[int, ...],
                                              Tuple[int, ...]]] = {
    ('icosahedron', 2): (
        (12, 14, 2, 15, 1, 0, 5, 4, 3, 7, 17, 16, 19, 10, 20, 11, 13, 9,
         8, 6, 18),
        (-1, -1, -1, -1, -1, -1, -1, -1, -1, 1, -1, -1, 1, 1, 1, 1, -1, -1,
         -1, -1, -1)),
    ('icosahedron', 1): ((5, 1, 0, 2, 3, 4), (-1, -1, -1, -1, 1, 1)),
    ('octahedron', 1): ((2, 1, 0), (1, 1, 1)),
    ('octahedron', 2): ((5, 4, 2, 3, 1, 0, 7, 8, 6),
                        (1, 1, 1, 1, 1, 1, 1, 1, -1)),
}


def basis_signed_permutation(ours: np.ndarray, theirs: np.ndarray,
                             atol: float = 1e-6):
  """(sigma, signs) with ours[j] == signs[j] * theirs[sigma[j]]."""
  ours = np.asarray(ours, dtype=np.float64)
  theirs = np.asarray(theirs, dtype=np.float64)
  if ours.shape != theirs.shape:
    raise ValueError(f'basis shapes differ: {ours.shape} vs {theirs.shape}')
  sigma, signs = [], []
  for j, v in enumerate(ours):
    hit = np.where(np.all(np.isclose(theirs, v, atol=atol), axis=1))[0]
    neg = np.where(np.all(np.isclose(theirs, -v, atol=atol), axis=1))[0]
    if len(hit):
      sigma.append(int(hit[0]))
      signs.append(1)
    elif len(neg):
      sigma.append(int(neg[0]))
      signs.append(-1)
    else:
      raise ValueError(
          f'basis vector {j} ({v}) has no +- match in the reference basis; '
          'the two bases are not the same tessellation')
  if sorted(sigma) != list(range(len(ours))):
    raise ValueError('basis match is not a permutation (duplicate hits)')
  return tuple(sigma), tuple(signs)


def encoding_row_map(num_degs: int, sigma, signs):
  """Row permutation + signs for the [2 * num_degs * n_basis] IPE layout.

  Layout (reference internal/coord.py:107-126 == ops/coord.py): the feature
  vector is [sin block | cos block], each block degree-major/basis-minor.
  Under ours = sign * theirs: sin rows pick up the sign, cos rows do not.
  """
  nb = len(sigma)
  half = num_degs * nb
  rows = np.empty(2 * half, dtype=np.int64)
  out_signs = np.ones(2 * half, dtype=np.float32)
  for d in range(num_degs):
    for jp in range(nb):
      rows[d * nb + jp] = d * nb + sigma[jp]
      out_signs[d * nb + jp] = signs[jp]
      rows[half + d * nb + jp] = half + d * nb + sigma[jp]
  return rows, out_signs


_TORCH_NAMES = {
    'raw_density': 'raw_density',
    'raw_specular_density': 'raw_specular_density',
    'grad_pred': 'grad_pred',
    'raw_roughness': 'raw_roughness',
    'raw_rgb_diffuse': 'raw_rgb_diffuse',
    'raw_tint': 'raw_tint',
    'bottleneck': 'bottleneck',
    'rgb': 'rgb',
}

# Heads fed by the spatial trunk's output. When the trunk ends in a skip
# concat ((net_depth - 1) % skip_layer == 0, e.g. depth 5 or 9 with skip 4),
# these heads consume [x, encoding] and their kernels' encoding rows need
# the same signed basis permutation as spatial_0. 'rgb' is excluded: it
# reads the directional trunk. NOTE the asymmetry: the torch reference
# CANNOT build this architecture (its heads are fixed
# nn.Linear(net_width, ...), reference models.py:501-523, so a trailing
# concat crashes its first forward) - no imported checkpoint can hit this
# path. The remap exists so OUR trailing-skip models round-trip through
# the reference state_dict LAYOUT as an exact bijection.
_SPATIAL_HEADS = frozenset({
    'raw_density', 'raw_specular_density', 'grad_pred', 'raw_roughness',
    'raw_rgb_diffuse', 'raw_tint', 'bottleneck'})


def _trailing_skip(mlp) -> bool:
  return mlp.net_depth > 1 and (mlp.net_depth - 1) % mlp.skip_layer == 0


def _torch_layer_name(flax_name: str) -> str:
  if flax_name.startswith('spatial_'):
    return f'spatial_net.{flax_name.split("_")[-1]}'
  if flax_name.startswith('viewdir_'):
    return f'viewdir_mlp.{flax_name.split("_")[-1]}'
  try:
    return _TORCH_NAMES[flax_name]
  except KeyError:
    raise KeyError(f'no torch-reference layer known for {flax_name!r}')


def convert_mlp(state_dict: Mapping[str, Any], prefix: str,
                template: Mapping[str, Any], mlp,
                ref_basis: Optional[np.ndarray] = None) -> Dict[str, Any]:
  """Convert one reference MLP's weights into a Flax MLP param subtree.

  Args:
    state_dict: torch state_dict (tensors or arrays), e.g. a Lightning
      checkpoint's `state_dict` entry.
    prefix: key prefix of this MLP, e.g. 'model.nerf_mlp.'.
    template: the Flax params subtree to mirror (shapes/dtype/structure).
    mlp: the Flax MLP module (for net_width/skip_layer/deg/basis fields).
    ref_basis: reference basis matrix [n_basis, 3] for non-standard basis
      configs; defaults to KNOWN_BASIS_MAPS.
  """
  shape_key = (mlp.basis_shape, mlp.basis_subdivisions)
  if ref_basis is not None:
    ours = np.array(geopoly.generate_basis(*shape_key))
    sigma, signs = basis_signed_permutation(ours, ref_basis)
  elif shape_key in KNOWN_BASIS_MAPS:
    sigma, signs = KNOWN_BASIS_MAPS[shape_key]
  else:
    raise ValueError(
        f'no known basis mapping for {shape_key}; dump the reference basis '
        "(numpy.save('basis.npy', internal.geopoly.generate_basis"
        f'{shape_key!r})) and pass it as ref_basis')
  num_degs = mlp.max_deg_point - mlp.min_deg_point
  rows, row_signs = encoding_row_map(num_degs, sigma, signs)
  n_enc = len(rows)

  def fetch(key):
    if key not in state_dict:
      near = [k for k in state_dict if key.rsplit('.', 2)[-2] in k][:4]
      raise KeyError(f'{key!r} missing from state_dict (architecture '
                     f'mismatch? nearby keys: {near})')
    return np.asarray(state_dict[key], dtype=np.float32)

  out: Dict[str, Any] = {}
  for name, leaf in template.items():
    tname = _torch_layer_name(name)
    kernel = fetch(f'{prefix}{tname}.weight').T.copy()
    bias = fetch(f'{prefix}{tname}.bias').copy()
    if name == 'spatial_0':
      if kernel.shape[0] != n_enc:
        raise ValueError(
            f'{prefix}{tname}: input dim {kernel.shape[0]} != encoding '
            f'{n_enc} (min/max_deg_point or basis mismatch)')
      kernel = kernel[rows] * row_signs[:, None]
    elif ((name.startswith('spatial_') and
           int(name.split('_')[-1]) > 1 and
           (int(name.split('_')[-1]) - 1) % mlp.skip_layer == 0)
          or (name in _SPATIAL_HEADS and _trailing_skip(mlp))):
      nw = mlp.net_width
      enc = kernel[nw:]
      if enc.shape[0] != n_enc:
        raise ValueError(
            f'{prefix}{tname}: skip-input rows {enc.shape[0]} != encoding '
            f'{n_enc}')
      kernel = np.concatenate([kernel[:nw], enc[rows] * row_signs[:, None]],
                              axis=0)
    want = tuple(np.shape(leaf['kernel']))
    if kernel.shape != want:
      raise ValueError(f'{prefix}{tname}: kernel shape {kernel.shape} != '
                       f'expected {want} (config mismatch)')
    out[name] = {'kernel': kernel, 'bias': bias}
  return out


def _mlp_to_state_dict(sub: Mapping[str, Any], prefix: str, mlp,
                       ref_basis: Optional[np.ndarray] = None
                       ) -> Dict[str, np.ndarray]:
  """Inverse of convert_mlp: Flax MLP subtree -> reference state_dict keys."""
  shape_key = (mlp.basis_shape, mlp.basis_subdivisions)
  if ref_basis is not None:
    ours = np.array(geopoly.generate_basis(*shape_key))
    sigma, signs = basis_signed_permutation(ours, ref_basis)
  elif shape_key in KNOWN_BASIS_MAPS:
    sigma, signs = KNOWN_BASIS_MAPS[shape_key]
  else:
    raise ValueError(f'no known basis mapping for {shape_key}; pass '
                     'ref_basis (see convert_mlp)')
  num_degs = mlp.max_deg_point - mlp.min_deg_point
  rows, row_signs = encoding_row_map(num_degs, sigma, signs)
  inv_rows = np.empty_like(rows)
  inv_rows[rows] = np.arange(len(rows))
  inv_signs = row_signs[inv_rows]

  out: Dict[str, np.ndarray] = {}
  for name, leaf in sub.items():
    kernel = np.asarray(leaf['kernel'], dtype=np.float32)
    if name == 'spatial_0':
      kernel = kernel[inv_rows] * inv_signs[:, None]
    elif ((name.startswith('spatial_') and
           int(name.split('_')[-1]) > 1 and
           (int(name.split('_')[-1]) - 1) % mlp.skip_layer == 0)
          or (name in _SPATIAL_HEADS and _trailing_skip(mlp))):
      nw = mlp.net_width
      kernel = np.concatenate(
          [kernel[:nw], kernel[nw:][inv_rows] * inv_signs[:, None]], axis=0)
    tname = _torch_layer_name(name)
    out[f'{prefix}{tname}.weight'] = kernel.T.copy()
    out[f'{prefix}{tname}.bias'] = np.asarray(leaf['bias'],
                                              dtype=np.float32).copy()
  return out


def params_to_torch_state_dict(params, model,
                               ref_basis: Optional[np.ndarray] = None
                               ) -> Dict[str, np.ndarray]:
  """Export this framework's params as a reference-layout state_dict.

  The exact inverse of torch_state_dict_to_params: keys are
  'model.nerf_mlp.*' (plus 'model.prop_mlp.*' when two MLPs exist, or
  aliased to the nerf weights under single_mlp so the reference's
  shared-module layout loads cleanly).
  """
  out = _mlp_to_state_dict(params['nerf_mlp'], 'model.nerf_mlp.',
                           model.nerf_mlp, ref_basis=ref_basis)
  prop = params.get('prop_mlp')
  if prop is not None:
    out.update(_mlp_to_state_dict(prop, 'model.prop_mlp.', model.prop_mlp,
                                  ref_basis=ref_basis))
  else:
    out.update({k.replace('model.nerf_mlp.', 'model.prop_mlp.'): v
                for k, v in list(out.items())})
  return out


def torch_state_dict_to_params(state_dict: Mapping[str, Any], params, model,
                               ref_basis: Optional[np.ndarray] = None):
  """Convert a reference Lightning state_dict into this framework's params.

  `params` is the template pytree from construct.init_params; `model` the
  constructed Model (for its MLP modules' static fields). Returns a new
  params dict; raises on any missing layer or shape mismatch.
  """
  out = dict(params)
  out['nerf_mlp'] = convert_mlp(state_dict, 'model.nerf_mlp.',
                                params['nerf_mlp'], model.nerf_mlp,
                                ref_basis=ref_basis)
  if 'prop_mlp' in params:
    out['prop_mlp'] = convert_mlp(state_dict, 'model.prop_mlp.',
                                  params['prop_mlp'], model.prop_mlp,
                                  ref_basis=ref_basis)
  else:
    # single_mlp config: the reference's shared-module layout aliases
    # model.prop_mlp.* to the nerf weights. If the checkpoint carries
    # DISTINCT proposal weights, it was trained two-MLP and this config
    # would silently drop them.
    for k in state_dict:
      if not k.startswith('model.prop_mlp.'):
        continue
      nk = 'model.nerf_mlp.' + k[len('model.prop_mlp.'):]
      if nk in state_dict and not np.array_equal(
          np.asarray(state_dict[k]), np.asarray(state_dict[nk])):
        raise ValueError(
            f'checkpoint has distinct prop_mlp weights ({k} != {nk}) but '
            'the config is single_mlp; bind Model.single_mlp = False to '
            'import both MLPs')
  extra = set(params) - {'nerf_mlp', 'prop_mlp'}
  if extra:
    raise ValueError(f'unexpected non-MLP param groups: {sorted(extra)}')
  return out
