"""Torch-reference checkpoint import: converted weights == reference model.

The strongest possible evidence for tools/import_torch_checkpoint.py: build
the ACTUAL torch reference model (its own random weights, its own geopoly
basis ordering), convert its state_dict through refnerf_tpu.interop, and
assert the Flax model renders the same images. This specifically exercises
the signed basis-permutation row remap - a naive transpose-copy fails it.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import refbridge

jax = pytest.importorskip('jax')
torch = pytest.importorskip('torch')

from refnerf_tpu import interop  # noqa: E402
from refnerf_tpu.models.mlp import MLP  # noqa: E402
from refnerf_tpu.models.model import Model  # noqa: E402
from refnerf_tpu.ops import geopoly  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(refbridge.REF_ROOT), reason='reference not mounted')

import test_reference_parity_model as tpm  # noqa: E402


def test_known_basis_maps_current():
  """KNOWN_BASIS_MAPS must match the mounted reference's geopoly exactly."""
  import internal.geopoly as ref_geopoly

  for (shape, sub), (sigma, signs) in interop.KNOWN_BASIS_MAPS.items():
    ours = np.array(geopoly.generate_basis(shape, sub))
    theirs = np.array(ref_geopoly.generate_basis(shape, sub))
    got_sigma, got_signs = interop.basis_signed_permutation(ours, theirs)
    assert got_sigma == sigma, (shape, sub)
    assert got_signs == signs, (shape, sub)


def _build_uncopied_pair(basis_shape, basis_subdivisions, **mlp_overrides):
  """(torch model w/ its own weights+basis, flax model, flax template)."""
  mlp_kw = dict(tpm.MLP_KW, basis_shape=basis_shape,
                basis_subdivisions=basis_subdivisions, **mlp_overrides)
  sc = dict(tpm.SCENARIOS['refnerf'])
  sc.pop('srgb_mapping_when_rendering')
  sc.pop('srgb_mapping_type')

  fm = Model(
      nerf_mlp=MLP(name='NerfMLP', **mlp_kw),
      prop_mlp=None,
      bg_intensity_range=(1.0, 1.0),
      vis_num_rays=4,
      **sc)
  arrays = tpm.make_ray_arrays(tpm.N_RAYS)
  template = fm.init({'params': jax.random.PRNGKey(7)}, tpm.jax_rays(arrays),
                     train_frac=1.0, compute_extras=False,
                     train=False)['params']

  REF = tpm.REF
  ref_cfg = tpm._ref_model_config()
  saved = (REF.models.NerfMLP, REF.models.PropMLP)
  try:
    REF.models.NerfMLP = lambda: REF.models.MLP(**mlp_kw)
    REF.models.PropMLP = REF.models.NerfMLP
    tm = REF.models.Model(config=ref_cfg, single_mlp=True,
                          bg_intensity_range=(1.0, 1.0), **sc)
  finally:
    REF.models.NerfMLP, REF.models.PropMLP = saved

  # Materialize LazyLinear with one dummy forward; weights stay the torch
  # default init and pos_basis_t stays the REFERENCE's own ordering.
  tm.eval()
  with torch.no_grad():
    tm(tpm.torch_rays(arrays), train_frac=1.0, compute_extras=False)
  return tm, fm, template, arrays


@pytest.mark.parametrize('basis', [('octahedron', 1), ('icosahedron', 2)],
                         ids=['octa1', 'icosa2-signed'])
def test_import_matches_reference_forward(basis):
  tm, fm, template, arrays = _build_uncopied_pair(*basis)
  sd = {'model.' + k: v.detach().numpy() for k, v in tm.state_dict().items()}
  sd['_ignored_extra'] = np.zeros(3)  # non-model keys must not break import

  params = interop.torch_state_dict_to_params(sd, template, fm)
  assert jax.tree.structure(params) == jax.tree.structure(dict(template))

  t_rend, t_hist = tpm.run_torch(tm, arrays, train=False)
  j_rend, j_hist = tpm.run_jax(fm, params, arrays, train=False)
  np.testing.assert_allclose(
      np.asarray(j_rend[-1]['rgb']), t_rend[-1]['rgb'].detach().numpy(),
      atol=2e-5, rtol=2e-4)
  np.testing.assert_allclose(
      np.asarray(j_rend[-1]['acc']), t_rend[-1]['acc'].detach().numpy(),
      atol=2e-5, rtol=2e-4)
  np.testing.assert_allclose(
      np.asarray(j_hist[-1]['density']),
      t_hist[-1]['density'].detach().numpy(), atol=2e-4, rtol=2e-3)


def test_naive_copy_would_be_wrong():
  """Regression guard on the guard: with the signed icosahedron basis, an
  identity basis map must NOT reproduce the reference (proves the permute
  rows actually do something on the flagship basis config)."""
  tm, fm, template, arrays = _build_uncopied_pair('icosahedron', 2)
  sd = {'model.' + k: v.detach().numpy() for k, v in tm.state_dict().items()}

  nb = 21
  saved = interop.KNOWN_BASIS_MAPS[('icosahedron', 2)]
  interop.KNOWN_BASIS_MAPS[('icosahedron', 2)] = (
      tuple(range(nb)), (1,) * nb)
  try:
    params = interop.torch_state_dict_to_params(sd, template, fm)
  finally:
    interop.KNOWN_BASIS_MAPS[('icosahedron', 2)] = saved
  t_rend, _ = tpm.run_torch(tm, arrays, train=False)
  j_rend, _ = tpm.run_jax(fm, params, arrays, train=False)
  diff = np.max(np.abs(np.asarray(j_rend[-1]['rgb']) -
                       t_rend[-1]['rgb'].detach().numpy()))
  assert diff > 1e-3, 'identity map unexpectedly matched - test is vacuous'


@pytest.mark.parametrize('basis', [('octahedron', 1), ('icosahedron', 2)],
                         ids=['octa1', 'icosa2-signed'])
def test_export_roundtrip_exact(basis):
  """params -> reference state_dict -> params is bit-exact."""
  _, fm, template, _ = _build_uncopied_pair(*basis)
  sd = interop.params_to_torch_state_dict(template, fm)
  assert 'model.prop_mlp.rgb.weight' in sd  # single_mlp aliases prop keys
  back = interop.torch_state_dict_to_params(sd, template, fm)
  for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(dict(template)),
                          jax.tree.leaves(back)):
    np.testing.assert_array_equal(np.asarray(a), b,
                                  err_msg=jax.tree_util.keystr(path))


def test_exported_state_dict_loads_into_reference():
  """torch's own load_state_dict accepts the export, and the reference
  model then renders what the Flax model renders."""
  tm, fm, template, arrays = _build_uncopied_pair('icosahedron', 2)
  sd = interop.params_to_torch_state_dict(template, fm)
  tensors = {k[len('model.'):]: torch.from_numpy(np.array(v))
             for k, v in sd.items()}
  missing, unexpected = tm.load_state_dict(tensors, strict=False)
  assert not unexpected, unexpected

  t_rend, _ = tpm.run_torch(tm, arrays, train=False)
  j_rend, _ = tpm.run_jax(fm, template, arrays, train=False)
  np.testing.assert_allclose(
      np.asarray(j_rend[-1]['rgb']), t_rend[-1]['rgb'].detach().numpy(),
      atol=2e-5, rtol=2e-4)


def test_distinct_prop_weights_into_single_mlp_is_loud():
  """A two-MLP checkpoint must not silently lose its proposal weights
  when imported under a single_mlp config."""
  tm, fm, template, arrays = _build_uncopied_pair('octahedron', 1)
  sd = {'model.' + k: v.detach().numpy() for k, v in tm.state_dict().items()}
  # Perturb one aliased prop tensor to simulate a two-MLP checkpoint.
  key = 'model.prop_mlp.rgb.weight'
  assert key in sd
  sd[key] = sd[key] + 1.0
  with pytest.raises(ValueError, match='single_mlp'):
    interop.torch_state_dict_to_params(sd, template, fm)


def test_architecture_mismatch_is_loud():
  tm, fm, template, arrays = _build_uncopied_pair('octahedron', 1)
  sd = {'model.' + k: v.detach().numpy() for k, v in tm.state_dict().items()}
  wrong = Model(
      nerf_mlp=MLP(name='NerfMLP',
                   **dict(tpm.MLP_KW, basis_shape='octahedron',
                          basis_subdivisions=1, max_deg_point=8)),
      prop_mlp=None, num_levels=2, num_prop_samples=4, num_nerf_samples=4)
  arrays2 = tpm.make_ray_arrays(8)
  wrong_template = wrong.init(
      {'params': jax.random.PRNGKey(0)}, tpm.jax_rays(arrays2),
      train_frac=1.0, compute_extras=False, train=False)['params']
  with pytest.raises(ValueError, match='encoding|mismatch'):
    interop.torch_state_dict_to_params(sd, wrong_template, wrong)


def test_trailing_skip_layout_roundtrip():
  """When the spatial trunk ends in a skip concat ((net_depth-1) %
  skip_layer == 0) the heads consume [x, encoding]. The torch reference
  cannot BUILD that architecture (its heads are fixed
  nn.Linear(net_width, ...), reference models.py:501-523, so the trailing
  concat crashes its first forward) - but our params must still round-trip
  through the reference state_dict LAYOUT as an exact bijection, which
  requires the signed basis remap on the heads' encoding rows in both
  directions."""
  mlp_kw = dict(tpm.MLP_KW, basis_shape='icosahedron',
                basis_subdivisions=2, net_depth=5, skip_layer=4)
  sc = dict(tpm.SCENARIOS['refnerf'])
  sc.pop('srgb_mapping_when_rendering')
  sc.pop('srgb_mapping_type')
  fm = Model(nerf_mlp=MLP(name='NerfMLP', **mlp_kw), prop_mlp=None,
             bg_intensity_range=(1.0, 1.0), vis_num_rays=4, **sc)
  arrays = tpm.make_ray_arrays(tpm.N_RAYS)
  template = fm.init({'params': jax.random.PRNGKey(7)},
                     tpm.jax_rays(arrays), train_frac=1.0,
                     compute_extras=False, train=False)['params']
  assert interop._trailing_skip(fm.nerf_mlp)
  nw = fm.nerf_mlp.net_width
  assert template['nerf_mlp']['raw_density']['kernel'].shape[0] > nw

  # Exact bijection through the reference layout.
  sd = interop.params_to_torch_state_dict(template, fm)
  back = interop.torch_state_dict_to_params(sd, template, fm)
  for (path, a), b in zip(
      jax.tree_util.tree_leaves_with_path(dict(template)),
      jax.tree.leaves(back)):
    np.testing.assert_array_equal(np.asarray(a), b,
                                  err_msg=jax.tree_util.keystr(path))

  # Load-bearing: skipping the head remap on ONE side breaks the round
  # trip (the icosahedron-2 basis has signed permutation rows).
  saved = interop._SPATIAL_HEADS
  interop._SPATIAL_HEADS = frozenset()
  try:
    naive = interop.torch_state_dict_to_params(sd, template, fm)
  finally:
    interop._SPATIAL_HEADS = saved
  k_good = np.asarray(template['nerf_mlp']['raw_density']['kernel'])
  k_naive = np.asarray(naive['nerf_mlp']['raw_density']['kernel'])
  assert np.abs(k_good - k_naive).max() > 1e-6

  # The torch reference really cannot build this architecture - pin the
  # asymmetry this test documents.
  REF = tpm.REF
  savedref = (REF.models.NerfMLP, REF.models.PropMLP)
  try:
    REF.models.NerfMLP = lambda: REF.models.MLP(**mlp_kw)
    REF.models.PropMLP = REF.models.NerfMLP
    tm = REF.models.Model(config=tpm._ref_model_config(), single_mlp=True,
                          bg_intensity_range=(1.0, 1.0), **sc)
    tm.eval()
    with pytest.raises(RuntimeError, match='cannot be multiplied'):
      with torch.no_grad():
        tm(tpm.torch_rays(arrays), train_frac=1.0, compute_extras=False)
  finally:
    REF.models.NerfMLP, REF.models.PropMLP = savedref
