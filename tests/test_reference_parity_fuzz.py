"""Randomized config-space parity fuzz against the mounted torch reference.

test_reference_parity_model.py pins 4 hand-picked scenarios; this file walks
the legal flag space: each seed generates a random VALID combination of
Model knobs (levels/dilation/anneal/ray shape/warp curve/sRGB pipeline/
opaque background/separate proposal MLP, reference models.py:50-128) and MLP
flags (reflections/IDE/roughness/diffuse/tint/n_dot_v/predicted normals/
specular density, models.py:343-760), builds both frameworks with identical
weights, and asserts forward parity in eval AND train mode. The shipped
config fuzz (test_shipped_configs.py) only asserts a train step *runs*;
this asserts the numbers match the reference in the same corners.

Validity constraints mirrored from the reference:
  - reflections need a normals source (models.py:472-475); in EVAL mode
    density normals are not computed (`self.training` gate, models.py:603),
    so reflections/n_dot_v here require enable_pred_normals.
  - specular density requires use_diffuse_color (models.py:478-480).
  - use_diffuse_color=False / disable_rgb rely on build_pair's documented
    diffuse/specular fallback shim (the reference crashes otherwise).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import refbridge

pytest.importorskip('jax')
pytest.importorskip('torch')

import test_reference_parity_model as base  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(refbridge.REF_ROOT), reason='reference not mounted')

N_SEEDS = 10


def random_scenario(seed):
  rng = np.random.default_rng(10_000 + seed)
  pred_normals = bool(rng.integers(2))
  disable_dn = bool(rng.integers(2))
  use_reflections = pred_normals and bool(rng.integers(2))
  use_n_dot_v = pred_normals and bool(rng.integers(2))
  use_diffuse = bool(rng.integers(2))
  specular_density = use_diffuse and bool(rng.integers(2))
  use_directional_enc = bool(rng.integers(2))
  # Latent reference bug #3: IDE + per-sample roughness WITHOUT reflections
  # crashes the reference (models.py:668 passes per-ray viewdirs with
  # per-sample kappa_inv into ref_utils.py:157's broadcast). This framework
  # broadcasts viewdirs per-sample instead (models/mlp.py:549-556), so the
  # corner runs here but has no reference oracle - excluded from the fuzz.
  enable_pred_roughness = bool(rng.integers(2)) and (
      use_reflections or not use_directional_enc)
  basis_shape, basis_subdivisions = [
      ('octahedron', 1), ('icosahedron', 1), ('icosahedron', 2)][
          int(rng.integers(3))]
  net_depth = int(rng.integers(3, 7))
  # The torch reference's spatial heads are fixed-width nn.Linear, so the
  # trunk must not END on a skip-concat layer ((net_depth-1) % skip_layer
  # == 0 crashes it); only combinations the reference can run are legal.
  skip_layer = int(rng.choice(
      [s for s in (2, 3, 4) if (net_depth - 1) % s != 0]))
  mlp = dict(
      net_depth=net_depth,
      net_width=24,
      bottleneck_width=int(rng.choice([8, 16])),
      net_depth_viewdirs=int(rng.integers(1, 4)),
      net_width_viewdirs=24,
      min_deg_point=int(rng.integers(0, 2)),
      max_deg_point=int(rng.integers(4, 8)),
      skip_layer=skip_layer,
      deg_view=int(rng.integers(1, 4)),
      use_reflections=use_reflections,
      use_directional_enc=use_directional_enc,
      enable_pred_roughness=enable_pred_roughness,
      use_diffuse_color=use_diffuse,
      use_specular_tint=bool(rng.integers(2)),
      use_n_dot_v=use_n_dot_v,
      enable_pred_normals=pred_normals,
      disable_density_normals=disable_dn,
      enable_pred_specular_density=specular_density,
      density_bias=float(rng.uniform(-1.0, 0.5)),
      roughness_bias=float(rng.uniform(-1.5, -0.5)),
      rgb_padding=float(rng.choice([0.0, 0.001, 0.01])),
      srgb_mapping=bool(rng.integers(2)),
      srgb_mapping_normalization=bool(rng.integers(2)),
      basis_shape=basis_shape,
      basis_subdivisions=basis_subdivisions,
  )
  dilate = bool(rng.integers(2))
  scenario = dict(
      num_prop_samples=int(rng.choice([8, 12])),
      num_nerf_samples=int(rng.choice([6, 8])),
      num_levels=int(rng.integers(2, 4)),
      anneal_slope=float(rng.choice([0.0, 10.0])),
      dilation_bias=0.0025 if dilate else 0.0,
      dilation_multiplier=0.5 if dilate else 0.0,
      single_jitter=bool(rng.integers(2)),
      resample_padding=float(rng.choice([0.0, 0.01])),
      ray_shape=str(rng.choice(['cone', 'cylinder'])),
      disable_integration=bool(rng.integers(2)),
      opaque_background=bool(rng.integers(2)),
      raydist_fn=None if rng.random() < 0.7 else 'reciprocal',
      srgb_mapping_when_rendering=bool(rng.integers(2)),
      srgb_mapping_type=str(rng.choice(
          ['none', 'linear', 'norm_linear', 'srgb', 'norm_srgb'])),
      render_with_specular_density=specular_density,
      mlp=mlp)
  if rng.random() < 0.35 and not specular_density:
    # Separate density-only proposal MLP (reference single_mlp=False).
    # Excluded under render_with_specular_density: that mode reads the
    # specular-density head at every level, which a density-only prop MLP
    # does not have (both frameworks reject/crash on it).
    scenario['prop'] = dict(
        net_depth=3, net_width=16, bottleneck_width=8,
        net_depth_viewdirs=1, net_width_viewdirs=8,
        min_deg_point=0, max_deg_point=mlp['max_deg_point'],
        skip_layer=4, deg_view=1, disable_rgb=True,
        disable_density_normals=True,
        use_reflections=False, use_directional_enc=False,
        enable_pred_roughness=False, use_diffuse_color=False,
        use_specular_tint=False, use_n_dot_v=False,
        enable_pred_normals=False,
        density_bias=mlp['density_bias'],
        basis_shape=basis_shape, basis_subdivisions=basis_subdivisions)
  return scenario


@pytest.mark.parametrize('seed', range(N_SEEDS))
def test_random_config_forward_parity(seed):
  scenario = random_scenario(seed)
  tm, fm, params = base.build_pair(scenario)
  arrays = base.make_ray_arrays(base.N_RAYS, seed=3)
  for train in (False, True):
    t_rend, t_hist = base.run_torch(tm, arrays, train=train)
    j_rend, j_hist = base.run_jax(fm, params, arrays, train=train)
    assert len(t_hist) == len(j_hist) == fm.num_levels
    for lvl, (th, jh) in enumerate(zip(t_hist, j_hist)):
      for key in base.HISTORY_KEYS:
        t_val = th.get(key)
        j_val = jh.get(key)
        if isinstance(t_val, (int, float)) or isinstance(j_val, (int, float)):
          continue  # roughness=0 placeholder when disabled
        if j_val is None and key in ('diffuse', 'specular'):
          continue  # torch side carries the fallback shim's values
        base.assert_tree_close(j_val, t_val, atol=2e-4,
                               name=f'seed{seed}/train={train}/L{lvl}/{key}')
    for lvl, (tr, jr) in enumerate(zip(t_rend, j_rend)):
      shared = set(tr.keys()) & set(jr.keys())
      assert {'rgb', 'acc', 'diffuse', 'specular'} <= shared
      for key in sorted(shared):
        if base.torch.is_tensor(tr[key]) and jr[key] is not None:
          base.assert_tree_close(
              jr[key], tr[key], atol=2e-4,
              name=f'seed{seed}/train={train}/rendering L{lvl}/{key}')
