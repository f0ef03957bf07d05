"""Config-space GRADIENT parity against the mounted torch reference.

test_reference_parity_model.py::test_train_step_parity pins one full
optimizer step for the refnerf scenario; this file fuzzes the backward
pass across the legal flag space: for each random valid config (the same
generator as test_reference_parity_fuzz) both frameworks get identical
weights and rays, compute the same composite loss
(data + interlevel + accumulated-weights + weights-entropy,
reference train_utils.py:33-162,309-325), and every parameter gradient
must match layer by layer - through the cascade resampling, nested-AD
density normals, reflection directions, and all optional heads.

Losses that back-propagate through density-gradient normals
(orientation, predicted-normal) are excluded: the torch reference
computes those normals without create_graph (models.py:609) so they are
stop-gradient there - a documented deliberate divergence (DESIGN.md).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import refbridge

jax = pytest.importorskip('jax')
torch = pytest.importorskip('torch')
import jax.numpy as jnp  # noqa: E402

from refnerf_tpu.cameras import rays as rays_lib  # noqa: E402
from refnerf_tpu import configs as configs_lib  # noqa: E402
from refnerf_tpu.train import losses as losses_lib  # noqa: E402

import test_reference_parity_fuzz as fuzz  # noqa: E402
import test_reference_parity_model as base  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(refbridge.REF_ROOT), reason='reference not mounted')

N_SEEDS = 10

LOSS_FIELDS = dict(
    data_loss_type='mse',
    disable_multiscale_loss=False,
    supervised_by_linear_rgb=False,
    data_coarse_loss_mult=0.1,
    data_loss_mult=1.0,
    distortion_loss_mult=0.0,
    interlevel_loss_mult=0.37,
    orientation_coarse_loss_mult=0.0,
    orientation_loss_mult=0.0,
    predicted_normal_coarse_loss_mult=0.0,
    predicted_normal_loss_mult=0.0,
    accumulated_weights_loss_mult=0.29,
    weights_entropy_coarse_loss_mult=0.02,
    weights_entropy_loss_mult=0.05,
    acc_threshold_for_weights_entropy_loss=0.0,
)


def _inner(m):
  return m.mlp if isinstance(m, base._FallbackMLP) else m


def _assert_grad_close(j, t, name):
  j = np.asarray(j)
  t = np.zeros_like(j) if t is None else t.detach().cpu().numpy()
  scale = max(float(np.abs(j).max(initial=0.0)),
              float(np.abs(t).max(initial=0.0)), 1e-6)
  np.testing.assert_allclose(j, t, atol=1e-6 + 1e-3 * scale, rtol=0,
                             err_msg=name)


def _compare_mlp_grads(sub, tmlp, tag):
  """sub: flax grad sub-tree for one MLP; tmlp: torch MLP with .grad set."""

  def check(layer, p, name):
    _assert_grad_close(np.array(p['kernel']).T, layer.weight.grad,
                       f'{tag}/{name}.weight')
    _assert_grad_close(np.array(p['bias']), layer.bias.grad,
                       f'{tag}/{name}.bias')

  for i, layer in enumerate(tmlp.spatial_net):
    check(layer, sub[f'spatial_{i}'], f'spatial_{i}')
  for i, layer in enumerate(tmlp.viewdir_mlp):
    if f'viewdir_{i}' in sub:
      check(layer, sub[f'viewdir_{i}'], f'viewdir_{i}')
  for name in ('raw_density', 'raw_specular_density', 'grad_pred',
               'raw_roughness', 'raw_rgb_diffuse', 'raw_tint', 'bottleneck',
               'rgb'):
    if hasattr(tmlp, name) and name in sub:
      check(getattr(tmlp, name), sub[name], name)


@pytest.mark.parametrize('seed', range(N_SEEDS))
def test_random_config_grad_parity(seed):
  scenario = fuzz.random_scenario(seed)
  tm, fm, params = base.build_pair(scenario)
  arrays = base.make_ray_arrays(base.N_RAYS, seed=17)
  rgb_gt = np.random.RandomState(19).uniform(
      0, 1, (base.N_RAYS, 3)).astype(np.float32)

  ref_cfg = base.apply_fields(base.REF.configs.Config(), LOSS_FIELDS)
  our_cfg = base.apply_fields(configs_lib.Config(), LOSS_FIELDS)

  # --- torch backward ---
  tm.train(True)
  t_rays = base.torch_rays(arrays)
  t_batch = base.REF.utils.Batch(rays=t_rays, rgb=rgb_gt)
  t_rend, t_hist = tm(t_rays, train_frac=0.5, compute_extras=False)
  t_loss, _ = base.REF.train_utils.compute_data_loss(
      t_batch, t_rend, t_rays, ref_cfg)
  t_loss = t_loss + base.REF.train_utils.interlevel_loss(t_hist, ref_cfg)
  t_loss = t_loss + base.REF.train_utils.accumulated_weights_loss(
      t_rend, ref_cfg)
  t_loss = t_loss + base.REF.train_utils.weights_entropy_loss(
      tm, t_rend, t_hist, ref_cfg, warmup_ratio=1.0)
  t_loss.backward()

  # --- jax gradient of the identical loss ---
  j_rays = base.jax_rays(arrays)
  j_batch = rays_lib.Batch(rays=j_rays, rgb=jnp.asarray(rgb_gt))

  def loss_fn(p):
    rend, hist = fm.apply({'params': p}, j_rays, train_frac=0.5,
                          compute_extras=False, train=True)
    loss, _ = losses_lib.compute_data_loss(j_batch, rend, j_rays, our_cfg)
    loss = loss + losses_lib.interlevel_loss(hist, our_cfg)
    loss = loss + losses_lib.accumulated_weights_loss(rend, our_cfg)
    loss = loss + losses_lib.weights_entropy_loss(
        fm.num_levels, rend, hist, our_cfg, warmup_ratio=1.0)
    return loss

  j_loss, grads = jax.value_and_grad(loss_fn)(params)
  _assert_grad_close(j_loss, t_loss, f'seed{seed}/loss')

  _compare_mlp_grads(grads['nerf_mlp'], _inner(tm.nerf_mlp),
                     f'seed{seed}/nerf_mlp')
  if 'prop' in scenario:
    _compare_mlp_grads(grads['prop_mlp'], _inner(tm.prop_mlp),
                       f'seed{seed}/prop_mlp')
