"""Fused-trunk MLP vs the plain flax path: identical params, rays, grads.

`fused_trunk='on'` must be a pure performance knob: the full Ref-NeRF MLP
(reflections, IDE, predicted normals, diffuse/specular/tint/roughness,
n.v, density-gradient normals) and its loss gradients — including the
second-order terms through the normals — must match the plain path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refnerf_tpu.models.mlp import MLP


MLP_KW = dict(
    net_depth=4, net_width=64, bottleneck_width=32,
    net_depth_viewdirs=3, net_width_viewdirs=32,
    max_deg_point=8, deg_view=2, skip_layer=2, skip_layer_dir=2,
    basis_shape='octahedron', basis_subdivisions=1,
    use_reflections=True, use_directional_enc=True,
    enable_pred_normals=True, enable_pred_roughness=True,
    use_diffuse_color=True, use_specular_tint=True, use_n_dot_v=True,
    fused_block=16,
)


def _gaussians(key, n_rays=5, n_samples=9):
  k1, k2, k3 = jax.random.split(key, 3)
  means = jax.random.normal(k1, (n_rays, n_samples, 3))
  diag = jax.nn.softplus(jax.random.normal(k2, (n_rays, n_samples, 3))) * 0.01
  covs = jax.vmap(jax.vmap(jnp.diag))(diag)
  viewdirs = jax.random.normal(k3, (n_rays, 3))
  viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
  return (means, covs), viewdirs


def _apply(params, gaussians, viewdirs, train, **overrides):
  mlp = MLP(**{**MLP_KW, **overrides})
  return mlp.apply({'params': params}, gaussians, viewdirs, train=train)


@pytest.mark.parametrize('train', [True, False])
def test_outputs_match(train):
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(0))
  mlp = MLP(**MLP_KW, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(1)}, gaussians,
                    viewdirs, train=False)['params']
  ref = _apply(params, gaussians, viewdirs, train, fused_trunk='off')
  out = _apply(params, gaussians, viewdirs, train, fused_trunk='on')
  assert set(ref) == set(out)
  for k in ref:
    if ref[k] is None:
      assert out[k] is None, k
      continue
    np.testing.assert_allclose(
        ref[k], out[k], atol=2e-5, rtol=2e-4, err_msg=k)


def test_param_gradients_match():
  """Loss touching rgb/density/normals: first+second-order grads match."""
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(2))
  mlp = MLP(**MLP_KW, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(3)}, gaussians,
                    viewdirs, train=False)['params']

  def loss(params, mode):
    r = _apply(params, gaussians, viewdirs, True, fused_trunk=mode)
    # density normals feed the loss -> exercises the second-order VJP.
    t = jnp.mean((r['rgb'] - 0.5) ** 2) + jnp.mean(r['density'])
    t = t + jnp.mean(jnp.sum(r['normals'] * r['normals_pred'], axis=-1))
    return t

  g_ref = jax.grad(loss)(params, 'off')
  g_fus = jax.grad(loss)(params, 'on')
  flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
  flat_f = jax.tree.leaves(g_fus)
  assert len(flat_r) == len(flat_f)
  for (path, a), b in zip(flat_r, flat_f):
    scale = max(1e-3, float(jnp.max(jnp.abs(a))))
    np.testing.assert_allclose(
        a, b, atol=5e-4 * scale, rtol=1e-3,
        err_msg=jax.tree_util.keystr(path))


def test_param_tree_identical():
  """fused_trunk must not change the checkpoint param structure."""
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(4))
  t_off = jax.tree.structure(
      MLP(**MLP_KW, fused_trunk='off').init(
          {'params': jax.random.PRNGKey(5)}, gaussians, viewdirs,
          train=False))
  t_on = jax.tree.structure(
      MLP(**MLP_KW, fused_trunk='on').init(
          {'params': jax.random.PRNGKey(5)}, gaussians, viewdirs,
          train=False))
  assert t_off == t_on


# Flag combinations exercising dispatcher paths the full-flag test misses:
# plain mipnerf-style trunks, no bottleneck, density-only, density-normals
# without prediction, and the specular-density head.
_VARIANTS = {
    'plain': dict(use_reflections=False, use_directional_enc=False,
                  enable_pred_normals=False, enable_pred_roughness=False,
                  use_diffuse_color=False, use_specular_tint=False,
                  use_n_dot_v=False, disable_density_normals=True),
    'no_bottleneck': dict(bottleneck_width=0),
    'density_only': dict(disable_rgb=True, use_reflections=False,
                         use_directional_enc=False,
                         enable_pred_roughness=False,
                         use_diffuse_color=False, use_specular_tint=False,
                         use_n_dot_v=False),
    'density_normals_only': dict(enable_pred_normals=False),
    'specular_density': dict(enable_pred_specular_density=True),
}


@pytest.mark.parametrize('variant', sorted(_VARIANTS))
@pytest.mark.parametrize('train', [True, False])
def test_flag_variants_match(variant, train):
  overrides = _VARIANTS[variant]
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(6))
  mlp = MLP(**{**MLP_KW, **overrides}, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(7)}, gaussians,
                    viewdirs, train=False)['params']
  ref = _apply(params, gaussians, viewdirs, train,
               fused_trunk='off', **overrides)
  out = _apply(params, gaussians, viewdirs, train,
               fused_trunk='on', **overrides)
  assert set(ref) == set(out)
  for k in ref:
    if ref[k] is None:
      assert out[k] is None, f'{variant}/{k}'
      continue
    np.testing.assert_allclose(ref[k], out[k], atol=2e-5, rtol=2e-4,
                               err_msg=f'{variant}/{k}')


@pytest.mark.parametrize('train', [True, False])
def test_fused_dir_trunk_dispatches_and_matches(train, monkeypatch):
  """net_depth_viewdirs=4 avoids the trailing-concat guard ((4-1)%2 != 0),
  so the fused directional path (segments + in-kernel rgb head + dx wiring,
  mlp.py fused_trunk call) must actually dispatch — the default MLP_KW
  depth of 3 silently falls back, leaving that wiring untested."""
  from refnerf_tpu.ops.pallas import fused_mlp as fm

  calls = []
  real = fm.fused_trunk

  def spy(*a, **k):
    calls.append(k.get('needs_dx'))
    return real(*a, **k)

  monkeypatch.setattr('refnerf_tpu.models.mlp.fused_mlp.fused_trunk', spy)

  overrides = dict(net_depth_viewdirs=4)
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(10))
  mlp = MLP(**{**MLP_KW, **overrides}, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(11)}, gaussians,
                    viewdirs, train=False)['params']
  ref = _apply(params, gaussians, viewdirs, train,
               fused_trunk='off', **overrides)
  assert not calls
  out = _apply(params, gaussians, viewdirs, train,
               fused_trunk='on', **overrides)
  assert calls == [True], 'fused directional trunk did not dispatch'
  for k in ref:
    if ref[k] is None:
      assert out[k] is None, k
      continue
    np.testing.assert_allclose(ref[k], out[k], atol=2e-5, rtol=2e-4,
                               err_msg=k)


def test_fallback_warns_once(caplog):
  """A gin-configured architecture that silently reverts to plain XLA must
  log the fallback (once per process per reason)."""
  import logging as pylogging

  from refnerf_tpu.models import mlp as mlp_mod

  mlp_mod._FALLBACK_WARNED.clear()
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(12))
  overrides = dict(net_activation=jax.nn.silu)
  mlp = MLP(**{**MLP_KW, **overrides}, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(13)}, gaussians,
                    viewdirs, train=False)['params']
  with caplog.at_level(pylogging.WARNING):
    _apply(params, gaussians, viewdirs, False,
           fused_trunk='on', **overrides)
    _apply(params, gaussians, viewdirs, False,
           fused_trunk='on', **overrides)
  hits = [r for r in caplog.records if 'falling back' in r.getMessage()]
  assert len(hits) == 1
  assert 'net_activation' in hits[0].getMessage()


@pytest.mark.parametrize('train', [True, False])
def test_no_viewdirs_match(train):
  """viewdirs=None: the spatial trunk must emit features for the rgb head."""
  gaussians, _ = _gaussians(jax.random.PRNGKey(8))
  kw = dict(MLP_KW, use_reflections=False, use_directional_enc=False,
            enable_pred_roughness=False, use_diffuse_color=False,
            use_specular_tint=False, use_n_dot_v=False)
  mlp = MLP(**kw, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(9)}, gaussians, None,
                    train=False)['params']
  ref = MLP(**kw, fused_trunk='off').apply(
      {'params': params}, gaussians, None, train=train)
  out = MLP(**kw, fused_trunk='on').apply(
      {'params': params}, gaussians, None, train=train)
  assert set(ref) == set(out)
  for k in ref:
    if ref[k] is None:
      assert out[k] is None, k
      continue
    np.testing.assert_allclose(ref[k], out[k], atol=2e-5, rtol=2e-4,
                               err_msg=k)


def test_fuse_compositing_matches_xla_weights():
  """fuse_compositing must be a pure performance knob: the in-kernel
  weights and the loss gradients through them equal XLA compositing of
  the plain path's density (render.compute_alpha_weights)."""
  from refnerf_tpu.models import render

  # 8 samples divides fused_block=16, so the epilogue dispatches.
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(7), n_samples=8)
  n_rays, n_samples = gaussians[0].shape[:2]
  key_t, key_d = jax.random.split(jax.random.PRNGKey(8))
  tdist = jnp.sort(jax.random.uniform(key_t, (n_rays, n_samples + 1),
                                      minval=2.0, maxval=6.0), axis=-1)
  dirs = jax.random.normal(key_d, (n_rays, 3))
  delta = (tdist[..., 1:] - tdist[..., :-1]) * jnp.linalg.norm(
      dirs[..., None, :], axis=-1)

  mlp = MLP(**MLP_KW, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(9)}, gaussians,
                    viewdirs, train=False)['params']

  def run(params, mode, fuse):
    mlp = MLP(**{**MLP_KW, 'fused_trunk': mode, 'fuse_compositing': fuse})
    return mlp.apply({'params': params}, gaussians, viewdirs, train=True,
                     delta=delta if fuse else None)

  ref = run(params, 'off', False)
  w_ref = render.compute_alpha_weights(ref['density'], tdist, dirs)[0]
  out = run(params, 'on', True)
  assert 'weights' in out, 'epilogue did not dispatch'
  np.testing.assert_allclose(out['weights'], w_ref, atol=2e-5, rtol=2e-4)

  def loss(params, mode, fuse):
    r = run(params, mode, fuse)
    w = r['weights'] if fuse else render.compute_alpha_weights(
        r['density'], tdist, dirs)[0]
    return (jnp.sum(jnp.sin(3.0 * w)) + jnp.mean(r['density']) +
            jnp.mean(jnp.sum(r['normals'] * r['normals_pred'], axis=-1)))

  g_ref = jax.grad(loss)(params, 'off', False)
  g_fus = jax.grad(loss)(params, 'on', True)
  for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_ref),
                          jax.tree.leaves(g_fus)):
    scale = max(1e-3, float(jnp.max(jnp.abs(a))))
    np.testing.assert_allclose(a, b, atol=3e-4 * scale, rtol=1e-3,
                               err_msg=jax.tree_util.keystr(path))


def test_fuse_compositing_gate_falls_back():
  """Non-dividing sample counts (9 % 16) must silently fall back to XLA
  compositing: no 'weights' key, everything else unchanged."""
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(10))  # 9 samples
  n_rays, n_samples = gaussians[0].shape[:2]
  delta = jnp.ones((n_rays, n_samples)) * 0.1
  mlp = MLP(**MLP_KW, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(11)}, gaussians,
                    viewdirs, train=False)['params']
  out = MLP(**{**MLP_KW, 'fused_trunk': 'on', 'fuse_compositing': True}
            ).apply({'params': params}, gaussians, viewdirs, train=True,
                    delta=delta)
  assert 'weights' not in out


@pytest.mark.parametrize('train', [True, False])
@pytest.mark.parametrize('rough', [True, False])
def test_fuse_dir_enc_matches(train, rough):
  """fuse_dir_enc=True (in-kernel IDE) == the XLA dir_enc path, including
  the gradients through refdirs (normals) and kappa_inv (roughness)."""
  overrides = dict(net_depth_viewdirs=4, deg_view=3,
                   enable_pred_roughness=rough)
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(20))
  mlp = MLP(**{**MLP_KW, **overrides}, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(21)}, gaussians,
                    viewdirs, train=False)['params']
  ref = _apply(params, gaussians, viewdirs, train,
               fused_trunk='on', **overrides)
  out = _apply(params, gaussians, viewdirs, train,
               fused_trunk='on', fuse_dir_enc=True, **overrides)
  assert set(ref) == set(out)
  for k in ref:
    if ref[k] is None or isinstance(ref[k], float):
      assert out[k] == ref[k], k
      continue
    np.testing.assert_allclose(ref[k], out[k], atol=2e-5, rtol=2e-4,
                               err_msg=k)


def test_fuse_dir_enc_gradients_match():
  """Full second-order loss grads with the in-kernel IDE: d loss flows
  through refdirs -> reflect -> normals (and the density-normal chain)."""
  overrides = dict(net_depth_viewdirs=4, deg_view=3)
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(22))
  mlp = MLP(**{**MLP_KW, **overrides}, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(23)}, gaussians,
                    viewdirs, train=False)['params']

  def loss(params, fuse):
    r = _apply(params, gaussians, viewdirs, True, fused_trunk='on',
               fuse_dir_enc=fuse, **overrides)
    t = jnp.mean((r['rgb'] - 0.5) ** 2) + jnp.mean(r['density'])
    t = t + jnp.mean(jnp.sum(r['normals'] * r['normals_pred'], axis=-1))
    t = t + jnp.mean(r['roughness'])
    return t

  g_ref = jax.grad(loss)(params, False)
  g_fus = jax.grad(loss)(params, True)
  flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
  flat_f = jax.tree.leaves(g_fus)
  assert len(flat_r) == len(flat_f)
  for (path, a), b in zip(flat_r, flat_f):
    scale = max(1e-3, float(jnp.max(jnp.abs(a))))
    np.testing.assert_allclose(
        a, b, atol=5e-4 * scale, rtol=1e-3,
        err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize('train', [True, False])
def test_fuse_dir_enc_no_reflections(train):
  """Broadcast plain-viewdir IDE (use_reflections=False) in-kernel."""
  overrides = dict(net_depth_viewdirs=4, deg_view=3, use_reflections=False,
                   enable_pred_normals=False, disable_density_normals=True,
                   enable_pred_roughness=False, use_n_dot_v=False)
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(24))
  mlp = MLP(**{**MLP_KW, **overrides}, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(25)}, gaussians,
                    viewdirs, train=False)['params']
  ref = _apply(params, gaussians, viewdirs, train,
               fused_trunk='on', **overrides)
  out = _apply(params, gaussians, viewdirs, train,
               fused_trunk='on', fuse_dir_enc=True, **overrides)
  for k in ref:
    if ref[k] is None or isinstance(ref[k], float):
      assert out[k] == ref[k], k
      continue
    np.testing.assert_allclose(ref[k], out[k], atol=2e-5, rtol=2e-4,
                               err_msg=k)


@pytest.mark.parametrize('train', [True, False])
def test_fuse_dir_rgb_matches(train):
  """fuse_dir_rgb=True (in-kernel color epilogue) == the XLA chain, for
  rgb and the diffuse/specular/tint extras."""
  overrides = dict(net_depth_viewdirs=4, deg_view=3,
                   rgb_premultiplier=1.5, rgb_bias=-0.1)
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(30))
  mlp = MLP(**{**MLP_KW, **overrides}, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(31)}, gaussians,
                    viewdirs, train=False)['params']
  ref = _apply(params, gaussians, viewdirs, train,
               fused_trunk='on', **overrides)
  out = _apply(params, gaussians, viewdirs, train,
               fused_trunk='on', fuse_dir_rgb=True, **overrides)
  assert set(ref) == set(out)
  for k in ref:
    if ref[k] is None or isinstance(ref[k], float):
      assert out[k] == ref[k], k
      continue
    np.testing.assert_allclose(ref[k], out[k], atol=2e-5, rtol=2e-4,
                               err_msg=k)


def test_fuse_dir_rgb_and_enc_gradients_match():
  """Both directional fusions on at once: full loss grads equal XLA."""
  overrides = dict(net_depth_viewdirs=4, deg_view=3)
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(32))
  mlp = MLP(**{**MLP_KW, **overrides}, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(33)}, gaussians,
                    viewdirs, train=False)['params']

  def loss(params, fuse):
    r = _apply(params, gaussians, viewdirs, True, fused_trunk='on',
               fuse_dir_rgb=fuse, fuse_dir_enc=fuse, **overrides)
    t = jnp.mean((r['rgb'] - 0.5) ** 2) + jnp.mean(r['density'])
    t = t + jnp.mean(jnp.sum(r['normals'] * r['normals_pred'], axis=-1))
    return t

  g_ref = jax.grad(loss)(params, False)
  g_fus = jax.grad(loss)(params, True)
  flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
  flat_f = jax.tree.leaves(g_fus)
  assert len(flat_r) == len(flat_f)
  for (path, a), b in zip(flat_r, flat_f):
    scale = max(1e-3, float(jnp.max(jnp.abs(a))))
    np.testing.assert_allclose(
        a, b, atol=5e-4 * scale, rtol=1e-3,
        err_msg=jax.tree_util.keystr(path))


def test_fuse_dir_rgb_falls_back_on_nonflagship_colors():
  """A non-sigmoid rgb_activation (or missing tint/srgb flags) must leave
  the XLA epilogue in charge - outputs still equal the plain path."""
  overrides = dict(net_depth_viewdirs=4, deg_view=3,
                   srgb_mapping_normalization=False)
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(34))
  mlp = MLP(**{**MLP_KW, **overrides}, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(35)}, gaussians,
                    viewdirs, train=False)['params']
  ref = _apply(params, gaussians, viewdirs, True,
               fused_trunk='on', **overrides)
  out = _apply(params, gaussians, viewdirs, True,
               fused_trunk='on', fuse_dir_rgb=True, **overrides)
  for k in ref:
    if ref[k] is None or isinstance(ref[k], float):
      assert out[k] == ref[k], k
      continue
    np.testing.assert_allclose(ref[k], out[k], atol=2e-5, rtol=2e-4,
                               err_msg=k)


@pytest.mark.parametrize('train', [True, False])
def test_fuse_dir_geo_matches(train):
  """fuse_dir_geo (in-kernel normalize/reflect/IDE/n.v) == the XLA path."""
  overrides = dict(net_depth_viewdirs=4, deg_view=3)
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(40))
  mlp = MLP(**{**MLP_KW, **overrides}, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(41)}, gaussians,
                    viewdirs, train=False)['params']
  ref = _apply(params, gaussians, viewdirs, train,
               fused_trunk='on', **overrides)
  out = _apply(params, gaussians, viewdirs, train, fused_trunk='on',
               fuse_dir_enc=True, fuse_dir_geo=True, **overrides)
  assert set(ref) == set(out)
  for k in ref:
    if ref[k] is None or isinstance(ref[k], float):
      assert out[k] == ref[k], k
      continue
    np.testing.assert_allclose(ref[k], out[k], atol=2e-5, rtol=2e-4,
                               err_msg=k)


def test_all_dir_fusions_gradients_match():
  """fuse_dir_enc + fuse_dir_geo + fuse_dir_rgb together: full loss grads
  (incl. second order through the density normals) equal the XLA path."""
  overrides = dict(net_depth_viewdirs=4, deg_view=3)
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(42))
  mlp = MLP(**{**MLP_KW, **overrides}, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(43)}, gaussians,
                    viewdirs, train=False)['params']

  def loss(params, fuse):
    r = _apply(params, gaussians, viewdirs, True, fused_trunk='on',
               fuse_dir_enc=fuse, fuse_dir_geo=fuse, fuse_dir_rgb=fuse,
               **overrides)
    t = jnp.mean((r['rgb'] - 0.5) ** 2) + jnp.mean(r['density'])
    t = t + jnp.mean(jnp.sum(r['normals'] * r['normals_pred'], axis=-1))
    t = t + jnp.mean(r['roughness'])
    return t

  g_ref = jax.grad(loss)(params, False)
  g_fus = jax.grad(loss)(params, True)
  flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
  flat_f = jax.tree.leaves(g_fus)
  assert len(flat_r) == len(flat_f)
  for (path, a), b in zip(flat_r, flat_f):
    scale = max(1e-3, float(jnp.max(jnp.abs(a))))
    np.testing.assert_allclose(
        a, b, atol=5e-4 * scale, rtol=1e-3,
        err_msg=jax.tree_util.keystr(path))


def test_inactive_fusion_flags_warn_once(caplog):
  """A fusion flag set on a config where it cannot take effect must log
  the fallback (once), not silently do nothing."""
  import logging as pylogging

  from refnerf_tpu.models import mlp as mlp_mod

  mlp_mod._FALLBACK_WARNED.clear()
  overrides = dict(net_depth_viewdirs=4, srgb_mapping_normalization=False)
  gaussians, viewdirs = _gaussians(jax.random.PRNGKey(50))
  mlp = MLP(**{**MLP_KW, **overrides}, fused_trunk='off')
  params = mlp.init({'params': jax.random.PRNGKey(51)}, gaussians,
                    viewdirs, train=False)['params']
  with caplog.at_level(pylogging.WARNING):
    _apply(params, gaussians, viewdirs, False, fused_trunk='on',
           fuse_dir_rgb=True, **overrides)
    _apply(params, gaussians, viewdirs, False, fused_trunk='on',
           fuse_dir_rgb=True, **overrides)
  hits = [r for r in caplog.records
          if 'fuse_dir_rgb inactive' in r.getMessage()]
  assert len(hits) == 1
