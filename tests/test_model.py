import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refnerf_tpu import configs as configs_lib
from refnerf_tpu.cameras import rays as rays_lib
from refnerf_tpu.models import construct

# Small bindings so CPU tests stay fast.
_TINY_MODEL = """
Model.num_levels = 2
Model.single_mlp = True
Model.num_prop_samples = 8
Model.num_nerf_samples = 8
Model.anneal_slope = 0.
Model.dilation_bias = 0.
Model.dilation_multiplier = 0.
Model.single_jitter = False
Model.resample_padding = 0.01
NerfMLP.net_depth = 2
NerfMLP.net_width = 16
NerfMLP.net_depth_viewdirs = 1
NerfMLP.net_width_viewdirs = 16
NerfMLP.bottleneck_width = 8
NerfMLP.max_deg_point = 4
NerfMLP.deg_view = 2
NerfMLP.basis_shape = 'octahedron'
NerfMLP.basis_subdivisions = 1
NerfMLP.density_bias = 0.5
"""

_REFNERF_FLAGS = """
NerfMLP.disable_density_normals = False
NerfMLP.enable_pred_normals = True
NerfMLP.use_directional_enc = True
NerfMLP.use_reflections = True
NerfMLP.enable_pred_roughness = True
NerfMLP.use_diffuse_color = True
NerfMLP.use_specular_tint = True
NerfMLP.use_n_dot_v = True
"""

_MIPNERF_FLAGS = """
NerfMLP.disable_density_normals = True
NerfMLP.enable_pred_normals = False
NerfMLP.use_directional_enc = False
NerfMLP.use_reflections = False
NerfMLP.enable_pred_roughness = False
NerfMLP.use_diffuse_color = False
NerfMLP.use_specular_tint = False
NerfMLP.use_n_dot_v = False
"""


def _build(flags, n_rays=4):
  config, gin = configs_lib.parse(None, [_TINY_MODEL + flags])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  test_rays = rays_lib.dummy_rays(n_rays)
  # Give the dummy rays sensible geometry.
  test_rays = test_rays.replace(
      origins=jnp.ones((n_rays, 3)) * jnp.array([0.0, 0.0, -1.0]),
      directions=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n_rays, 3)),
      viewdirs=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n_rays, 3)),
      radii=jnp.full((n_rays, 1), 0.01),
      near=jnp.full((n_rays, 1), 0.5),
      far=jnp.full((n_rays, 1), 3.0))
  return model, params, test_rays


@pytest.mark.parametrize('flags', [_MIPNERF_FLAGS, _REFNERF_FLAGS],
                         ids=['mipnerf', 'refnerf'])
def test_forward_shapes_and_finiteness(flags):
  model, params, test_rays = _build(flags)
  renderings, ray_history = model.apply(
      {'params': params}, test_rays, train_frac=1.0, compute_extras=False,
      train=True)
  assert len(renderings) == 2 and len(ray_history) == 2
  final = renderings[-1]
  assert final['rgb'].shape == (4, 3)
  assert final['acc'].shape == (4,)
  assert final['distance'].shape == (4, 1)
  for r in renderings:
    for v in jax.tree_util.tree_leaves(r):
      assert np.all(np.isfinite(np.asarray(v)))
  h = ray_history[-1]
  assert h['density'].shape == (4, 8)
  assert h['weights'].shape == (4, 8)
  assert h['sdist'].shape == (4, 9)


def test_refnerf_ray_history_contents():
  model, params, test_rays = _build(_REFNERF_FLAGS)
  _, ray_history = model.apply(
      {'params': params}, test_rays, train_frac=0.5, compute_extras=False,
      train=True)
  h = ray_history[-1]
  for k in ['normals', 'normals_pred', 'grad_pred', 'tint', 'diffuse',
            'specular', 'roughness']:
    assert k in h, k
  # Normals are unit length.
  n = np.asarray(h['normals'])
  np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)
  npred = np.asarray(h['normals_pred'])
  np.testing.assert_allclose(np.linalg.norm(npred, axis=-1), 1.0, atol=1e-4)


def test_eval_mode_has_no_density_normals():
  model, params, test_rays = _build(_REFNERF_FLAGS)
  _, ray_history = model.apply(
      {'params': params}, test_rays, train_frac=1.0, compute_extras=False,
      train=False)
  # Matches reference semantics: density normals only in training
  # (models.py:603); predicted normals still present for reflections.
  assert ray_history[-1]['normals'] is None
  assert ray_history[-1]['normals_pred'] is not None


def test_compute_extras_buffers():
  model, params, test_rays = _build(_REFNERF_FLAGS)
  renderings, _ = model.apply(
      {'params': params}, test_rays, train_frac=1.0, compute_extras=True,
      train=False)
  final = renderings[-1]
  for k in ['distance_mean', 'distance_median', 'ray_sdist', 'ray_weights',
            'ray_rgbs', 'normals_pred', 'roughness', 'tint']:
    assert k in final, k


def test_gradients_flow_second_order():
  # The density-normal path is a nested grad; differentiate through it.
  model, params, test_rays = _build(_REFNERF_FLAGS)

  def loss_fn(p):
    renderings, ray_history = model.apply(
        {'params': p}, test_rays, train_frac=0.5, compute_extras=False,
        train=True)
    # Touch both the color and the normals so the double-backward runs.
    n = ray_history[-1]['normals']
    npred = ray_history[-1]['normals_pred']
    normal_loss = jnp.mean(1 - jnp.sum(n * npred, axis=-1))
    return jnp.mean(renderings[-1]['rgb'] ** 2) + normal_loss

  grads = jax.grad(loss_fn)(params)
  leaves = jax.tree_util.tree_leaves(grads)
  assert leaves
  for g in leaves:
    assert np.all(np.isfinite(np.asarray(g)))
  # At least some weights receive nonzero gradient.
  total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
  assert total > 0


def test_deterministic_forward_is_reproducible():
  model, params, test_rays = _build(_REFNERF_FLAGS)
  r1, _ = model.apply({'params': params}, test_rays, train_frac=1.0,
                      compute_extras=False, train=False)
  r2, _ = model.apply({'params': params}, test_rays, train_frac=1.0,
                      compute_extras=False, train=False)
  np.testing.assert_array_equal(np.asarray(r1[-1]['rgb']),
                                np.asarray(r2[-1]['rgb']))


def test_single_mlp_shares_parameters():
  config, gin = configs_lib.parse(None, [_TINY_MODEL + _MIPNERF_FLAGS])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  assert 'nerf_mlp' in params and 'prop_mlp' not in params


def test_two_mlp_mode():
  bindings = _TINY_MODEL.replace('Model.single_mlp = True',
                                 'Model.single_mlp = False')
  bindings += _MIPNERF_FLAGS
  bindings += "PropMLP.disable_rgb = True\nPropMLP.net_depth = 2\n"
  bindings += "PropMLP.disable_density_normals = True\n"
  config, gin = configs_lib.parse(None, [bindings])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  assert 'nerf_mlp' in params and 'prop_mlp' in params


def test_n_dot_v_without_reflections_renders_in_eval():
  """use_n_dot_v without reflections/pred-normals must compute density
  normals in eval too (normals_to_use was None -> trace crash)."""
  flags = """
NerfMLP.disable_density_normals = False
NerfMLP.enable_pred_normals = False
NerfMLP.use_directional_enc = True
NerfMLP.use_reflections = False
NerfMLP.use_n_dot_v = True
"""
  model, params, test_rays = _build(flags)
  renderings, _ = model.apply({'params': params}, test_rays, train_frac=1.0,
                              compute_extras=False, train=False)
  assert np.isfinite(np.asarray(renderings[-1]['rgb'])).all()


def test_n_dot_v_without_any_normals_is_loud():
  import pytest as pytest_lib
  flags = """
NerfMLP.disable_density_normals = True
NerfMLP.enable_pred_normals = False
NerfMLP.use_directional_enc = True
NerfMLP.use_reflections = False
NerfMLP.use_n_dot_v = True
"""
  with pytest_lib.raises(ValueError, match='normals source'):
    _build(flags)


def test_roughness_without_reflections_renders():
  """Per-sample roughness attenuation must broadcast against per-sample
  view directions on the non-reflection IDE path (latent reference crash,
  models.py:668-672)."""
  flags = """
NerfMLP.disable_density_normals = True
NerfMLP.enable_pred_normals = False
NerfMLP.use_directional_enc = True
NerfMLP.use_reflections = False
NerfMLP.enable_pred_roughness = True
"""
  model, params, test_rays = _build(flags, n_rays=5)  # batch != samples
  renderings, _ = model.apply({'params': params}, test_rays, train_frac=1.0,
                              compute_extras=False, train=False)
  assert np.isfinite(np.asarray(renderings[-1]['rgb'])).all()


def test_diffuse_without_viewdirs_is_loud():
  import pytest as pytest_lib
  flags = """
Model.use_viewdirs = False
NerfMLP.disable_density_normals = True
NerfMLP.enable_pred_normals = False
NerfMLP.use_directional_enc = False
NerfMLP.use_reflections = False
NerfMLP.use_diffuse_color = True
"""
  with pytest_lib.raises(ValueError, match='use_diffuse_color requires'):
    _build(flags)


def test_fuse_compositing_opaque_background_falls_back():
  """opaque_background must route compositing to the exact XLA path (the
  in-kernel finite stand-in diverges for trained-empty rays); weights come
  from compute_alpha_weights and still sum to 1."""
  flags = _REFNERF_FLAGS + """
Model.opaque_background = True
NerfMLP.fused_trunk = 'on'
NerfMLP.fused_block = 8
NerfMLP.fuse_compositing = True
"""
  model, params, test_rays = _build(flags)
  renderings, ray_history = model.apply(
      {'params': params}, test_rays, train_frac=1.0,
      compute_extras=False, train=False)
  acc = np.asarray(renderings[-1]['acc'])
  np.testing.assert_allclose(acc, 1.0, atol=1e-5)  # opaque: alpha_last=1
