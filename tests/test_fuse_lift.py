"""fuse_lift: closed-form lifted-Gaussian producer vs the [..., 3, 3] path.

`NerfMLP.fuse_lift = True` must be a pure performance knob: the model feeds
the fused spatial kernel (lm, lv) computed by render.cast_rays_lifted
(per-ray basis dot products + 1D frustum moments) instead of
lift_and_diagonalize(cast_rays(..., diag=False)) - outputs and loss
gradients must match (reference chain: internal/render.py:105-129 +
internal/coord.py:129-133).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refnerf_tpu import configs as configs_lib
from refnerf_tpu.cameras import rays as rays_lib
from refnerf_tpu.models import construct
from refnerf_tpu.models import render
from refnerf_tpu.models.mlp import MLP
from refnerf_tpu.ops import coord
from refnerf_tpu.ops import geopoly

_TINY = """
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
NerfMLP.disable_density_normals = False
NerfMLP.enable_pred_normals = True
NerfMLP.use_directional_enc = True
NerfMLP.use_reflections = True
NerfMLP.enable_pred_roughness = True
NerfMLP.use_diffuse_color = True
NerfMLP.use_specular_tint = True
NerfMLP.use_n_dot_v = True
NerfMLP.fused_trunk = 'on'
NerfMLP.fused_block = 16
"""


@pytest.mark.parametrize('ray_shape', ['cone', 'cylinder'])
def test_cast_rays_lifted_matches_lift(ray_shape):
  key = jax.random.PRNGKey(0)
  k1, k2, k3, k4 = jax.random.split(key, 4)
  n, s = 6, 9
  tdist = jnp.sort(jax.random.uniform(k1, (n, s + 1), minval=0.5, maxval=4.0),
                   axis=-1)
  origins = jax.random.normal(k2, (n, 3)) * 0.3
  directions = jax.random.normal(k3, (n, 3))
  radii = jax.random.uniform(k4, (n, 1), minval=1e-3, maxval=1e-2)
  basis = jnp.asarray(
      np.array(geopoly.generate_basis('octahedron', 1)).T)

  means_ref, covs_ref = render.cast_rays(
      tdist, origins, directions, radii, ray_shape, diag=False)
  lm_ref, lv_ref = coord.lift_and_diagonalize(means_ref, covs_ref, basis)

  means, lm, lv = render.cast_rays_lifted(
      tdist, origins, directions, radii, ray_shape, basis)

  np.testing.assert_allclose(means, means_ref, atol=1e-6, rtol=1e-5)
  np.testing.assert_allclose(lm, lm_ref, atol=1e-5, rtol=1e-5)
  np.testing.assert_allclose(lv, lv_ref, atol=1e-7, rtol=1e-4)


def _build(extra='', n_rays=4):
  config, gin = configs_lib.parse(None, [_TINY + extra])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  rays = rays_lib.dummy_rays(n_rays).replace(
      origins=jnp.ones((n_rays, 3)) * jnp.array([0.0, 0.0, -1.0]),
      directions=jnp.broadcast_to(jnp.array([0.1, 0.0, 1.0]), (n_rays, 3)),
      viewdirs=jnp.broadcast_to(
          jnp.array([0.0995, 0.0, 0.995]), (n_rays, 3)),
      radii=jnp.full((n_rays, 1), 0.01),
      near=jnp.full((n_rays, 1), 0.5),
      far=jnp.full((n_rays, 1), 3.0))
  return model, params, rays


@pytest.mark.parametrize('extra', ['', 'Model.disable_integration = True\n'],
                         ids=['ipe', 'disable_integration'])
def test_model_fuse_lift_matches(extra):
  model_ref, params, rays = _build(extra)
  model_fl, params_fl, _ = _build(extra + 'NerfMLP.fuse_lift = True\n')
  assert jax.tree.structure(params) == jax.tree.structure(params_fl)

  ref, _ = model_ref.apply({'params': params}, rays, train_frac=1.0,
                           compute_extras=True, train=True)
  out, _ = model_fl.apply({'params': params}, rays, train_frac=1.0,
                          compute_extras=True, train=True)
  assert set(ref[-1]) == set(out[-1])
  for k in ref[-1]:
    np.testing.assert_allclose(out[-1][k], ref[-1][k], atol=2e-5, rtol=2e-4,
                               err_msg=k)


def test_model_fuse_lift_gradients_match():
  model_ref, params, rays = _build()
  model_fl, _, _ = _build('NerfMLP.fuse_lift = True\n')

  def loss(params, model):
    renderings, ray_history = model.apply(
        {'params': params}, rays, train_frac=1.0, compute_extras=False,
        train=True)
    r = renderings[-1]
    h = ray_history[-1]
    t = jnp.mean((r['rgb'] - 0.3) ** 2) + jnp.mean(r['acc'])
    # Second-order chain: density normals feed the loss.
    t = t + jnp.mean(jnp.sum(h['normals'] * h['normals_pred'], axis=-1))
    return t

  g_ref = jax.grad(loss)(params, model_ref)
  g_fl = jax.grad(loss)(params, model_fl)
  flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
  flat_f = jax.tree.leaves(g_fl)
  assert len(flat_r) == len(flat_f)
  for (path, a), b in zip(flat_r, flat_f):
    scale = max(1e-3, float(jnp.max(jnp.abs(a))))
    np.testing.assert_allclose(a, b, atol=5e-4 * scale, rtol=1e-3,
                               err_msg=jax.tree_util.keystr(path))


def test_model_fuse_ipe_trig_matches():
  """fuse_ipe_trig (in-kernel scale expansion + trig) == the XLA producer,
  with and without fuse_lift."""
  model_ref, params, rays = _build()
  for extra in ['NerfMLP.fuse_ipe_trig = True\n',
                'NerfMLP.fuse_ipe_trig = True\nNerfMLP.fuse_lift = True\n']:
    model_t, _, _ = _build(extra)
    ref, _ = model_ref.apply({'params': params}, rays, train_frac=1.0,
                             compute_extras=False, train=True)
    out, _ = model_t.apply({'params': params}, rays, train_frac=1.0,
                           compute_extras=False, train=True)
    for k in ref[-1]:
      np.testing.assert_allclose(out[-1][k], ref[-1][k], atol=2e-5,
                                 rtol=2e-4, err_msg=f'{extra}/{k}')


def test_fuse_lift_under_remat():
  """Model.remat wraps the MLP in nn.remat(static_argnums=(4,)); the
  lifted pytree is a later positional arg and must trace through."""
  extra = ('Model.remat = True\nNerfMLP.fuse_lift = True\n'
           'NerfMLP.fuse_compositing = True\n')
  model, params, rays = _build(extra)

  def loss(p):
    r, h = model.apply({'params': p}, rays, train_frac=1.0,
                       compute_extras=False, train=True)
    return (jnp.mean((r[-1]['rgb'] - 0.3) ** 2) +
            jnp.mean(jnp.sum(h[-1]['normals'] * h[-1]['normals_pred'],
                             axis=-1)))

  g = jax.grad(loss)(params)
  assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))


def test_lifted_requires_fused_path():
  """Passing lifted into the plain path is a wiring bug - loud error."""
  key = jax.random.PRNGKey(1)
  means = jax.random.normal(key, (4, 8, 3))
  covs = jnp.ones((4, 8, 3, 3)) * 1e-4
  viewdirs = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (4, 3))
  kw = dict(net_depth=2, net_width=16, net_depth_viewdirs=1,
            net_width_viewdirs=16, bottleneck_width=8, max_deg_point=4,
            deg_view=2, basis_shape='octahedron', basis_subdivisions=1,
            disable_density_normals=True, fused_trunk='off')
  mlp = MLP(**kw)
  params = mlp.init({'params': jax.random.PRNGKey(2)}, (means, covs),
                    viewdirs, train=False)['params']
  lm = jnp.zeros((4, 8, 3))
  lv = jnp.zeros((4, 8, 3))
  with pytest.raises(ValueError, match='fused spatial path'):
    mlp.apply({'params': params}, (means, None), viewdirs, train=False,
              lifted=(lm, lv))
