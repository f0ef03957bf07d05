"""Model construction from Config + gin bindings.

Replaces the reference's gin-decorated classes + LazyLinear dummy-forward
materialization (models.py:324-340): Flax modules are shape-polymorphic, so
`init_params` runs one traced init on dummy rays instead of an eager forward.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
from refnerf_tpu import configs as configs_lib
from refnerf_tpu.cameras import rays as rays_lib
from refnerf_tpu.models.mlp import MLP
from refnerf_tpu.models.model import Model
from refnerf_tpu.utils import ginlite


def _clean_raydist_fn(v):
  """gin may carry raydist_fn as a @reference (e.g. @torch.reciprocal)."""
  if v is None or isinstance(v, str):
    return v
  if isinstance(v, ginlite.Ref):
    return v.name.split('.')[-1]
  return v


def construct_model(config, gin: Optional[ginlite.GinConfig] = None,
                    scope: Optional[str] = None) -> Model:
  """Build the (unbound) Model module from Config + gin bindings."""
  gin = gin or ginlite.GinConfig()
  m_kwargs = dict(configs_lib.model_kwargs(gin, scope=scope))
  single_mlp = bool(m_kwargs.pop('single_mlp', False))
  # Rematerialize MLP activations in the backward pass: trades FLOPs for
  # HBM, the standard TPU recipe for large ray batches (bind `Model.remat`).
  remat = bool(m_kwargs.pop('remat', False))
  if 'raydist_fn' in m_kwargs:
    m_kwargs['raydist_fn'] = _clean_raydist_fn(m_kwargs['raydist_fn'])

  nerf_kwargs = configs_lib.mlp_kwargs(gin, 'NerfMLP', scope=scope)
  prop_kwargs = configs_lib.mlp_kwargs(gin, 'PropMLP', scope=scope)

  mlp_cls = nn.remat(MLP, static_argnums=(4,)) if remat else MLP
  nerf_mlp = mlp_cls(name='NerfMLP', **nerf_kwargs)
  prop_mlp = None if single_mlp else mlp_cls(name='PropMLP', **prop_kwargs)

  return Model(
      nerf_mlp=nerf_mlp,
      prop_mlp=prop_mlp,
      render_with_specular_density=config.render_with_specular_density,
      srgb_mapping_type=config.srgb_mapping_type,
      srgb_mapping_when_rendering=config.srgb_mapping_when_rendering,
      vis_num_rays=config.vis_num_rays,
      **m_kwargs)


def init_params(rng, model: Model, num_rays: int = 2):
  """Initialize model parameters with a dummy ray bundle."""
  dummy = rays_lib.dummy_rays(num_rays)
  variables = model.init(
      {'params': rng}, dummy, train_frac=1.0, compute_extras=False,
      train=False)
  return variables['params']


def setup_model(config, gin=None, seed=None, raycast_fn=None):
  """One-call setup: model + TrainState + jitted train step + render fn.

  The convenience mirror of the reference's train_utils.setup_model
  (train_utils.py:480-493), returning functional-JAX equivalents.
  """
  import jax
  from refnerf_tpu.models import renderer as renderer_lib
  from refnerf_tpu.train import step as step_lib

  model = construct_model(config, gin)
  params = init_params(
      jax.random.PRNGKey(config.seed if seed is None else seed), model)
  state = step_lib.create_train_state(config, model, params)
  train_step = jax.jit(
      step_lib.make_train_step(model, config, raycast_fn=raycast_fn),
      donate_argnums=(0,))

  # Takes params explicitly (train_step donates the state's buffers, so a
  # closure over the initial params would hold deleted arrays).
  @jax.jit
  def render_fn(params, rays, train_frac=1.0):
    return model.apply({'params': params}, rays, train_frac=train_frac,
                       compute_extras=True, train=False)

  del renderer_lib  # renderer.render_image composes with functools.partial
  return model, state, train_step, render_fn
