"""The jitted, sharded train step: forward, 10+ losses, nested-grad normals,
noisy consistency second forward, Adam + log-lerp LR, gradient clipping.

Replaces the reference's Lightning training_step + hooks
(ref: internal/nerf_system.py:77-217) with ONE pure function compiled once:
  (TrainState, Batch) -> (TrainState, stats)
Data parallelism comes from sharding the batch's ray axis across the mesh;
GSPMD inserts the gradient psum over ICI (no DDP machinery).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state as flax_train_state

from refnerf_tpu.cameras import rays as rays_lib
from refnerf_tpu.ops import image as image_ops
from refnerf_tpu.ops import mathx
from refnerf_tpu.train import losses as losses_lib
from refnerf_tpu.train import sampling


class TrainState(flax_train_state.TrainState):
  """step/params/opt_state/apply_fn; flax TrainState is already a pytree."""


def create_lr_schedule(config) -> Callable[[Any], Any]:
  """Log-linear decay with reverse-cosine warmup (ref: math.py:46-78)."""
  def schedule(step):
    return mathx.learning_rate_decay(
        jnp.asarray(step, jnp.float32), config.lr_init, config.lr_final,
        config.max_steps, config.lr_delay_steps, config.lr_delay_mult)
  return schedule


def create_optimizer(config) -> optax.GradientTransformation:
  """Value-clip -> global-norm-clip -> Adam(scheduled LR), matching the
  reference order (clip then step; nerf_system.py:205-210 + Adam)."""
  chain = []
  if config.grad_max_val > 0:
    chain.append(optax.clip(config.grad_max_val))
  if config.grad_max_norm > 0:
    chain.append(optax.clip_by_global_norm(config.grad_max_norm))
  chain.append(optax.adam(
      learning_rate=create_lr_schedule(config),
      b1=config.adam_beta1, b2=config.adam_beta2, eps=config.adam_eps))
  return optax.chain(*chain)


def create_train_state(config, model, params) -> TrainState:
  return TrainState.create(
      apply_fn=model.apply, params=params, tx=create_optimizer(config))


def _consistency_enabled(config) -> bool:
  return config.sample_noise_size > 0 and (
      config.consistency_diffuse_coarse_loss_mult > 0 or
      config.consistency_specular_coarse_loss_mult > 0 or
      config.consistency_normal_coarse_loss_mult > 0 or
      config.consistency_diffuse_loss_mult > 0 or
      config.consistency_specular_loss_mult > 0 or
      config.consistency_normal_loss_mult > 0)


def _distance_consistency_enabled(config) -> bool:
  return (config.consistency_distance_loss_mult > 0 or
          config.consistency_distance_coarse_loss_mult > 0)


def _consistency_ratio(config, step):
  """Warmup-then-decay ratio for consistency losses
  (ref: nerf_system.py:101-114), as traced arithmetic."""
  ratio = jnp.asarray(1.0, jnp.float32)
  if 0.0 < config.consistency_warmup_steps <= 1.0:
    ratio = jnp.minimum(
        1.0, step / (config.consistency_warmup_steps * config.max_steps))
  if 0.0 < config.consistency_decay_steps <= 1.0:
    decay_start = config.consistency_decay_steps * config.max_steps
    steps_left = config.max_steps - step
    total_decay = config.max_steps - decay_start
    decay_ratio = jnp.maximum(0.0, steps_left / jnp.maximum(1.0, total_decay))
    ratio = jnp.where(step >= decay_start, decay_ratio, ratio)
  return ratio


def _param_stats(tree) -> Dict[str, Any]:
  out = {}
  for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
    name = '/'.join(
        p.key if hasattr(p, 'key') else str(p) for p in path)
    out[name] = leaf
  return out


def _grouped_reduce(named, reduce_fn):
  """Per-leaf full reductions, batched by leaf shape.

  A naive {name: reduce(leaf)} emits one tiny kernel per leaf per statistic
  (~240 kernels/step for the flagship's ~80 params - measured ~10% of the
  train step at batch 4096). Most leaves share a shape (e.g. 256x256 trunk
  kernels), so stack each shape group once and reduce over the trailing
  axes: a handful of kernels total, bit-identical results per leaf.
  """
  groups: Dict[Any, list] = {}
  for name, leaf in named.items():
    groups.setdefault(leaf.shape, []).append((name, leaf))
  out = {}
  for shape, members in groups.items():
    stacked = jnp.stack([leaf for _, leaf in members])
    red = reduce_fn(stacked.reshape((len(members), -1)))
    for i, (name, _) in enumerate(members):
      out[name] = red[i]
  return out


def make_train_step(model, config, raycast_fn=None):
  """Build the pure train-step function (jit it with sharded args).

  Args:
    model: the Flax Model module.
    config: Config.
    raycast_fn: optional (cameras, Pixels) -> Rays device-side caster, used
      when batches carry Pixels (cast_rays_in_train_step fast path).

  Returns:
    train_step(state, batch, cameras) -> (new_state, stats dict)
  """
  num_levels = model.num_levels
  consistency_on = _consistency_enabled(config)
  distance_consistency_on = _distance_consistency_enabled(config)
  if consistency_on or distance_consistency_on:
    # Values outside (0, 1] mean "window disabled" (_consistency_ratio);
    # only a genuinely inverted pair of ENABLED windows is a config error.
    if (0.0 < config.consistency_decay_steps <= 1.0 and
        0.0 < config.consistency_warmup_steps <= 1.0 and
        config.consistency_warmup_steps > config.consistency_decay_steps):
      raise ValueError('Consistency loss decay should be after whole warmup.')
    # Both loss families consume the noisy second forward; a zero noise-ray
    # budget would silently turn them into no-ops.
    if config.patch_size ** 2 > config.sample_noise_size:
      raise ValueError(
          f'Patch size {config.patch_size}^2 too large for sampling noise '
          f'view points {config.sample_noise_size}')

  # Extras are only needed when a loss/metric consumes composited normals or
  # distance stats; the reference computes them whenever sample_noise_size>0
  # (nerf_system.py:92-95), which wastes work when no consistency loss is on.
  compute_extras = (config.compute_disp_metrics or
                    config.compute_normal_metrics or consistency_on or
                    distance_consistency_on)

  def train_step(state: TrainState, batch, cameras=None):
    step = state.step.astype(jnp.float32)
    train_frac = jnp.clip((step - 1) / (config.max_steps - 1), 0, 1)
    base_rng = jax.random.PRNGKey(config.seed)
    step_rng = jax.random.fold_in(base_rng, state.step)

    rays = batch.rays
    if isinstance(rays, rays_lib.Pixels):
      if raycast_fn is None:
        raise ValueError('Batch carries Pixels but no raycast_fn was given.')
      rays = raycast_fn(cameras, rays)

    def loss_fn(params):
      rng_fwd, rng_noise, rng_noisy_fwd = jax.random.split(step_rng, 3)
      renderings, ray_history = model.apply(
          {'params': params}, rays, train_frac=train_frac,
          compute_extras=compute_extras, train=True,
          rng=rng_fwd if config.randomized else None)

      ratio = _consistency_ratio(config, step)

      noisy_rays = None
      renderings_noise = None
      if consistency_on or distance_consistency_on:
        n_noise = config.sample_noise_size // config.patch_size ** 2
        noisy_rays = sampling.sample_noisy_rays(
            rng_noise, rays, renderings[-1], config.sample_angle_range,
            n_noise, config.sample_noise_angles, ratio)
        renderings_noise, _ = model.apply(
            {'params': params}, noisy_rays, train_frac=train_frac,
            compute_extras=True, train=True,
            rng=rng_noisy_fwd if config.randomized else None)

      loss_terms = {}
      data_loss, stats = losses_lib.compute_data_loss(
          batch, renderings, rays, config)
      loss_terms['data'] = data_loss

      if config.interlevel_loss_mult > 0:
        loss_terms['interlevel'] = losses_lib.interlevel_loss(
            ray_history, config)

      if config.distortion_loss_mult > 0:
        loss_terms['distortion'] = losses_lib.distortion_loss(
            ray_history, config)

      if (config.orientation_coarse_loss_mult > 0 or
          config.orientation_loss_mult > 0):
        loss_terms['orientation'] = losses_lib.orientation_loss(
            rays, num_levels, ray_history, config)

      if (config.predicted_normal_coarse_loss_mult > 0 or
          config.predicted_normal_loss_mult > 0):
        loss_terms['predicted_normals'] = losses_lib.predicted_normal_loss(
            num_levels, ray_history, config)

      if config.patch_size > 1 and (
          config.depth_smoothness_coarse_loss_mult > 0 or
          config.depth_smoothness_loss_mult > 0):
        loss_terms['smoothness'] = losses_lib.compute_depth_smoothness_loss(
            renderings, config)

      if consistency_on:
        (loss_terms['diffuse_consistency'],
         loss_terms['specular_consistency'],
         loss_terms['normals_consistency']) = (
             losses_lib.noisy_consistency_loss(
                 num_levels, renderings, renderings_noise, config, ratio))

      if config.accumulated_weights_loss_mult > 0:
        loss_terms['acc'] = losses_lib.accumulated_weights_loss(
            renderings, config)

      if distance_consistency_on:
        loss_terms['distance_consistency'] = (
            losses_lib.noisy_distance_consistency_loss(
                num_levels, rays, noisy_rays, renderings, renderings_noise,
                config, ratio))

      if (config.weights_entropy_loss_mult > 0 or
          config.weights_entropy_coarse_loss_mult > 0):
        loss_terms['weights_entropy'] = losses_lib.weights_entropy_loss(
            num_levels, renderings, ray_history, config, ratio)

      total = jnp.sum(jnp.stack(list(loss_terms.values())))
      stats['loss'] = total
      stats['losses'] = loss_terms
      return total, stats

    (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

    new_state = state.apply_gradients(grads=grads)

    stats['psnrs'] = image_ops.mse_to_psnr(stats['mses'])
    stats['psnr'] = stats['psnrs'][-1]
    stats['learning_rate'] = create_lr_schedule(config)(state.step)

    # Per-param stat reductions are ~170 tiny kernels (~10% of step time at
    # batch 4096); gate them on the configured cadence. lax.cond executes
    # only the taken branch, so off-steps pay nothing.
    def param_stats(args):
      params, grads = args
      return (
          _grouped_reduce(_param_stats(params),
                          lambda x: jnp.sum(x * x, axis=-1)),
          _grouped_reduce(_param_stats(grads),
                          lambda x: jnp.sqrt(jnp.sum(x * x, axis=-1))),
          _grouped_reduce(_param_stats(grads),
                          lambda x: jnp.max(jnp.abs(x), axis=-1)))

    def zero_stats(args):
      params, grads = args
      zero = lambda tree: {k: jnp.zeros((), jnp.float32)
                           for k in _param_stats(tree)}
      return zero(params), zero(grads), zero(grads)

    if config.stats_every <= 1:
      w_l2s, g_norms, g_maxes = param_stats((state.params, grads))
    else:
      w_l2s, g_norms, g_maxes = jax.lax.cond(
          state.step % config.stats_every == 0,
          param_stats, zero_stats, (state.params, grads))
    stats['weights_l2s'] = w_l2s
    stats['grad_norms'] = g_norms
    stats['grad_maxes'] = g_maxes
    return new_state, stats

  return train_step


