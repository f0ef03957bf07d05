"""Explicit-collective data parallelism via shard_map + psum.

The default path lets GSPMD infer the gradient all-reduce from shardings
(parallel/mesh.py). This module is the explicit alternative: the train step
runs per-shard under `jax.shard_map`, and gradients (plus scalar stats) are
reduced with `jax.lax.psum` over the 'data' axis - the hand-written analog of
the reference's DDP allreduce (train.py:88), riding ICI.

Useful when you want manual control of what is reduced (e.g. skipping stat
reductions) or to compose with other meshes later (tp/pp axes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from refnerf_tpu.parallel import mesh as mesh_lib
from refnerf_tpu.train import losses as losses_lib
from refnerf_tpu.train import step as step_lib


def make_sharded_train_step(model, config, mesh, raycast_fn=None):
  """An explicitly-sharded train step: (replicated state, sharded batch) ->
  (replicated state, replicated stats).

  Per-shard losses are averaged with psum(loss)/n rather than relying on
  GSPMD; gradients are psum-averaged before the (replicated) optimizer
  update, so every device applies the identical update.
  """
  num_levels = model.num_levels
  if step_lib._consistency_enabled(config) or (
      step_lib._distance_consistency_enabled(config)):
    raise NotImplementedError(
        'The explicit shard_map path currently covers the standard loss '
        'stack; consistency losses use the GSPMD path.')

  axis = mesh_lib.DATA_AXIS

  def per_shard_grads(params, step, batch, cameras):
    """Runs on ONE shard of the batch; returns psum-averaged (loss, grads)."""
    train_frac = jnp.clip((step - 1) / (config.max_steps - 1), 0, 1)
    rng = jax.random.fold_in(jax.random.PRNGKey(config.seed),
                             step.astype(jnp.int32))
    rays = batch.rays
    from refnerf_tpu.cameras import rays as rays_lib
    if isinstance(rays, rays_lib.Pixels):
      rays = raycast_fn(cameras, rays)

    def loss_fn(p):
      renderings, ray_history = model.apply(
          {'params': p}, rays, train_frac=train_frac,
          compute_extras=False, train=True,
          rng=rng if config.randomized else None)
      terms = {}
      data_loss, stats = losses_lib.compute_data_loss(
          batch, renderings, rays, config)
      terms['data'] = data_loss
      if config.interlevel_loss_mult > 0:
        terms['interlevel'] = losses_lib.interlevel_loss(ray_history, config)
      if config.distortion_loss_mult > 0:
        terms['distortion'] = losses_lib.distortion_loss(ray_history, config)
      if (config.orientation_coarse_loss_mult > 0 or
          config.orientation_loss_mult > 0):
        terms['orientation'] = losses_lib.orientation_loss(
            rays, num_levels, ray_history, config)
      if (config.predicted_normal_coarse_loss_mult > 0 or
          config.predicted_normal_loss_mult > 0):
        terms['predicted_normals'] = losses_lib.predicted_normal_loss(
            num_levels, ray_history, config)
      return jnp.sum(jnp.stack(list(terms.values()))), stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    # THE collective: average loss/grads/stats across the data axis (ICI).
    loss = jax.lax.pmean(loss, axis)
    grads = jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, axis), grads)
    stats = jax.tree_util.tree_map(lambda s: jax.lax.pmean(s, axis), stats)
    return loss, grads, stats

  shard_fn = jax.shard_map(
      per_shard_grads,
      mesh=mesh,
      in_specs=(P(), P(), P(axis), P()),
      out_specs=(P(), P(), P()),
      check_vma=False)

  def train_step(state, batch, cameras=None):
    loss, grads, stats = shard_fn(
        state.params, state.step.astype(jnp.float32), batch, cameras)
    new_state = state.apply_gradients(grads=grads)
    stats = dict(stats)
    stats['loss'] = loss
    return new_state, stats

  return jax.jit(train_step, donate_argnums=(0,))
