"""Explicit-collective data parallelism via shard_map + psum.

The default path lets GSPMD infer the gradient all-reduce from shardings
(parallel/mesh.py). This module is the explicit alternative: the train step
runs per-shard under `jax.shard_map`, and gradients (plus scalar stats) are
reduced with `jax.lax.psum` over the 'data' axis - the hand-written analog of
the reference's DDP allreduce (train.py:88), riding ICI.

Loss coverage matches the GSPMD step, including the geometry/consistency
losses (the flagship llff_refnerf_geometry_losses.gin stack). Two reduction
regimes keep every term exactly equal to its single-device value:

  * plain-mean terms (data under uniform lossmult, interlevel, orientation,
    predicted-normal, distortion, smoothness, acc): per-shard value, pmean'd
    with the gradients - exact because shards are equal-sized;
  * masked-mean terms (data under non-uniform lossmult, weights-entropy,
    the consistency family): numerator and denominator psum'd separately
    inside the loss (losses.py `axis_name`), because masks are data-
    dependent and a mean of per-shard ratios would drift. Their per-shard
    values are already global, so the outer pmean is a no-op on them.

Consistency rays are the GLOBAL batch prefix, exactly as in the GSPMD path:
the prefix rows (which live in shard 0, since sample_noise_size must fit in
one shard's batch slice) are all_gather'd, each shard takes its
`sample_noise_size / n_shards` slice with a dynamic slice at its axis index,
and perturbs+re-renders those. The perturbation angles come from the same
un-folded per-step key as the GSPMD path (one global draw per step,
matching reference sample_utils.py:56-61). Collective transposes
(all_gather <-> psum_scatter, psum <-> psum) keep the outer grad pmean
exact, so with `randomized=False` the two strategies agree at ANY device
count - asserted at 8 devices by tests/test_shard_step.py and the
geometry-loss dryrun in __graft_entry__.py. (Forward-noise RNG streams are
still folded per shard; with `randomized=True` the strategies are
statistically, not bitwise, equivalent.)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from refnerf_tpu.parallel import mesh as mesh_lib
from refnerf_tpu.train import losses as losses_lib
from refnerf_tpu.train import sampling
from refnerf_tpu.train import step as step_lib


def make_sharded_train_step(model, config, mesh, raycast_fn=None):
  """An explicitly-sharded train step: (replicated state, sharded batch) ->
  (replicated state, replicated stats).

  Per-shard losses are averaged with psum(loss)/n rather than relying on
  GSPMD; gradients are psum-averaged before the (replicated) optimizer
  update, so every device applies the identical update.
  """
  num_levels = model.num_levels
  axis = mesh_lib.DATA_AXIS
  n_shards = mesh.shape[axis]

  consistency_on = step_lib._consistency_enabled(config)
  distance_consistency_on = step_lib._distance_consistency_enabled(config)
  compute_extras = (config.compute_disp_metrics or
                    config.compute_normal_metrics or consistency_on or
                    distance_consistency_on)

  local_config = config
  if consistency_on or distance_consistency_on:
    if config.sample_noise_size % n_shards != 0:
      raise ValueError(
          f'sample_noise_size {config.sample_noise_size} must divide across '
          f'{n_shards} shards.')
    if config.sample_noise_size * n_shards > config.batch_size:
      raise ValueError(
          f'sample_noise_size {config.sample_noise_size} must fit in one '
          f'shard (batch_size {config.batch_size} / {n_shards} shards) so '
          'the global consistency-ray prefix can be gathered in one hop.')
    # The consistency losses read sample_noise_size from the config; the
    # per-shard closure sees the per-shard count.
    local_config = dataclasses.replace(
        config, sample_noise_size=config.sample_noise_size // n_shards)

  def per_shard_grads(params, step, batch, cameras):
    """Runs on ONE shard of the batch; returns psum-averaged (loss, grads)."""
    train_frac = jnp.clip((step - 1) / (config.max_steps - 1), 0, 1)
    base_rng = jax.random.fold_in(jax.random.PRNGKey(config.seed),
                                  step.astype(jnp.int32))
    rng_fwd, rng_noise, rng_noisy_fwd = jax.random.split(base_rng, 3)
    if n_shards > 1:
      # Distinct per-shard streams for the forward sampling noise. rng_noise
      # is NOT folded: the perturbation angles are one global draw per step
      # (matching GSPMD and reference sample_utils.py:56-61), identical on
      # every shard.
      shard_id = jax.lax.axis_index(axis)
      rng_fwd = jax.random.fold_in(rng_fwd, shard_id)
      rng_noisy_fwd = jax.random.fold_in(rng_noisy_fwd, shard_id)

    rays = batch.rays
    from refnerf_tpu.cameras import rays as rays_lib
    if isinstance(rays, rays_lib.Pixels):
      rays = raycast_fn(cameras, rays)

    def loss_fn(p):
      renderings, ray_history = model.apply(
          {'params': p}, rays, train_frac=train_frac,
          compute_extras=compute_extras, train=True,
          rng=rng_fwd if config.randomized else None)

      ratio = step_lib._consistency_ratio(config, step)

      noisy_rays = None
      renderings_noise = None
      c_rays, c_rends = rays, renderings
      if consistency_on or distance_consistency_on:
        n_noise = local_config.sample_noise_size // config.patch_size ** 2
        if n_shards > 1:
          # The consistency set is the GLOBAL batch prefix (GSPMD/reference
          # semantics). Those rows live in shard 0 (checked above), so one
          # all_gather of the prefix + a dynamic slice at this shard's index
          # hands each shard its n_noise-row piece. Both collectives are
          # linear; their transposes route the loss gradient back to the
          # owning shard, and the outer grad pmean stays exact.
          n_noise_g = config.sample_noise_size // config.patch_size ** 2
          sid = jax.lax.axis_index(axis)

          def prefix_slice(x):
            g = jax.lax.all_gather(x[:n_noise_g], axis)[0]
            return jax.lax.dynamic_slice_in_dim(g, sid * n_noise, n_noise, 0)

          c_rays = jax.tree_util.tree_map(prefix_slice, rays)
          c_keys = ('diffuse', 'specular', 'normals', 'normals_pred',
                    'distance', 'acc')
          c_rends = [{k: prefix_slice(r[k]) for k in c_keys
                      if r.get(k) is not None} for r in renderings]
        noisy_rays = sampling.sample_noisy_rays(
            rng_noise, c_rays, c_rends[-1], config.sample_angle_range,
            n_noise, config.sample_noise_angles, ratio)
        renderings_noise, _ = model.apply(
            {'params': p}, noisy_rays, train_frac=train_frac,
            compute_extras=True, train=True,
            rng=rng_noisy_fwd if config.randomized else None)

      terms = {}
      data_loss, stats = losses_lib.compute_data_loss(
          batch, renderings, rays, config, axis_name=axis)
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
      if config.patch_size > 1 and (
          config.depth_smoothness_coarse_loss_mult > 0 or
          config.depth_smoothness_loss_mult > 0):
        terms['smoothness'] = losses_lib.compute_depth_smoothness_loss(
            renderings, config)
      if consistency_on:
        (terms['diffuse_consistency'],
         terms['specular_consistency'],
         terms['normals_consistency']) = losses_lib.noisy_consistency_loss(
             num_levels, c_rends, renderings_noise, local_config, ratio,
             axis_name=axis)
      if config.accumulated_weights_loss_mult > 0:
        terms['acc'] = losses_lib.accumulated_weights_loss(renderings, config)
      if distance_consistency_on:
        terms['distance_consistency'] = (
            losses_lib.noisy_distance_consistency_loss(
                num_levels, c_rays, noisy_rays, c_rends, renderings_noise,
                local_config, ratio, axis_name=axis))
      if (config.weights_entropy_loss_mult > 0 or
          config.weights_entropy_coarse_loss_mult > 0):
        terms['weights_entropy'] = losses_lib.weights_entropy_loss(
            num_levels, renderings, ray_history, config, ratio,
            axis_name=axis)

      return jnp.sum(jnp.stack(list(terms.values()))), stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    # THE collective: average loss/grads/stats across the data axis (ICI).
    # Terms computed with axis_name are already global on every shard, so
    # this pmean leaves them (and their gradient contributions) unchanged;
    # per-shard plain-mean terms get their exact global average here.
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
