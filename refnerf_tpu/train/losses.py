"""The full loss library (ref: internal/train_utils.py:33-325).

All masked `[mask].mean()` constructs of the reference are rewritten as
weighted sums with static shapes (boolean indexing produces dynamic shapes,
which XLA cannot compile) - numerically identical, TPU-compilable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from refnerf_tpu.ops import image as image_ops
from refnerf_tpu.ops import ref_utils
from refnerf_tpu.ops import stepfun


def _sum_all(x, axis_name=None):
  """Global sum: local jnp.sum, psum'd across `axis_name` under shard_map."""
  s = jnp.sum(x)
  if axis_name is not None:
    s = jax.lax.psum(s, axis_name)
  return s


def _masked_mean(x, mask, axis_name=None):
  """mean(x[mask]) with static shapes; mask broadcasts against x.

  With axis_name set (explicit shard_map path), numerator and denominator
  are psum'd separately so the result equals the single-device value exactly
  (a mean of per-shard masked means would not, since masks are data-
  dependent)."""
  mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
  return (_sum_all(x * mask, axis_name) /
          jnp.maximum(1e-10, _sum_all(mask, axis_name)))


def compute_data_loss(batch, renderings, rays, config, axis_name=None):
  """Photometric loss over all levels + mse stats (ref: train_utils.py:33-88).

  Returns (loss, stats) where stats['mses'] is a per-level array.
  """
  data_losses = []
  mses = []
  stats = {}

  lossmult = jnp.broadcast_to(rays.lossmult, batch.rgb[..., :3].shape)
  if config.disable_multiscale_loss:
    lossmult = jnp.ones_like(lossmult)

  gt_rgb = batch.rgb[..., :3]
  if config.supervised_by_linear_rgb:
    gt_rgb = image_ops.srgb_to_linear(gt_rgb)

  denom = _sum_all(lossmult, axis_name)
  for rendering in renderings:
    resid_sq = (rendering['rgb'] - gt_rgb) ** 2
    mses.append(_sum_all(lossmult * resid_sq, axis_name) / denom)

    if config.data_loss_type == 'mse':
      data_loss = resid_sq
    elif config.data_loss_type == 'charb':
      data_loss = jnp.sqrt(resid_sq + config.charb_padding ** 2)
    else:
      raise ValueError(f'Unknown data_loss_type {config.data_loss_type}')
    data_losses.append(_sum_all(lossmult * data_loss, axis_name) / denom)

    if config.compute_disp_metrics and batch.disps is not None:
      disp = 1 / (1 + rendering['distance_mean'])
      stats.setdefault('disparity_mses', []).append(
          ((disp - batch.disps) ** 2).mean())

    if config.compute_normal_metrics and batch.normals is not None:
      if 'normals' in rendering and rendering['normals'] is not None:
        weights = rendering['acc'] * batch.alphas
        normalized_normals_gt = ref_utils.l2_normalize(batch.normals)
        normalized_normals = ref_utils.l2_normalize(rendering['normals'])
        # Global weighted ratio (numerator and denominator each psum'd):
        # compute_weighted_mae's local sum()/sum() would log a
        # mean-of-per-shard-ratios under shard_map, breaking this module's
        # exactness contract when weight mass is uneven across shards.
        one_eps = 1 - jnp.finfo(jnp.float32).eps
        ang = jnp.arccos(jnp.clip(
            (normalized_normals * normalized_normals_gt).sum(-1),
            -one_eps, one_eps))
        normal_mae = (_sum_all(weights * ang, axis_name) /
                      _sum_all(weights, axis_name) * 180.0 / jnp.pi)
      else:
        normal_mae = jnp.nan
      stats.setdefault('normal_maes', []).append(normal_mae)

  data_losses = jnp.stack(data_losses)
  loss = (config.data_coarse_loss_mult * jnp.sum(data_losses[:-1]) +
          config.data_loss_mult * data_losses[-1])
  stats['mses'] = jnp.stack(mses)
  for k in ('disparity_mses', 'normal_maes'):
    if k in stats:
      stats[k] = jnp.stack(stats[k])
  return loss, stats


def interlevel_loss(ray_history, config):
  """Proposal-supervision loss (mip-NeRF 360). Gradients stop at the NeRF
  level's histogram (ref: train_utils.py:151-162)."""
  last = ray_history[-1]
  c = jax.lax.stop_gradient(last['sdist'])
  w = jax.lax.stop_gradient(last['weights'])
  loss_interlevel = 0.0
  for ray_results in ray_history[:-1]:
    cp = ray_results['sdist']
    wp = ray_results['weights']
    loss_interlevel += jnp.mean(stepfun.lossfun_outer(c, w, cp, wp))
  return config.interlevel_loss_mult * loss_interlevel


def distortion_loss(ray_history, config):
  """mip-NeRF 360 distortion regularizer on the final level's histogram.

  The reference carries `distortion_loss_mult` in its config but never wires
  the loss into training; restored here as a first-class capability (all
  shipped configs set the mult to 0, so parity is unaffected)."""
  last = ray_history[-1]
  loss = jnp.mean(stepfun.lossfun_distortion(last['sdist'], last['weights']))
  return config.distortion_loss_mult * loss


def orientation_loss(rays, num_levels, ray_history, config):
  """Back-facing normal penalty, Ref-NeRF Eq 15 (ref: train_utils.py:165-183)."""
  total_loss = 0.0
  for i, ray_results in enumerate(ray_history):
    w = ray_results['weights']
    n = ray_results.get(config.orientation_loss_target)
    if n is None:
      raise ValueError(
          f'Normals ({config.orientation_loss_target!r}) cannot be absent '
          'if the orientation loss is on; the model config must enable '
          'that normals source.')
    # Negate viewdirs so they point from the surface toward the camera.
    v = -rays.viewdirs
    terms = ref_utils.orientation_loss_terms(w, n, v)
    loss = jnp.mean(terms.sum(axis=-1))
    mult = (config.orientation_coarse_loss_mult if i < num_levels - 1
            else config.orientation_loss_mult)
    total_loss += mult * loss
  return total_loss


def predicted_normal_loss(num_levels, ray_history, config):
  """Agreement between density normals and predicted normals
  (ref: train_utils.py:186-204)."""
  total_loss = 0.0
  for i, ray_results in enumerate(ray_history):
    w = ray_results['weights']
    n = ray_results.get('normals')
    n_pred = ray_results.get('normals_pred')
    if n is None or n_pred is None:
      raise ValueError('Predicted normals and gradient normals cannot be None '
                       'if predicted normal loss is on.')
    loss = jnp.mean((w * (1.0 - jnp.sum(n * n_pred, axis=-1))).sum(axis=-1))
    mult = (config.predicted_normal_coarse_loss_mult if i < num_levels - 1
            else config.predicted_normal_loss_mult)
    total_loss += mult * loss
  return total_loss


def compute_depth_smoothness_loss(renderings, config):
  """Bilateral edge-aware depth smoothness over sampled patches
  (ref: train_utils.py:90-119). Expects patch-shaped renderings
  [..., ph, pw, c]."""
  smoothness_losses = []
  loss = lambda x: jnp.mean(jnp.abs(x))
  bilateral = lambda x: jnp.exp(-jnp.abs(x).mean(-1, keepdims=True))

  for rendering in renderings:
    depths = rendering['distance']
    acc00 = jax.lax.stop_gradient(rendering['acc'][..., :-1, :-1, None])
    weights = jax.lax.stop_gradient(rendering['rgb'])

    v00 = depths[..., :-1, :-1, :]
    v01 = depths[..., :-1, 1:, :]
    v10 = depths[..., 1:, :-1, :]

    w01 = bilateral(weights[..., :-1, :-1, :] - weights[..., :-1, 1:, :])
    w10 = bilateral(weights[..., :-1, :-1, :] - weights[..., 1:, :-1, :])
    l1 = loss(acc00 * w01 * (v00 - v01) ** 2)
    l2 = loss(acc00 * w10 * (v00 - v10) ** 2)
    smoothness_losses.append((l1 + l2) / 2)

  smoothness_losses = jnp.stack(smoothness_losses)
  return (config.depth_smoothness_coarse_loss_mult *
          jnp.sum(smoothness_losses[:-1]) +
          config.depth_smoothness_loss_mult * smoothness_losses[-1])


def _var_unbiased(x, axis):
  """torch.var semantics (ddof=1), which the reference relies on."""
  n = x.shape[axis]
  return jnp.var(x, axis=axis, keepdims=True) * (n / max(1, n - 1))


def noisy_consistency_loss(num_levels, renderings, renderings_noise, config,
                           warmup_ratio=1.0, axis_name=None):
  """Diffuse/specular/normal consistency across perturbed views.

  The specular term is *negated*: specular color is encouraged to vary with
  viewpoint (ref: train_utils.py:240-248). Masked means are weighted sums.
  """
  total_diffuse_loss = 0.0
  total_specular_loss = 0.0
  total_normal_loss = 0.0
  n_angles = config.sample_noise_angles
  # The sampler clamps the noise-ray count to the batch (sampling.py:56);
  # derive the effective count from the rendered shape so tiny batches
  # (debug runs, micro-benches) group correctly instead of crashing.
  n_samples = renderings_noise[-1]['diffuse'].shape[0] // n_angles

  for i, (rendering, rendering_noise) in enumerate(
      zip(renderings, renderings_noise)):
    reshape_noise = lambda x: x.reshape(n_samples, n_angles, *x.shape[1:])
    noise_diffuse = reshape_noise(rendering_noise['diffuse'])
    noise_specular = reshape_noise(rendering_noise['specular'])

    mask = (rendering['acc'][:n_samples, None] >
            config.acc_threshold_for_consistency_loss)

    dtype_ = config.consistency_diffuse_loss_type
    if dtype_ == 'mse':
      diffuse_mse = (rendering['diffuse'][:n_samples, None] - noise_diffuse)**2
      diffuse_mse = diffuse_mse.mean(axis=1, keepdims=True)
      diffuse_loss = _masked_mean(diffuse_mse.sum(axis=-1), mask, axis_name)
    elif dtype_ == 'avg_mse':
      diffuse_mse = (rendering['diffuse'][:n_samples, None] -
                     noise_diffuse.mean(axis=1, keepdims=True)) ** 2
      diffuse_mse = diffuse_mse.mean(axis=1, keepdims=True)
      diffuse_loss = _masked_mean(diffuse_mse.sum(axis=-1), mask, axis_name)
    elif dtype_ == 'var':
      diffuse_rays = jnp.concatenate(
          [rendering['diffuse'][:n_samples, None], noise_diffuse], axis=1)
      diffuse_var = _var_unbiased(diffuse_rays, axis=1).mean(
          axis=-1, keepdims=True)
      diffuse_loss = _masked_mean(diffuse_var.sum(axis=-1), mask, axis_name)
    else:
      raise ValueError(f'Unknown consistency_diffuse_loss_type {dtype_}')

    stype = config.consistency_specular_loss_type
    if stype == 'mse':
      specular_mse = (rendering['specular'][:n_samples, None] -
                      noise_specular) ** 2
      specular_mse = specular_mse.mean(axis=1, keepdims=True)
      specular_loss = -_masked_mean(specular_mse.sum(axis=-1), mask, axis_name)
    elif stype == 'avg_mse':
      specular_mse = (rendering['specular'][:n_samples, None] -
                      noise_specular.mean(axis=1, keepdims=True)) ** 2
      specular_mse = specular_mse.mean(axis=1, keepdims=True)
      specular_loss = -_masked_mean(specular_mse.sum(axis=-1), mask, axis_name)
    elif stype == 'var':
      specular_rays = jnp.concatenate(
          [rendering['specular'][:n_samples, None], noise_specular], axis=1)
      specular_var = _var_unbiased(specular_rays, axis=1).mean(
          axis=-1, keepdims=True)
      specular_loss = -_masked_mean(specular_var.sum(axis=-1), mask, axis_name)
    else:
      raise ValueError(f'Unknown consistency_specular_loss_type {stype}')

    # Only touch the normal buffers when a normal-consistency term is
    # actually on: a normals-less model (e.g. mipnerf configs) with only
    # diffuse/specular consistency must not trip on missing keys.
    normals_on = (config.consistency_normal_loss_mult > 0 or
                  config.consistency_normal_coarse_loss_mult > 0)
    normal_loss = 0.0
    if normals_on:
      n = rendering.get('normals')
      n_pred = rendering.get('normals_pred')
      if n is None or n_pred is None:
        raise ValueError('Predicted normals and gradient normals cannot be '
                         'None if the normal consistency loss is on.')
      n = n[:n_samples, None]
      n_pred = n_pred[:n_samples, None]
      n_noise = reshape_noise(rendering_noise['normals'])
      n_pred_noise = reshape_noise(rendering_noise['normals_pred'])

      if config.consistency_normal_loss_target == 'normals':
        normal_err = (1.0 - jnp.sum(n * n_noise, axis=-1)).mean(
            axis=1, keepdims=True)
      elif config.consistency_normal_loss_target == 'normals_pred':
        normal_err = (1.0 - jnp.sum(n_pred * n_pred_noise, axis=-1)).mean(
            axis=1, keepdims=True)
      else:
        raise ValueError('Given an unknown type of '
                         'consistency_normal_loss_target.')
      normal_loss = _masked_mean(normal_err, mask, axis_name)

    if i < num_levels - 1:
      total_diffuse_loss += (warmup_ratio *
                             config.consistency_diffuse_coarse_loss_mult *
                             diffuse_loss)
      total_specular_loss += (warmup_ratio *
                              config.consistency_specular_coarse_loss_mult *
                              specular_loss)
      total_normal_loss += (warmup_ratio *
                            config.consistency_normal_coarse_loss_mult *
                            normal_loss)
    else:
      total_diffuse_loss += (warmup_ratio * config.consistency_diffuse_loss_mult
                             * diffuse_loss)
      total_specular_loss += (warmup_ratio *
                              config.consistency_specular_loss_mult *
                              specular_loss)
      total_normal_loss += (warmup_ratio * config.consistency_normal_loss_mult
                            * normal_loss)
  return total_diffuse_loss, total_specular_loss, total_normal_loss


def noisy_distance_consistency_loss(num_levels, rays, noisy_rays, renderings,
                                    renderings_noise, config,
                                    warmup_ratio=1.0, axis_name=None):
  """3D expected-surface-point consistency across perturbed views
  (ref: train_utils.py:279-306)."""
  total_distance_loss = 0.0
  n_angles = config.sample_noise_angles
  # Effective count after the sampler's batch clamp (see
  # noisy_consistency_loss).
  n_samples = renderings_noise[-1]['distance'].shape[0] // n_angles

  for i, (rendering, rendering_noise) in enumerate(
      zip(renderings, renderings_noise)):
    reshape_noise = lambda x: x.reshape(n_samples, n_angles, *x.shape[1:])
    origins = rays.origins[:n_samples, None]
    directions = rays.directions[:n_samples, None]
    distance = rendering['distance'][:n_samples, None]
    origins_ = reshape_noise(noisy_rays.origins)
    directions_ = reshape_noise(noisy_rays.directions)
    distance_ = reshape_noise(rendering_noise['distance'])

    mask = (rendering['acc'][:n_samples, None] >
            config.acc_threshold_for_consistency_loss)

    if config.consistency_distance_loss_type == 'mse':
      distance_mse = ((origins + directions * distance) -
                      (origins_ + directions_ * distance_)) ** 2
      distance_mse = distance_mse.mean(axis=1, keepdims=True)
      distance_loss = _masked_mean(distance_mse.sum(axis=-1), mask, axis_name)
    else:
      raise ValueError(f'Unknown consistency_distance_loss_type '
                       f'{config.consistency_distance_loss_type}')
    mult = (config.consistency_distance_coarse_loss_mult if i < num_levels - 1
            else config.consistency_distance_loss_mult)
    total_distance_loss += warmup_ratio * mult * distance_loss
  return total_distance_loss


def accumulated_weights_loss(renderings, config):
  """(1 - acc)^2 on the final level: push rays to full opacity
  (ref: train_utils.py:309-312)."""
  return config.accumulated_weights_loss_mult * jnp.mean(
      (1 - renderings[-1]['acc']) ** 2)


def weights_entropy_loss(num_levels, renderings, ray_history, config,
                         warmup_ratio, axis_name=None):
  """Shannon entropy of compositing weights on high-opacity rays
  (ref: train_utils.py:314-325)."""
  total_loss = 0.0
  for i, (rendering, ray_results) in enumerate(zip(renderings, ray_history)):
    mask = rendering['acc'] > config.acc_threshold_for_weights_entropy_loss
    w = ray_results['weights']
    ent = (-w * jnp.log(w + 1e-10)).sum(axis=-1)
    loss = _masked_mean(ent, mask, axis_name)
    mult = (config.weights_entropy_coarse_loss_mult if i < num_levels - 1
            else config.weights_entropy_loss_mult)
    total_loss += warmup_ratio * mult * loss
  return total_loss
