"""The mip-NeRF 360 / Ref-NeRF sampling cascade as a Flax module.

Parity with reference internal/models.py:50-341, restructured for XLA: the
level loop is unrolled at trace time, every level's
resample -> cast -> IPE -> MLP -> composite chain fuses into one program, and
sampling is detached with `lax.stop_gradient` (the reference's
`.detach()`, models.py:215).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from refnerf_tpu.models import render
from refnerf_tpu.models.mlp import MLP
from refnerf_tpu.ops import coord
from refnerf_tpu.ops import stepfun


class Model(nn.Module):
  """num_levels of proposal resampling feeding a final NeRF level."""

  nerf_mlp: MLP
  prop_mlp: Optional[MLP]               # None => single_mlp (shared weights)
  num_prop_samples: int = 64            # samples per proposal level
  num_nerf_samples: int = 32            # samples at the final nerf level
  num_levels: int = 3                   # 3 == 2 proposals + 1 nerf
  bg_intensity_range: Tuple[float, float] = (1.0, 1.0)
  anneal_slope: float = 10.0            # Schlick annealing of resample logits
  use_viewdirs: bool = True
  raydist_fn: Optional[Any] = None      # t<->s warp curve (None = linear)
  ray_shape: str = 'cone'
  disable_integration: bool = False     # zero covariances (PE instead of IPE)
  single_jitter: bool = True            # one jitter per ray when randomized
  dilation_bias: float = 0.0025
  dilation_multiplier: float = 0.5
  resample_padding: float = 0.0         # histogram padding pre-log
  opaque_background: bool = False
  init_s_near: float = 0.0
  init_s_far: float = 1.0
  # Fields sourced from Config in the reference (models.py:250,285-287,294):
  render_with_specular_density: bool = False
  srgb_mapping_type: str = 'linear'
  srgb_mapping_when_rendering: bool = False
  vis_num_rays: int = 16

  def _level_mlp(self, is_prop):
    if self.prop_mlp is None:
      return self.nerf_mlp
    return self.prop_mlp if is_prop else self.nerf_mlp

  def __call__(self, rays, train_frac, compute_extras, train=False, rng=None):
    """Render a bundle of rays through the full cascade.

    Args:
      rays: cameras.rays.Rays pytree.
      train_frac: fraction of training complete, in [0, 1].
      compute_extras: compute vis/statistics buffers beyond color.
      train: training mode (enables density normals, noise, stratified
        sampling when rng is given).
      rng: optional PRNGKey; None reproduces the reference's fully
        deterministic sampling.

    Returns:
      (renderings, ray_history): per-level rendering dicts and per-level
      raw MLP outputs (+ sdist/weights) for the losses.
    """
    _, s_to_t = coord.construct_ray_warps(self.raydist_fn, rays.near, rays.far)

    # Initial single interval spanning [s_near, s_far] with weight 1.
    sdist = jnp.concatenate([
        jnp.full_like(rays.near, self.init_s_near),
        jnp.full_like(rays.far, self.init_s_far)], axis=-1)
    weights = jnp.ones_like(rays.near)
    prod_num_samples = 1

    ray_history = []
    renderings = []
    for i_level in range(self.num_levels):
      is_prop = i_level < (self.num_levels - 1)
      num_samples = self.num_prop_samples if is_prop else self.num_nerf_samples

      # Dilation is a multiple of the expected interval span plus a bias.
      dilation = self.dilation_bias + self.dilation_multiplier * (
          self.init_s_far - self.init_s_near) / prod_num_samples
      prod_num_samples *= num_samples

      use_dilation = self.dilation_bias > 0 or self.dilation_multiplier > 0
      if i_level > 0 and use_dilation:
        sdist, weights = stepfun.max_dilate_weights(
            sdist, weights, dilation,
            domain=(self.init_s_near, self.init_s_far),
            renormalize=True)
        sdist = sdist[..., 1:-1]
        weights = weights[..., 1:-1]

      if self.anneal_slope > 0:
        # Schlick's bias function (arxiv 2010.09714).
        bias = lambda x, s: (s * x) / ((s - 1) * x + 1)
        anneal = bias(train_frac, self.anneal_slope)
      else:
        anneal = 1.0

      # weights**anneal in log space; zero-width intervals get -inf logits.
      logits_resample = jnp.where(
          sdist[..., 1:] > sdist[..., :-1],
          anneal * jnp.log(weights + self.resample_padding),
          -jnp.inf)

      # Sampling is not differentiated through (optimization goes nonlinear).
      if rng is not None:
        rng, key_sample = jax.random.split(rng)
      else:
        key_sample = None
      # XLA's fusion runs inverse-CDF resampling at HBM speed-of-light here;
      # a hand-written Pallas kernel lost or tied at every realistic
      # (rays, bins, samples) size on v5e (docs/DESIGN.md "Pallas status"),
      # so the jnp formulation is the only path.
      sdist = jax.lax.stop_gradient(
          stepfun.sample_intervals(
              key_sample, sdist, logits_resample, num_samples,
              single_jitter=self.single_jitter,
              domain=(self.init_s_near, self.init_s_far)))

      tdist = s_to_t(sdist)

      mlp = self._level_mlp(is_prop)
      lifted = None
      if getattr(mlp, 'fuse_lift', False) and mlp._fused(mlp.net_depth):
        # Closed-form lifted-Gaussian producer: (lm, lv) straight from the
        # ray/tdist moments and per-ray basis dot products - the
        # [..., s, 3, 3] covariances never materialize (cast_rays_lifted).
        means, lm, lv = render.cast_rays_lifted(
            tdist, rays.origins, rays.directions, rays.radii,
            self.ray_shape, jnp.asarray(mlp.pos_basis_t))
        if self.disable_integration:
          lv = jnp.zeros_like(lv)
        gaussians = (means, None)
        lifted = (lm, lv)
      else:
        gaussians = render.cast_rays(
            tdist, rays.origins, rays.directions, rays.radii, self.ray_shape,
            diag=False)
        if self.disable_integration:
          gaussians = (gaussians[0], jnp.zeros_like(gaussians[1]))

      if rng is not None:
        rng, key_mlp = jax.random.split(rng)
      else:
        key_mlp = None
      delta = None
      if getattr(mlp, 'fuse_compositing', False):
        if self.opaque_background:
          # The XLA path REPLACES the final density_delta with inf
          # (render.py:160-166): last-sample alpha is exactly 1 with zero
          # sigma gradient. A finite in-kernel stand-in (1e10) diverges for
          # trained-empty rays (alpha < 1 once sigma < ~2e-9, a huge
          # spurious gradient below that), so compositing stays in XLA.
          from refnerf_tpu.models import mlp as mlp_module
          mlp_module._warn_fused_fallback(
              'fuse_compositing inactive', 'opaque_background=True needs '
              'the exact infinite final interval; compositing stays in XLA')
        else:
          # Per-sample interval * |dir| for the in-kernel compositing
          # epilogue (the delta of render.compute_alpha_weights).
          delta = (tdist[..., 1:] - tdist[..., :-1]) * jnp.linalg.norm(
              rays.directions[..., None, :], axis=-1)
      # Positional call so nn.remat's static_argnums can pin `train`
      # (construct.py wraps MLP in nn.remat when Model.remat is bound).
      ray_results = mlp(
          gaussians,
          rays.viewdirs if self.use_viewdirs else None,
          rays.imageplane,
          train,
          key_mlp,
          delta,
          lifted)

      weights = ray_results.pop('weights', None)
      if weights is None:
        weights = render.compute_alpha_weights(
            ray_results['density'], tdist, rays.directions,
            opaque_background=self.opaque_background)[0]

      if self.render_with_specular_density:
        if 'specular_density' not in ray_results:
          raise ValueError(
              'Specular density prediction from mlps should be enabled.')
        # Kept for parity: the reference computes these weights but does not
        # feed them into compositing (models.py:250-258); we expose them to
        # losses/vis through ray_history instead.
        ray_results['specular_weights'] = render.compute_alpha_weights(
            ray_results['specular_density'], tdist, rays.directions,
            opaque_background=self.opaque_background)[0]

      # Background color. The torch port always takes the midpoint of a
      # non-degenerate range (models.py:260-267), silently dropping
      # multinerf's randomized-background training (the regularizer that
      # stops a model from faking opacity with background color); restored
      # here when training with an rng, like the other dropped stochastic
      # paths (Config.randomized). Shipped configs pin (1, 1), so parity
      # with the reference holds for them either way.
      if self.bg_intensity_range[0] == self.bg_intensity_range[1]:
        bg_rgbs = self.bg_intensity_range[0]
      elif train and rng is not None:
        rng, key_bg = jax.random.split(rng)
        bg_rgbs = jax.random.uniform(
            key_bg, (weights.shape[0], 3),
            minval=self.bg_intensity_range[0],
            maxval=self.bg_intensity_range[1])
      else:
        bg_rgbs = (self.bg_intensity_range[0] + self.bg_intensity_range[1]) / 2

      # The mipnerf configuration has no diffuse/specular decomposition;
      # composite the full color into those buffers so downstream consumers
      # (vis, consistency losses) see well-defined values.
      diffuse_s = ray_results.get('diffuse', ray_results['rgb'])
      specular_s = ray_results.get('specular',
                                   jnp.zeros_like(ray_results['rgb']))

      rendering = render.volumetric_rendering(
          ray_results['rgb'],
          diffuse_s,
          specular_s,
          weights,
          tdist,
          bg_rgbs,
          rays.far,
          compute_extras,
          extras={
              k: v for k, v in ray_results.items()
              if k.startswith('normals') or k in ['roughness', 'tint']
          },
          srgb_mapping=(self.srgb_mapping_type
                        if self.srgb_mapping_when_rendering else 'none'))

      if compute_extras:
        # Bags of rays for direct visualization ('ray_' prefixed buffers are
        # treated as ray bundles, not image chunks, downstream).
        n = self.vis_num_rays
        rendering['ray_sdist'] = sdist.reshape([-1, sdist.shape[-1]])[:n, :]
        rendering['ray_weights'] = weights.reshape(
            [-1, weights.shape[-1]])[:n, :]
        rgb = ray_results['rgb']
        rendering['ray_rgbs'] = (rgb.reshape((-1,) + rgb.shape[-2:]))[:n, :, :]

      renderings.append(rendering)
      ray_results['sdist'] = sdist
      ray_results['weights'] = weights
      ray_history.append(ray_results)

    if compute_extras:
      # Proposal levels have meaningless colors; replace with the final
      # average color for visualization.
      weights_l = [r['ray_weights'] for r in renderings]
      rgbs = [r['ray_rgbs'] for r in renderings]
      final_rgb = jnp.sum(rgbs[-1] * weights_l[-1][..., None], axis=-2)
      avg_rgbs = [
          jnp.broadcast_to(final_rgb[:, None, :], r.shape) for r in rgbs[:-1]
      ]
      for i in range(len(avg_rgbs)):
        renderings[i]['ray_rgbs'] = avg_rgbs[i]

    return renderings, ray_history
