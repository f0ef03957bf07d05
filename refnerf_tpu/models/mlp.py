"""The Ref-NeRF MLP as a Flax module.

One class parameterizes both the proposal and NeRF MLPs (mirroring reference
internal/models.py:343-760), but every boolean architecture flag is a
trace-time Python conditional: under jit each configuration compiles to its
own straight-line XLA program with no runtime branches.

Key TPU-native departure from the reference: density-gradient normals. The
torch code calls `torch.autograd.grad(raw_density.sum(), means)` inside
forward (models.py:609), creating an eager double-backprop. Here the density
head is a pure function of the sample means, so normals are a nested
`jax.value_and_grad` *inside* the traced step - XLA fuses the inner backward
with the forward pass, and the outer loss gradient differentiates straight
through it (second-order AD).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from refnerf_tpu.ops import coord
from refnerf_tpu.ops import geopoly
from refnerf_tpu.ops import image as image_ops
from refnerf_tpu.ops import ref_utils
from refnerf_tpu.ops.pallas import fused_mlp


# Once-per-process record of fused-trunk fallback warnings: a user binding
# e.g. net_activation via gin silently losing the fused kernels is a ~45%
# slowdown, so the first occurrence of each (reason, depth) logs loudly.
_FALLBACK_WARNED = set()


def _warn_fused_fallback(reason: str, detail: str):
  key = (reason, detail)
  if key not in _FALLBACK_WARNED:
    _FALLBACK_WARNED.add(key)
    logging.warning(
        'fused_trunk: falling back to the plain XLA path (%s: %s). This is '
        'numerically identical but ~45%% slower on TPU.', reason, detail)


def _weight_init(name: str):
  """Map init names to flax initializers.

  'torch_uniform' reproduces the reference's global nn.Linear override
  (uniform(+-1/sqrt(fan_in)); ref models.py:38-47). 'he_uniform' matches
  multinerf's default.
  """
  if name == 'torch_uniform':
    return jax.nn.initializers.variance_scaling(1 / 3, 'fan_in', 'uniform')
  if name == 'he_uniform':
    return jax.nn.initializers.he_uniform()
  if name == 'glorot_uniform':
    return jax.nn.initializers.glorot_uniform()
  if name == 'lecun_normal':
    return jax.nn.initializers.lecun_normal()
  raise ValueError(f'Unknown weight init {name}')


class MLP(nn.Module):
  """Spatial net + density/normal/roughness/color heads + directional net."""

  net_depth: int = 8                    # depth of the spatial MLP
  net_width: int = 256                  # width of the spatial MLP
  bottleneck_width: int = 256           # width of the bottleneck vector
  net_depth_viewdirs: int = 1           # depth of the directional MLP
  net_width_viewdirs: int = 128         # width of the directional MLP
  net_activation: Callable[..., Any] = nn.relu
  min_deg_point: int = 0                # min degree of IPE for 3D points
  max_deg_point: int = 12               # max degree of IPE for 3D points
  weight_init: str = 'torch_uniform'
  skip_layer: int = 4                   # skip connection period, spatial net
  # Parity-only dead knob: the reference DEFINES skip_layer_dir but uses
  # skip_layer in both trunks (models.py:579,693); binding it changes
  # nothing there or here (see the NOTE in run_spatial_net).
  skip_layer_dir: int = 4
  num_rgb_channels: int = 3
  deg_view: int = 4                     # SH degrees for view/refl directions
  use_reflections: bool = False         # encode refdirs instead of viewdirs
  use_directional_enc: bool = False     # IDE instead of plain PE
  enable_pred_roughness: bool = False
  roughness_activation: Callable[..., Any] = nn.softplus
  roughness_bias: float = -1.0
  use_diffuse_color: bool = False       # split diffuse & specular colors
  use_specular_tint: bool = False
  use_n_dot_v: bool = False
  enable_pred_specular_density: bool = False
  bottleneck_noise: float = 0.0
  density_activation: Callable[..., Any] = nn.softplus
  density_bias: float = -1.0
  density_noise: float = 0.0
  # Compute the volume-compositing weights inside the fused spatial kernel
  # (sigma never leaves VMEM; ops/pallas/fused_mlp.py epilogue). Takes
  # effect only when the fused path dispatches, the model passes the
  # per-sample `delta` intervals, density_activation is softplus, and
  # density_noise is 0; otherwise the model composites in XLA as usual.
  fuse_compositing: bool = False
  # Compute the integrated directional encoding inside the fused directional
  # kernel (refdirs/kappa_inv go in instead of the 2P-wide IDE, which never
  # materializes in HBM; ops/pallas/fused_mlp.py `ide` mode). Takes effect
  # only when the fused directional path dispatches and
  # use_directional_enc is set; otherwise the encoding runs in XLA as usual.
  fuse_dir_enc: bool = False
  # Run the Ref-NeRF color epilogue (sigmoid specular x tint + diffuse,
  # gamut normalization, linear_to_srgb, clip, padding) inside the fused
  # directional kernel. Takes effect only when the fused directional path
  # dispatches with the flagship color flags (diffuse+tint+srgb+norm,
  # sigmoid rgb_activation); the XLA epilogue otherwise. The diffuse /
  # specular / tint extras still come from XLA (dead code in training).
  fuse_dir_rgb: bool = False
  # With fuse_dir_enc: also compute the directional geometry in-kernel -
  # n = -l2_normalize(grad_pred), refdirs = reflect(-viewdirs, n), and the
  # n.v input scalar - from the raw grad_pred/viewdirs. Takes effect only
  # with reflections + n.v + predicted normals (the flagship stack).
  fuse_dir_geo: bool = False
  # Feed the fused spatial kernel closed-form lifted Gaussians (lm, lv)
  # computed by render.cast_rays_lifted from the ray/tdist moments -
  # the [..., samples, 3, 3] covariances and their 3-lane-occupied
  # reduction never enter the program. The model computes and passes them
  # via `lifted`; takes effect only when the fused spatial path dispatches.
  fuse_lift: bool = False
  # Run the IPE scale expansion + trig inside the fused spatial kernel
  # (fused_encoded_trunk in_kernel_trig=True): least HBM traffic, but the
  # fwd+bwd trig recompute measured -4% pre-fuse_lift on v5e; re-testable
  # now that fuse_lift changes the producer cost structure.
  fuse_ipe_trig: bool = False
  rgb_premultiplier: float = 1.0
  rgb_activation: Callable[..., Any] = nn.sigmoid
  rgb_bias: float = 0.0
  rgb_padding: float = 0.001
  enable_pred_normals: bool = False     # predict analytic normals
  disable_density_normals: bool = False  # skip density-gradient normals
  disable_rgb: bool = False             # density-only (pure proposal MLP)
  srgb_mapping: bool = True             # tone-map combined diffuse+specular
  srgb_mapping_normalization: bool = True
  warp_fn: Optional[Any] = None
  basis_shape: str = 'icosahedron'      # 'octahedron'+1 subdiv == eye(3)
  basis_subdivisions: int = 2
  # MXU precision knob: 'bfloat16' runs the dense trunks in bf16 (params and
  # heads stay float32) - the standard TPU mixed-precision recipe.
  compute_dtype: str = 'float32'
  # Layer-fused Pallas trunks (ops/pallas/fused_mlp.py): both dense stacks
  # run per sample-block with activations VMEM-resident, including the
  # density-gradient chain and its hand-derived second-order backward.
  # 'auto' = on for TPU backends, off elsewhere (CPU tests/golden pins keep
  # plain-XLA numerics); 'on'/'off' force it.
  fused_trunk: str = 'auto'
  # Sample-block size for the fused kernels. 0 = auto: 512 in bf16 (the
  # v5e sweep optimum), 256 in f32 (512 overflows the 16 MB scoped-VMEM
  # stack in the f32 spatial backward kernel).
  fused_block: int = 0

  def setup(self):
    if self.use_reflections and not (self.enable_pred_normals or
                                     not self.disable_density_normals):
      raise ValueError('Normals must be computed for reflection directions.')
    if self.use_n_dot_v and self.disable_density_normals and not (
        self.enable_pred_normals):
      raise ValueError('use_n_dot_v needs a normals source (density '
                       'normals or predicted normals).')
    if self.enable_pred_specular_density and not self.use_diffuse_color:
      raise ValueError('Specular density is useless if not using diffuse '
                       'color.')

    # Static basis, folded into the first matmul at compile time.
    self.pos_basis_t = np.array(
        geopoly.generate_basis(self.basis_shape, self.basis_subdivisions)).T

    if self.use_directional_enc:
      self.dir_enc_fn = ref_utils.generate_ide_fn(self.deg_view)
    else:
      def dir_enc_fn(direction, _):
        return coord.pos_enc(
            direction, min_deg=0, max_deg=self.deg_view, append_identity=True)
      self.dir_enc_fn = dir_enc_fn

    init = _weight_init(self.weight_init)
    dtype = jnp.bfloat16 if self.compute_dtype == 'bfloat16' else jnp.float32
    # Heads stay float32 (density/color precision); only the two dense trunks
    # run at compute_dtype - they hold ~all the FLOPs (MXU work).
    dense = lambda w, name: nn.Dense(w, kernel_init=init, name=name)
    dense_c = lambda w, name: nn.Dense(
        w, kernel_init=init, name=name, dtype=dtype, param_dtype=jnp.float32)

    self.spatial_net = [
        dense_c(self.net_width, f'spatial_{i}')
        for i in range(self.net_depth)]
    self.raw_density_layer = dense(1, 'raw_density')
    if self.enable_pred_specular_density:
      self.raw_specular_density_layer = dense(1, 'raw_specular_density')
    if self.enable_pred_normals:
      self.grad_pred_layer = dense(3, 'grad_pred')
    if self.enable_pred_roughness:
      self.raw_roughness_layer = dense(1, 'raw_roughness')
    if self.use_diffuse_color:
      self.raw_rgb_diffuse_layer = dense(self.num_rgb_channels,
                                         'raw_rgb_diffuse')
    if self.use_specular_tint:
      self.raw_tint_layer = dense(3, 'raw_tint')
    if self.bottleneck_width > 0:
      # The bottleneck is an internal feature vector feeding the directional
      # trunk; it runs at compute_dtype (physical-quantity heads stay f32).
      self.bottleneck_layer = dense_c(self.bottleneck_width, 'bottleneck')
    self.viewdir_mlp = [
        dense_c(self.net_width_viewdirs, f'viewdir_{i}')
        for i in range(self.net_depth_viewdirs)]
    self.rgb_layer = dense(self.num_rgb_channels, 'rgb')

  def _block(self):
    if self.fused_block:
      return self.fused_block
    return 512 if self.compute_dtype == 'bfloat16' else 256

  def _fused(self, depth):
    """Whether to dispatch a dense trunk to the fused Pallas kernels."""
    if self.is_initializing():
      return False  # init materializes params through the plain layer stack
    enabled = (self.fused_trunk == 'on' or
               (self.fused_trunk == 'auto' and
                jax.default_backend() == 'tpu'))
    if self.net_activation not in (nn.relu, jax.nn.relu):
      # The kernel hardcodes relu (and its exact AD semantics).
      if enabled:
        _warn_fused_fallback('non-relu net_activation',
                             f'{self.net_activation!r}')
      return False
    if depth > 1 and (depth - 1) % self.skip_layer == 0:
      # Trailing-concat output shape the kernel doesn't model.
      if enabled:
        _warn_fused_fallback(
            'trailing skip concat',
            f'depth={depth}, skip_layer={self.skip_layer}')
      return False
    return enabled

  def _stack_params(self, layers):
    """Collect (kernels, biases) of a bound nn.Dense stack."""
    ks, bs = [], []
    for layer in layers:
      v = layer.variables['params']
      ks.append(v['kernel'])
      bs.append(v['bias'])
    return ks, bs

  def _fused_spatial(self, means, covs, viewdirs, compute_density_normals,
                     delta=None, lifted=None):
    """Spatial stack on the fused Pallas kernel (ops/pallas/fused_mlp.py).

    One kernel evaluates the trunk over the IPE segments (one fused XLA
    producer writes the compute-dtype sin/cos encoding), the density head,
    every feature-vector head (specular density / grad_pred / roughness /
    diffuse / tint as one f32 block, the bottleneck as a compute-dtype
    block), and - in training - the density gradient folded down to
    u = d sigma/d lifted-means ([..., n_basis]), all VMEM-resident; the
    kernel's custom VJP supplies exact first- and second-order parameter
    cotangents. Only the basis projection remains outside, on the tiny
    [..., n_basis] tensor, which stays differentiable in u for the outer
    loss gradient.

    Returns (y or None, raw_density, fused-head dict, normals or None).
    """
    ks, bs = self._stack_params(self.spatial_net)
    vd = self.raw_density_layer.variables['params']

    heads = []
    if self.enable_pred_specular_density:
      heads.append(('specular_density', self.raw_specular_density_layer, 1))
    if self.enable_pred_normals:
      heads.append(('grad_pred', self.grad_pred_layer, 3))
    rgb_heads = (not self.disable_rgb) and viewdirs is not None
    if rgb_heads:
      if self.enable_pred_roughness:
        heads.append(('roughness', self.raw_roughness_layer, 1))
      if self.use_diffuse_color:
        heads.append(('diffuse', self.raw_rgb_diffuse_layer,
                      self.num_rgb_channels))
      if self.use_specular_tint:
        heads.append(('tint', self.raw_tint_layer, 3))
    head_f32 = None
    if heads:
      hp = [h[1].variables['params'] for h in heads]
      head_f32 = (jnp.concatenate([p['kernel'] for p in hp], axis=-1),
                  jnp.concatenate([p['bias'] for p in hp]))
    head_cdt = None
    if rgb_heads and self.bottleneck_width > 0:
      bp = self.bottleneck_layer.variables['params']
      head_cdt = (bp['kernel'], bp['bias'])
    need_y = (not self.disable_rgb) and viewdirs is None

    # Lifted means/vars stay n_basis-wide; the kernel wrapper applies the
    # per-degree scales and trig (coord.integrated_pos_enc layout:
    # deg-major, basis-minor) and folds the scales back out of the density
    # gradient, so u returns n_basis-wide too.
    basis = jnp.asarray(self.pos_basis_t)
    if lifted is None:
      lm, lv = coord.lift_and_diagonalize(means, covs, basis)
    else:
      lm, lv = lifted  # closed-form producer (render.cast_rays_lifted)
    scales = 2.0 ** np.arange(self.min_deg_point, self.max_deg_point)

    outs = fused_mlp.fused_encoded_trunk(
        lm, lv, scales, ks, bs, vd['kernel'], vd['bias'],
        skip_period=self.skip_layer, density_grad=compute_density_normals,
        head_f32=head_f32, head_cdt=head_cdt, out_y=need_y,
        compute_dtype=self.compute_dtype, block=self._block(),
        in_kernel_trig=self.fuse_ipe_trig,
        delta=delta, act_bias=self.density_bias)
    outs = list(outs if isinstance(outs, tuple) else (outs,))
    y = outs.pop(0) if need_y else None
    raw_density = outs.pop(0)
    fh = {}
    if head_f32 is not None:
      hout = outs.pop(0)
      off = 0
      for name, _, dim in heads:
        fh[name] = hout[..., off:off + dim]
        off += dim
    if head_cdt is not None:
      fh['bottleneck'] = outs.pop(0)
    normals = None
    if compute_density_normals:
      u_lm = outs.pop(0)  # d sigma / d lifted-means, [..., n_basis]
      normals = -ref_utils.l2_normalize(jnp.matmul(u_lm, basis.T))
    if delta is not None:
      fh['comp_weights'] = outs.pop(0)
    return y, raw_density, fh, normals

  def run_spatial_net(self, x):
    """The spatial trunk: dense+act with periodic input-skip concats."""
    inputs = x
    for i, layer in enumerate(self.spatial_net):
      x = layer(x)
      x = self.net_activation(x)
      # NOTE: parity with the reference, which uses skip_layer (not
      # skip_layer_dir) in *both* trunks (models.py:579,693).
      if i % self.skip_layer == 0 and i > 0:
        x = jnp.concatenate([x, inputs], axis=-1)
    return x

  def encode_position(self, means, covs):
    """Lift sample Gaussians onto the basis and IPE-encode them."""
    lifted_means, lifted_vars = coord.lift_and_diagonalize(
        means, covs, jnp.asarray(self.pos_basis_t))
    return coord.integrated_pos_enc(lifted_means, lifted_vars,
                                    self.min_deg_point, self.max_deg_point)

  def predict_density(self, means, covs):
    """IPE encode -> spatial net -> raw density. Pure in `means` so it can
    be differentiated for density-gradient normals."""
    x = self.encode_position(means, covs)
    x = self.run_spatial_net(x)
    raw_density = self.raw_density_layer(x)[..., 0]
    return raw_density, x

  def __call__(self, gaussians, viewdirs=None, imageplane=None, train=False,
               rng=None, delta=None, lifted=None):
    """Evaluate the MLP on sample Gaussians.

    Args:
      gaussians: (means [..., s, 3], covs [..., s, 3{,3}]).
      viewdirs: [..., 3] normalized view directions (camera -> point), or
        None to disable the directional branch.
      imageplane: [..., 2] image-plane coords (unused; parity surface).
      train: density-gradient normals and noise only apply in training.
      rng: PRNGKey for density/bottleneck noise (None disables noise).
      delta: optional [..., s] per-sample t-interval * |ray dir| (opaque
        background pre-clamped to a large finite value). With
        `fuse_compositing` and the fused spatial path this yields
        ray_results['weights'] from the in-kernel compositing epilogue.
      lifted: optional closed-form (lm, lv) from render.cast_rays_lifted
        (the `fuse_lift` producer); gaussians' covs may then be None. Only
        valid when the fused spatial path dispatches.

    Returns:
      dict of per-sample results: density, rgb, and conditionally normals,
      normals_pred, grad_pred, tint, diffuse, specular, specular_density,
      roughness.
    """
    del imageplane  # Unused, kept for interface parity.
    means, covs = gaussians

    compute_density_normals = (
        not self.disable_density_normals
        and (train or ((self.use_reflections or self.use_n_dot_v)
                       and not self.enable_pred_normals)))

    if delta is not None and not (
        self.fuse_compositing
        and self.density_noise == 0
        and self.density_activation in (nn.softplus, jax.nn.softplus)
        and delta.shape[-1] > 0
        and self._block() % delta.shape[-1] == 0):
      # Compositing stays in XLA (render.compute_alpha_weights) - say so:
      # this is the same silent-degradation class the fused-trunk warnings
      # exist for.
      if self.fuse_compositing:
        _warn_fused_fallback(
            'fuse_compositing inactive',
            f'needs density_noise == 0, softplus density, and num_samples '
            f'({delta.shape[-1]}) dividing fused_block ({self._block()})')
      delta = None

    fh = None
    if self._fused(self.net_depth):
      x, raw_density, fh, normals = self._fused_spatial(
          means, covs, viewdirs, compute_density_normals, delta=delta,
          lifted=lifted)
    elif lifted is not None:
      raise ValueError(
          'lifted (fuse_lift) inputs require the fused spatial path; the '
          'model must gate cast_rays_lifted on the same dispatch predicate.')
    elif compute_density_normals:
      # Nested AD: d(sum raw_density)/d(means) gives per-sample density
      # gradients in one fused backward (covs are independent of means).
      def density_sum(m):
        raw_density, x = self.predict_density(m, covs)
        return raw_density.sum(), (raw_density, x)
      grads, (raw_density, x) = jax.grad(density_sum, has_aux=True)(means)
      normals = -ref_utils.l2_normalize(grads)
    else:
      raw_density, x = self.predict_density(means, covs)
      normals = None

    if self.enable_pred_specular_density:
      raw_specular_density = (
          fh['specular_density'][..., 0] if fh is not None
          else self.raw_specular_density_layer(x)[..., 0])

    if self.density_noise > 0 and train:
      if rng is None:
        raise ValueError('density_noise > 0 requires an rng key.')
      rng, key = jax.random.split(rng)
      raw_density += self.density_noise * jax.random.normal(
          key, raw_density.shape)
      if self.enable_pred_specular_density:
        rng, key = jax.random.split(rng)
        raw_specular_density += self.density_noise * jax.random.normal(
            key, raw_specular_density.shape)

    if self.enable_pred_normals:
      grad_pred = (fh['grad_pred'] if fh is not None
                   else self.grad_pred_layer(x))
      normals_pred = -ref_utils.l2_normalize(grad_pred)
      normals_to_use = normals_pred
    else:
      grad_pred = None
      normals_pred = None
      normals_to_use = normals

    density = self.density_activation(raw_density + self.density_bias)
    if self.enable_pred_specular_density:
      specular_density = self.density_activation(
          raw_specular_density + self.density_bias)

    roughness = 0.0
    tint = None
    diffuse = None
    specular = None
    if self.disable_rgb:
      rgb = jnp.zeros_like(means)
    else:
      if viewdirs is None and self.use_diffuse_color:
        # The diffuse/specular split only exists on the directional path;
        # without it raw_rgb_diffuse is never produced (the reference hits
        # an UnboundLocalError here, models.py:697-700).
        raise ValueError(
            'use_diffuse_color requires view directions '
            '(Model.use_viewdirs = True).')
      raw_rgb = None
      fused_rgb_out = None
      if viewdirs is not None:
        if self.use_diffuse_color:
          raw_rgb_diffuse = (fh['diffuse'] if fh is not None
                             else self.raw_rgb_diffuse_layer(x))
        if self.use_specular_tint:
          raw_tint = (fh['tint'] if fh is not None
                      else self.raw_tint_layer(x))
          tint = nn.sigmoid(raw_tint)
        if self.enable_pred_roughness:
          roughness = self.roughness_activation(
              (fh['roughness'] if fh is not None
               else self.raw_roughness_layer(x)) + self.roughness_bias)

        # Fused dispatch decided up front: the fused path hands the trunk
        # [N, d] segments (sample axes collapsed). The IDE itself stays in
        # the [batch, s] shape - its elementwise recurrence runs on
        # [batch, s] components at full vector lanes there, whereas with a
        # flat leading axis every component is a [N]/[N, 1] column at 1/128
        # lane utilization (measured: 4x whole-step regression). Only the
        # final encoding pays the collapse relayout. (Pre-casting it to
        # bf16 was measured slightly slower than letting the kernel cast.)
        fused_dir = bool(self.viewdir_mlp) and self._fused(
            self.net_depth_viewdirs)
        # In-kernel IDE: the [.., 2P] encoding (and its relayout copies and
        # backward) never materializes; the kernel reads refdirs/kappa_inv.
        fuse_ide = (fused_dir and self.fuse_dir_enc
                    and self.use_directional_enc)
        if (self.fuse_dir_enc and fused_dir and not fuse_ide
            and not self.is_initializing()):
          _warn_fused_fallback('fuse_dir_enc inactive',
                               'needs use_directional_enc')
        lead = means.shape[:-1]
        flat = ((lambda t: t.reshape((-1,) + t.shape[len(lead):]))
                if fused_dir else (lambda t: t))

        if self.bottleneck_width > 0:
          bottleneck = (fh['bottleneck'] if fh is not None
                        else self.bottleneck_layer(x))
          if self.bottleneck_noise > 0 and train:
            if rng is None:
              raise ValueError('bottleneck_noise > 0 requires an rng key.')
            rng, key = jax.random.split(rng)
            bottleneck += self.bottleneck_noise * jax.random.normal(
                key, bottleneck.shape)
          x = [flat(bottleneck)]
        else:
          x = []

        # In-kernel geometry: grad_pred/viewdirs go in raw; the kernel does
        # normalize/reflect/IDE/n.v, so none of those [.., 3] chains (or
        # their backwards) run lane-starved in XLA.
        fuse_geo = (fuse_ide and self.fuse_dir_geo and self.use_reflections
                    and self.use_n_dot_v and self.enable_pred_normals)
        if (self.fuse_dir_geo and fused_dir and not fuse_geo
            and not self.is_initializing()):
          _warn_fused_fallback(
              'fuse_dir_geo inactive',
              'needs fuse_dir_enc + reflections + n_dot_v + pred normals')
        enc_dirs = dir_enc = None
        if fuse_geo:
          pass  # geometry happens in-kernel
        elif self.use_reflections:
          # viewdirs point camera->point; flip so refdirs point outward.
          refdirs = ref_utils.reflect(-viewdirs[..., None, :], normals_to_use)
          if fuse_ide:
            enc_dirs = refdirs
          else:
            dir_enc = self.dir_enc_fn(refdirs, roughness)
        elif fuse_ide:
          enc_dirs = jnp.broadcast_to(viewdirs[..., None, :],
                                      means.shape[:-1] + (3,))
        elif self.enable_pred_roughness:
          # Per-sample roughness attenuates the IDE, so the view directions
          # must carry the sample axis too. (The reference's viewdirs-only
          # call here mis-broadcasts against [..., s, 1] roughness,
          # models.py:668-672 - a latent crash for this flag combo.)
          vb = jnp.broadcast_to(viewdirs[..., None, :],
                                means.shape[:-1] + (3,))
          dir_enc = self.dir_enc_fn(vb, roughness)
        else:
          dir_enc = self.dir_enc_fn(viewdirs, roughness)
          dir_enc = jnp.broadcast_to(
              dir_enc[..., None, :],
              means.shape[:-1] + (dir_enc.shape[-1],))
        if dir_enc is not None:
          # Emit the encoding in compute dtype at its producer: the cast
          # fuses into the IDE's final multiply, so the [.., 2P] tensor,
          # its flatten relayout, and its backward cotangent all move
          # through HBM at half width in bf16 mode. The trunk kernel casts
          # segments to compute dtype anyway - same trunk input values.
          dir_enc = dir_enc.astype(self.compute_dtype)

        ide_at = len(x)
        dotprod = None
        if self.use_n_dot_v and not fuse_geo:
          dotprod = jnp.sum(
              normals_to_use * viewdirs[..., None, :], axis=-1, keepdims=True)
        if fuse_ide:
          kappa_inv = (roughness if self.enable_pred_roughness
                       else jnp.zeros_like(means[..., :1]))
          if fuse_geo:
            vb = jnp.broadcast_to(viewdirs[..., None, :],
                                  means.shape[:-1] + (3,))
            x.append((flat(grad_pred), flat(vb), flat(kappa_inv)))
          else:
            x.append((flat(enc_dirs), flat(kappa_inv)))
        elif fused_dir and dotprod is not None:
          # n.v rides as one extra plane on the encoding segment: a
          # standalone flat [N, 1] segment tiles T(8,128) at 128x physical
          # padding and pays a ~0.4 ms relayout copy each way per step
          # (batch 4096, v5e), while one more plane on the [.., 2P]
          # encoding is near-free. Same trunk input rows either way.
          x.append(flat(jnp.concatenate(
              [dir_enc, dotprod.astype(dir_enc.dtype)], axis=-1)))
          dotprod = None
        else:
          x.append(flat(dir_enc))

        if dotprod is not None:
          x.append(flat(dotprod))

        if fused_dir:
          # Fused directional trunk: the input pieces go in as separate
          # segments (no XLA concatenate / pad+maximum transpose), and the
          # rgb head runs in-kernel so the trunk features never hit HBM.
          fuse_rgb = (
              self.fuse_dir_rgb and self.use_diffuse_color
              and self.use_specular_tint and self.srgb_mapping
              and self.srgb_mapping_normalization
              and self.rgb_activation in (nn.sigmoid, jax.nn.sigmoid)
              and self.num_rgb_channels == 3)
          if (self.fuse_dir_rgb and not fuse_rgb
              and not self.is_initializing()):
            _warn_fused_fallback(
                'fuse_dir_rgb inactive',
                'needs diffuse+tint+srgb+norm with sigmoid rgb_activation')
          ks, bs = self._stack_params(self.viewdir_mlp)
          rp = self.rgb_layer.variables['params']
          # The in-kernel IDE recurrence + rgb epilogue enlarge the
          # backward's live activation set; at block 512 the v5e scoped
          # VMEM stack overflows (measured 28.5M vs the 16M limit), so the
          # dir stage drops to half-block when those extras are fused.
          # An explicit user fused_block is respected as-is (only the
          # auto-selected default is halved), so a tuned setting is never
          # silently overridden into an illegal sub-8-sublane tile.
          dir_block = self._block()
          if (fuse_ide or self.fuse_dir_rgb) and not self.fused_block:
            dir_block = max(8, dir_block // 2)
          outs = fused_mlp.fused_trunk(
              x, ks, bs, head_f32=(rp['kernel'], rp['bias']), out_y=False,
              skip_period=self.skip_layer, needs_dx=True,
              compute_dtype=self.compute_dtype, block=dir_block,
              ide_deg=self.deg_view if fuse_ide else 0, ide_at=ide_at,
              ide_geo=fuse_geo,
              rgb_epilogue=(
                  (flat(raw_rgb_diffuse), flat(raw_tint),
                   self.rgb_premultiplier, self.rgb_bias, self.rgb_padding)
                  if fuse_rgb else None))
          if fuse_rgb:
            raw_rgb, fused_rgb_out = outs
            fused_rgb_out = fused_rgb_out.reshape(
                lead + (self.num_rgb_channels,))
          else:
            raw_rgb = outs
          raw_rgb = raw_rgb.reshape(lead + (self.num_rgb_channels,))
        else:
          x = jnp.concatenate(x, axis=-1)
          inputs = x
          for i, layer in enumerate(self.viewdir_mlp):
            x = layer(x)
            x = self.net_activation(x)
            if i % self.skip_layer == 0 and i > 0:
              x = jnp.concatenate([x, inputs], axis=-1)

      if raw_rgb is None:
        raw_rgb = self.rgb_layer(x)
      # With diffuse/specular split, `rgb` is the linear specular color.
      rgb = self.rgb_activation(
          self.rgb_premultiplier * raw_rgb + self.rgb_bias)

      if self.use_diffuse_color:
        # Initialize linear diffuse near 0.25 so combined color starts ~0.5.
        diffuse_linear = nn.sigmoid(raw_rgb_diffuse - jnp.log(3.0))
        if self.use_specular_tint:
          specular_linear = tint * rgb
        else:
          specular_linear = 0.5 * rgb

        if self.srgb_mapping:
          rgb = specular_linear + diffuse_linear
          if self.srgb_mapping_normalization:
            rgb_norm = jnp.maximum(rgb.max(axis=-1, keepdims=True),
                                   jnp.ones_like(rgb[..., :1]))
            rgb = rgb / rgb_norm
          rgb = jnp.clip(image_ops.linear_to_srgb(rgb), 0.0, 1.0)
          diffuse = jnp.clip(image_ops.linear_to_srgb(diffuse_linear), 0.0, 1.0)
          specular = jnp.clip(image_ops.linear_to_srgb(specular_linear),
                              0.0, 1.0)
        else:
          rgb = specular_linear + diffuse_linear
          diffuse = diffuse_linear
          specular = specular_linear

      if fused_rgb_out is not None:
        # The color epilogue (incl. padding) ran in-kernel; the XLA chain
        # above only feeds the diffuse/specular extras (dead in training).
        rgb = fused_rgb_out
      else:
        # Map color to [-rgb_padding, 1 + rgb_padding].
        rgb = rgb * (1 + 2 * self.rgb_padding) - self.rgb_padding

    ray_results = dict(density=density, rgb=rgb)
    if fh is not None and 'comp_weights' in fh:
      # In-kernel compositing weights (exactly compute_alpha_weights of
      # `density` by the oracle tests); the model uses these instead of
      # recompositing in XLA.
      ray_results['weights'] = fh['comp_weights']
    if not self.disable_density_normals:
      ray_results['normals'] = normals
    if self.enable_pred_normals:
      ray_results['normals_pred'] = normals_pred
      ray_results['grad_pred'] = grad_pred
    if self.use_specular_tint:
      ray_results['tint'] = tint
    if self.use_diffuse_color:
      ray_results['diffuse'] = diffuse
      ray_results['specular'] = specular
      if self.enable_pred_specular_density:
        ray_results['specular_density'] = specular_density
    if self.enable_pred_roughness:
      ray_results['roughness'] = roughness

    return ray_results
