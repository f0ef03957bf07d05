"""Measure the torch reference's train-step throughput on THIS host (CPU),
next to this framework's on the same host - the auditable denominator behind
bench.py's `vs_baseline`.

The reference publishes no throughput numbers (BASELINE.md), so the baseline
has to be derived. This script produces the two measurable inputs:

  1. torch reference full train step (forward + losses + backward + clip +
     Adam), flagship blender_refnerf architecture, on this host's CPU.
  2. this framework's jitted train step, same architecture, same batch,
     same CPU.

Usage:
  python tools/measure_baseline.py --impl torch --batch 1024 --steps 5
  python tools/measure_baseline.py --impl jax   --batch 1024 --steps 5

Each run prints one JSON line:
  {"impl": ..., "batch": N, "sec_per_step": S, "rays_per_sec": R}

BASELINE.md records the measured numbers and the A100 extrapolation
(FLOPs-derived, assumptions written out).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

# Flagship architecture: configs/blender_refnerf.gin.
MLP_KW = dict(
    net_depth=8, net_width=256, net_depth_viewdirs=8, net_width_viewdirs=256,
    bottleneck_width=128, basis_shape='octahedron', basis_subdivisions=1,
    disable_density_normals=False, enable_pred_normals=True,
    use_directional_enc=True, use_reflections=True, deg_view=5,
    enable_pred_roughness=True, use_diffuse_color=True,
    use_specular_tint=True, use_n_dot_v=True, density_bias=0.5,
    max_deg_point=16)
MODEL_KW = dict(
    num_levels=2, num_prop_samples=128, num_nerf_samples=128,
    anneal_slope=0.0, dilation_multiplier=0.0, dilation_bias=0.0,
    single_jitter=False, resample_padding=0.01)
LOSS_FIELDS = dict(
    data_loss_type='mse', data_loss_mult=1.0, data_coarse_loss_mult=0.1,
    interlevel_loss_mult=0.0, distortion_loss_mult=0.0,
    orientation_loss_mult=0.1, orientation_coarse_loss_mult=0.01,
    orientation_loss_target='normals_pred',
    predicted_normal_loss_mult=3e-4, predicted_normal_coarse_loss_mult=3e-5,
    adam_beta1=0.9, adam_beta2=0.999, adam_eps=1e-6)


def make_ray_arrays(n, seed=0):
  rng = np.random.RandomState(seed)
  d = rng.randn(n, 3).astype(np.float32)
  viewdirs = d / np.linalg.norm(d, axis=-1, keepdims=True)
  return dict(
      origins=(rng.randn(n, 3) * 0.3).astype(np.float32),
      directions=viewdirs,
      viewdirs=viewdirs,
      radii=np.full((n, 1), 0.01, np.float32),
      imageplane=np.zeros((n, 2), np.float32),
      lossmult=np.ones((n, 1), np.float32),
      near=np.full((n, 1), 2.0, np.float32),
      far=np.full((n, 1), 6.0, np.float32),
      cam_idx=np.zeros((n, 1), np.int32))


def run_torch(batch, steps):
  import refbridge
  import torch
  ref = refbridge.load_reference()

  cfg = ref.configs.Config()
  for k, v in LOSS_FIELDS.items():
    setattr(cfg, k, v)
  cfg.render_with_specular_density = False
  cfg.vis_num_rays = 4

  saved = (ref.models.NerfMLP, ref.models.PropMLP)
  ref.models.NerfMLP = lambda: ref.models.MLP(**MLP_KW)
  ref.models.PropMLP = ref.models.NerfMLP
  model = ref.models.Model(config=cfg, single_mlp=True, **MODEL_KW)
  ref.models.NerfMLP, ref.models.PropMLP = saved

  arrays = make_ray_arrays(batch)
  rays = ref.utils.Rays(**{
      k: torch.tensor(v, dtype=torch.int32 if k == 'cam_idx'
                      else torch.float32)
      for k, v in arrays.items()})
  rgb_gt = torch.rand(batch, 3)
  model.eval()
  with torch.no_grad():
    model(rays, train_frac=1.0, compute_extras=False)  # materialize lazies
  model.train()

  opt = torch.optim.Adam(model.parameters(), lr=2e-3,
                         betas=(0.9, 0.999), eps=1e-6)
  t_batch = ref.utils.Batch(rays=rays, rgb=rgb_gt.numpy())

  def step():
    opt.zero_grad()
    renderings, history = model(rays, train_frac=0.5, compute_extras=False)
    loss, _ = ref.train_utils.compute_data_loss(
        t_batch, renderings, rays, cfg)
    loss = loss + ref.train_utils.orientation_loss(rays, model, history, cfg)
    loss = loss + ref.train_utils.predicted_normal_loss(model, history, cfg)
    loss.backward()
    torch.nn.utils.clip_grad_norm_(model.parameters(), cfg.grad_max_norm)
    opt.step()
    return float(loss)

  step()  # warmup
  t0 = time.perf_counter()
  for _ in range(steps):
    step()
  dt = (time.perf_counter() - t0) / steps
  return dt


def run_jax(batch, steps):
  import jax
  jax.config.update('jax_platforms', 'cpu')
  import jax.numpy as jnp
  from refnerf_tpu import configs as configs_lib
  from refnerf_tpu.cameras import rays as rays_lib
  from refnerf_tpu.models.mlp import MLP
  from refnerf_tpu.models.model import Model
  from refnerf_tpu.train import step as step_lib

  cfg = configs_lib.Config()
  for k, v in LOSS_FIELDS.items():
    setattr(cfg, k, v)
  cfg.randomized = False
  cfg.batch_size = batch

  kw = dict(MODEL_KW)
  model = Model(nerf_mlp=MLP(name='NerfMLP', **MLP_KW), prop_mlp=None,
                render_with_specular_density=False,
                srgb_mapping_when_rendering=False, vis_num_rays=4, **kw)
  arrays = make_ray_arrays(batch)
  rays = rays_lib.Rays(**{k: jnp.asarray(v) for k, v in arrays.items()})
  params = model.init({'params': jax.random.PRNGKey(0)}, rays,
                      train_frac=1.0, compute_extras=False,
                      train=False)['params']
  state = step_lib.create_train_state(cfg, model, params)
  rgb_gt = jnp.asarray(np.random.RandomState(1).rand(batch, 3), jnp.float32)
  data = rays_lib.Batch(rays=rays, rgb=rgb_gt)
  train_step = jax.jit(step_lib.make_train_step(model, cfg),
                       donate_argnums=(0,))

  state, stats = train_step(state, data)
  jax.block_until_ready(stats['loss'])  # compile + warmup
  t0 = time.perf_counter()
  for _ in range(steps):
    state, stats = train_step(state, data)
  jax.block_until_ready(stats['loss'])
  dt = (time.perf_counter() - t0) / steps
  return dt


def run_flops(batch):
  """XLA cost analysis of the full train step (identical architecture and
  loss stack to the torch measurement) - the auditable FLOPs/step number
  behind BASELINE.md's A100 derivation."""
  import jax
  jax.config.update('jax_platforms', 'cpu')
  import jax.numpy as jnp
  from refnerf_tpu import configs as configs_lib
  from refnerf_tpu.cameras import rays as rays_lib
  from refnerf_tpu.models.mlp import MLP
  from refnerf_tpu.models.model import Model
  from refnerf_tpu.train import step as step_lib

  cfg = configs_lib.Config()
  for k, v in LOSS_FIELDS.items():
    setattr(cfg, k, v)
  cfg.randomized = False
  model = Model(nerf_mlp=MLP(name='NerfMLP', **MLP_KW), prop_mlp=None,
                render_with_specular_density=False,
                srgb_mapping_when_rendering=False, vis_num_rays=4,
                **MODEL_KW)
  arrays = make_ray_arrays(batch)
  rays = rays_lib.Rays(**{k: jnp.asarray(v) for k, v in arrays.items()})
  params = model.init({'params': jax.random.PRNGKey(0)}, rays,
                      train_frac=1.0, compute_extras=False,
                      train=False)['params']
  state = step_lib.create_train_state(cfg, model, params)
  rgb_gt = jnp.zeros((batch, 3), jnp.float32)
  data = rays_lib.Batch(rays=rays, rgb=rgb_gt)
  lowered = jax.jit(step_lib.make_train_step(model, cfg)).lower(state, data)
  cost = lowered.compile().cost_analysis()
  return float(cost['flops'])


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--impl', choices=['torch', 'jax', 'flops'], required=True)
  p.add_argument('--batch', type=int, default=1024)
  p.add_argument('--steps', type=int, default=5)
  args = p.parse_args()

  if args.impl == 'flops':
    flops = run_flops(args.batch)
    print(json.dumps({'impl': 'flops', 'batch': args.batch,
                      'tflops_per_step': round(flops / 1e12, 3)}))
    return
  if args.impl == 'torch':
    dt = run_torch(args.batch, args.steps)
  else:
    dt = run_jax(args.batch, args.steps)

  print(json.dumps({
      'impl': args.impl,
      'batch': args.batch,
      'sec_per_step': round(dt, 4),
      'rays_per_sec': round(args.batch / dt, 1),
  }))


if __name__ == '__main__':
  main()
