"""Configuration: one dataclass, gin-compatible surface.

Field names match the reference Config exactly (ref: internal/configs.py:30-172)
so existing gin files and `--gin_bindings` overrides keep working verbatim.
Parsing uses utils/ginlite (gin is not a dependency); the merged config is
snapshotted to `<ckpt>/logs/<exp-prefix>/<exp>/config.gin` like the reference
(configs.py:186-193).

Intentionally inert fields, kept only so reference gin files parse (each is
equally dead or vestigial in the reference itself): `num_workers` (torch
DataLoader knob; the threaded prefetcher sizes itself), `gc_every` (manual
gc.collect cadence for torch memory pressure; not needed under XLA),
`train_render_every` (reference declares it, never renders mid-train),
`vocab_tree_path` (COLMAP ingestion hint, unused at train time),
`noise_background` (declared, never read), `render_save_async` (saves here
overlap device work already; the flag gated a torch thread pool). `num_gpus`
is honored but the device count comes from the mesh.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Optional, Tuple

import numpy as np
from absl import flags

from refnerf_tpu.utils import ginlite


@dataclasses.dataclass
class Config:
  """Every knob of the framework; bind via gin files or --gin_bindings."""

  # Experiment / runtime.
  exp_name: str = 'exp'
  seed: int = 20230227
  num_workers: int = 4
  num_gpus: int = 1              # legacy name: number of *devices* (chips)
  val_sample_num: int = 3
  sample_angle_range: float = 5
  n_input_views: int = 0         # few-shot: truncate training views (0 = all)

  # Data.
  dataset_loader: str = 'llff'
  dataset_debug_mode: bool = False   # pin batches to first pixels of cam 0
  batching: str = 'all_images'       # [single_image, all_images]
  batch_size: int = 16384            # rays per training batch
  patch_size: int = 1                # sampled patch resolution
  factor: int = 0                    # image downsample factor
  load_alphabetical: bool = True
  forward_facing: bool = False
  render_path: bool = False
  llffhold: int = 8
  llff_use_all_images_for_training: bool = False
  dtuhold: int = 8               # every-Nth test split for DTU
  dtu_light_cond: int = 2        # DTU light condition index (7 == 'max')
  use_tiffs: bool = False
  compute_disp_metrics: bool = False
  compute_normal_metrics: bool = False
  gc_every: int = 10000
  disable_multiscale_loss: bool = False
  randomized: bool = True
  near: float = 2.0
  far: float = 6.0
  checkpoint_dir: Optional[str] = None
  render_dir: Optional[str] = None
  data_dir: Optional[str] = None
  vocab_tree_path: Optional[str] = None
  render_chunk_size: int = 16384
  num_showcase_images: int = 5
  deterministic_showcase: bool = True
  vis_num_rays: int = 16
  vis_decimate: int = 0
  save_top_k: int = 5
  resume_path: Optional[str] = None

  # Training.
  max_steps: int = 250000
  early_exit_steps: Optional[int] = None
  checkpoint_every: int = 25000
  print_every: int = 100
  # Cadence of per-param weight/grad norm stats inside the train step.
  # 1 = every step (reference parity; ~10% step-time overhead from ~170
  # tiny reduce kernels). N computes them every N steps via lax.cond.
  stats_every: int = 1
  train_render_every: int = 5000
  cast_rays_in_train_step: bool = True   # device-side ray casting (default on)
  data_loss_type: str = 'charb'
  charb_padding: float = 0.001
  data_loss_mult: float = 1.0
  data_coarse_loss_mult: float = 0.0
  interlevel_loss_mult: float = 1.0
  orientation_loss_mult: float = 0.0
  orientation_coarse_loss_mult: float = 0.0
  orientation_loss_target: str = 'normals_pred'
  predicted_normal_loss_mult: float = 0.0
  predicted_normal_coarse_loss_mult: float = 0.0

  # Noisy-view consistency losses.
  sample_noise_size: int = 128
  sample_noise_angles: int = 1
  consistency_warmup_steps: float = 0.0
  consistency_decay_steps: float = 1.0
  consistency_normal_loss_mult: float = 0.0
  consistency_normal_coarse_loss_mult: float = 0.0
  consistency_normal_loss_target: str = 'normals_pred'
  consistency_diffuse_loss_type: str = 'mse'
  consistency_diffuse_loss_mult: float = 0.0
  consistency_diffuse_coarse_loss_mult: float = 0.0
  consistency_specular_loss_type: str = 'mse'
  consistency_specular_loss_mult: float = 0.0
  consistency_specular_coarse_loss_mult: float = 0.0
  accumulated_weights_loss_mult: float = 0.0

  # sRGB pipeline.
  srgb_mapping_when_rendering: bool = False
  srgb_mapping_type: str = 'linear'
  supervised_by_linear_rgb: bool = False
  render_with_specular_density: bool = False
  noise_background: bool = False

  depth_smoothness_loss_mult: float = 0.0
  depth_smoothness_coarse_loss_mult: float = 0.0

  consistency_distance_loss_type: str = 'mse'
  consistency_distance_loss_mult: float = 0.0
  consistency_distance_coarse_loss_mult: float = 0.0

  acc_threshold_for_consistency_loss: float = 0.0

  weights_entropy_loss_mult: float = 0.0
  weights_entropy_coarse_loss_mult: float = 0.0
  acc_threshold_for_weights_entropy_loss: float = 0.0

  # Optimizer.
  lr_init: float = 0.002
  lr_final: float = 0.00002
  lr_delay_steps: int = 512
  lr_delay_mult: float = 0.01
  adam_beta1: float = 0.9
  adam_beta2: float = 0.999
  adam_eps: float = 1e-6
  grad_max_norm: float = 0.001
  grad_max_val: float = 0.0
  distortion_loss_mult: float = 0.01

  # Eval.
  eval_only_once: bool = True
  eval_save_output: bool = True
  eval_save_ray_data: bool = False
  eval_render_interval: int = 1
  eval_dataset_limit: int = np.iinfo(np.int32).max
  eval_quantize_metrics: bool = True
  eval_crop_borders: int = 0

  # Render (video) path.
  render_video_fps: int = 60
  render_video_crf: int = 18
  render_path_frames: int = 120
  z_variation: float = 0.0
  z_phase: float = 0.0
  render_dist_percentile: float = 0.5
  render_dist_curve_fn: Callable[..., Any] = np.log
  render_path_file: Optional[str] = None
  render_job_id: int = 0
  render_num_jobs: int = 1
  render_resolution: Optional[Tuple[int, int]] = None
  render_focal: Optional[float] = None
  render_camtype: Optional[str] = None
  render_spherical: bool = False
  render_save_async: bool = True
  render_spline_keyframes: Optional[str] = None
  render_spline_n_interp: int = 30
  render_spline_degree: int = 5
  render_spline_smoothness: float = 0.03


# Names of the gin targets recognized by this framework.
_CONFIG_TARGET = 'Config'
_MODEL_TARGET = 'Model'
_NERF_MLP_TARGET = 'NerfMLP'
_PROP_MLP_TARGET = 'PropMLP'
_MLP_TARGET = 'MLP'


def define_common_flags():
  """The absl flags shared by train/eval/render CLIs (parity surface)."""
  flags.DEFINE_string('mode', None, 'Unused; kept for CLI parity.')
  flags.DEFINE_string('base_folder', None, 'Unused; kept for CLI parity.')
  flags.DEFINE_multi_string('gin_bindings', None, 'Gin parameter bindings.')
  flags.DEFINE_multi_string('gin_configs', None, 'Gin config files.')


def parse(gin_configs, gin_bindings, scope=None):
  """Parse gin files/bindings; returns (Config, gin) with scope applied."""
  gin = ginlite.parse_config_files_and_bindings(
      gin_configs, gin_bindings, search_paths=['', 'configs',
                                               os.path.dirname(__file__)])
  config_kwargs = gin.get(_CONFIG_TARGET, scope=scope)
  valid = {f.name for f in dataclasses.fields(Config)}
  unknown = set(config_kwargs) - valid
  if unknown:
    raise ValueError(f'Unknown Config fields in gin: {sorted(unknown)}')
  config = Config(**config_kwargs)
  return config, gin


def mlp_kwargs(gin: ginlite.GinConfig, which: str, scope=None):
  """Merged kwargs for NerfMLP or PropMLP (MLP.* as shared base)."""
  out = gin.get(_MLP_TARGET, scope=scope)
  out.update(gin.get(which, scope=scope))
  return out


def model_kwargs(gin: ginlite.GinConfig, scope=None):
  return gin.get(_MODEL_TARGET, scope=scope)


def load_config(scope=None, save_config=True):
  """Parse flags.FLAGS gin files, build Config, snapshot merged config."""
  config, gin = parse(flags.FLAGS.gin_configs, flags.FLAGS.gin_bindings,
                      scope=scope)
  if save_config and config.checkpoint_dir:
    dirname = os.path.join(config.checkpoint_dir, 'logs',
                           config.exp_name.split('_')[0], config.exp_name)
    os.makedirs(dirname, exist_ok=True)
    with open(os.path.join(dirname, 'config.gin'), 'w') as f:
      f.write(gin.config_str())
  return config, gin
