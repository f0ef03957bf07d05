"""Visualization helpers (ref: internal/vis.py).

Host-side numpy: these run on rendered (device_get) buffers for TensorBoard
panels and video export. Video writing uses the ffmpeg binary when present
and falls back to animated GIF via PIL (this image ships no ffmpeg/mediapy).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import List

import numpy as np
from matplotlib import cm

from refnerf_tpu.ops import image as image_ops
from refnerf_tpu.ops import stepfun

_EPS = float(np.finfo(np.float32).eps)


def weighted_percentile(x, weight, ps, assume_sorted=False):
  """Weighted percentiles of one flattened vector."""
  x = np.asarray(x).reshape([-1])
  weight = np.asarray(weight).reshape([-1])
  if not assume_sorted:
    sortidx = np.argsort(x)
    x, weight = x[sortidx], weight[np.remainder(sortidx, len(weight))]
  acc_w = np.cumsum(weight)
  return np.interp(np.asarray(ps) * (acc_w[-1] / 100), acc_w, x)


def sinebow(h):
  """Cyclic uniform colormap (basecase.org/env/on-rainbows)."""
  f = lambda x: np.sin(np.pi * x) ** 2
  return np.stack([f(3 / 6 - h), f(5 / 6 - h), f(7 / 6 - h)], -1)


def matte(vis, acc, dark=0.8, light=1.0, width=8):
  """Composite over a Photoshop-style checkerboard where acc < 1."""
  vis = np.asarray(vis)
  acc = np.asarray(acc)
  bg_mask = np.logical_xor(
      (np.arange(acc.shape[0]) % (2 * width) // width)[:, None],
      (np.arange(acc.shape[1]) % (2 * width) // width)[None, :])
  bg = np.where(bg_mask, light, dark)
  return vis * acc[:, :, None] + (bg * (1 - acc))[:, :, None]


def visualize_cmap(value, weight, colormap, lo=None, hi=None, percentile=99.0,
                   curve_fn=lambda x: x, modulus=None, matte_background=True):
  """Colormap a scalar image with weighted-percentile range selection."""
  value = np.asarray(value)
  weight = np.asarray(weight)
  lo_auto, hi_auto = weighted_percentile(
      value, weight, [50 - percentile / 2, 50 + percentile / 2])

  lo = lo if lo is not None else (lo_auto - _EPS)
  hi = hi if hi is not None else (hi_auto + _EPS)

  value, lo, hi = [curve_fn(x) for x in [value, lo, hi]]

  if modulus:
    value = np.mod(value, modulus) / modulus
  else:
    value = np.nan_to_num(
        np.clip((value - np.minimum(lo, hi)) / np.abs(hi - lo), 0, 1))

  if colormap:
    colorized = colormap(value)[..., :3].astype(np.float32)
  else:
    if value.ndim != 3 or value.shape[-1] != 3:
      raise ValueError(f'value must be HxWx3, got {value.shape}')
    colorized = value

  return matte(colorized, weight) if matte_background else colorized


def visualize_coord_mod(coords, acc):
  """Each point's coordinate within its unit "cell"."""
  return matte(((np.asarray(coords) + 1) % 2) / 2, acc)


def visualize_rays(dist, dist_range, weights, rgbs, accumulate=False,
                   renormalize=False, resolution=2048, bg_color=0.8):
  """Flattened step-function renders of a bundle of rays, stacked by level."""
  import jax.numpy as jnp
  dist_vis = np.linspace(*dist_range, resolution + 1)
  vis_rgb, vis_alpha = [], []
  for ds, ws, rs in zip(dist, weights, rgbs):
    vis_rs, vis_ws = [], []
    for d, w, r in zip(np.asarray(ds), np.asarray(ws), np.asarray(rs)):
      if accumulate:
        # Accumulated color/weight at each point along the ray.
        w_csum = np.cumsum(w, axis=0)
        rw_csum = np.cumsum(r * w[:, None], axis=0)
        r, w = (rw_csum + _EPS) / (w_csum[:, None] + 2 * _EPS), w_csum
      vis_rs.append(np.asarray(stepfun.resample(
          jnp.asarray(dist_vis), jnp.asarray(d), jnp.asarray(r.T),
          use_avg=True)).T)
      vis_ws.append(np.asarray(stepfun.resample(
          jnp.asarray(dist_vis), jnp.asarray(d), jnp.asarray(w.T),
          use_avg=True)).T)
    vis_rgb.append(np.stack(vis_rs))
    vis_alpha.append(np.stack(vis_ws))
  vis_rgb = np.stack(vis_rgb, axis=1)
  vis_alpha = np.stack(vis_alpha, axis=1)

  if renormalize:
    vis_alpha = vis_alpha / np.maximum(_EPS, np.max(vis_alpha))

  if resolution > vis_rgb.shape[0]:
    rep = resolution // (vis_rgb.shape[0] * vis_rgb.shape[1] + 1)
    stride = rep * vis_rgb.shape[1]

    vis_rgb = np.tile(vis_rgb, (1, 1, rep, 1)).reshape(
        (-1,) + vis_rgb.shape[2:])
    vis_alpha = np.tile(vis_alpha, (1, 1, rep)).reshape(
        (-1,) + vis_alpha.shape[2:])

    # Background strip after each level group.
    vis_rgb = vis_rgb.reshape((-1, stride) + vis_rgb.shape[1:])
    vis_alpha = vis_alpha.reshape((-1, stride) + vis_alpha.shape[1:])
    vis_rgb = np.concatenate([vis_rgb, np.zeros_like(vis_rgb[:, :1])],
                             axis=1).reshape((-1,) + vis_rgb.shape[2:])
    vis_alpha = np.concatenate([vis_alpha, np.zeros_like(vis_alpha[:, :1])],
                               axis=1).reshape((-1,) + vis_alpha.shape[2:])

  vis = vis_rgb * vis_alpha[..., None] + (bg_color * (1 - vis_alpha))[..., None]

  return vis[:-1], vis_alpha[:-1]


def visualize_suite(rendering, rays, linear_to_srgb=False):
  """The standard panel set: color/acc/depths/coords/ray renders/material
  buffers (ref: vis.py:184-292)."""
  depth_curve_fn = lambda x: -np.log(x + _EPS)

  rgb = np.asarray(rendering['rgb'])
  if linear_to_srgb:
    rgb = np.asarray(image_ops.linear_to_srgb(rgb))
  acc = np.asarray(rendering['acc'])

  distance_mean = np.asarray(rendering['distance_mean'])
  distance_median = np.asarray(rendering['distance_median'])
  distance_p5 = np.asarray(rendering['distance_percentile_5'])
  distance_p95 = np.asarray(rendering['distance_percentile_95'])
  acc = np.where(np.isnan(distance_mean), np.zeros_like(acc), acc)

  coords = (np.asarray(rays.origins) +
            np.asarray(rays.directions) * distance_mean[:, :, None])

  vis_depth_mean, vis_depth_median = [
      visualize_cmap(x, acc, cm.get_cmap('turbo'), curve_fn=depth_curve_fn)
      for x in [distance_mean, distance_median]
  ]

  # Percentile triplet as RGB: spacing encodes the density profile.
  depth_triplet = np.stack(
      [2 * distance_median - distance_p5, distance_median, distance_p95], -1)
  vis_depth_triplet = visualize_cmap(
      depth_triplet, acc, None, curve_fn=lambda x: np.log(x + _EPS))

  dist = rendering['ray_sdist']
  dist_range = (0, 1)
  weights = rendering['ray_weights']
  rgbs = [np.clip(np.asarray(r), 0, 1) for r in rendering['ray_rgbs']]

  vis_ray_colors, _ = visualize_rays(dist, dist_range, weights, rgbs)

  sqrt_weights = [np.sqrt(np.asarray(w)) for w in weights]
  sqrt_ray_weights, ray_alpha = visualize_rays(
      dist, dist_range,
      [np.ones_like(lw) for lw in sqrt_weights],
      [lw[..., None] for lw in sqrt_weights],
      bg_color=0)
  sqrt_ray_weights = sqrt_ray_weights[..., 0]

  null_color = np.array([1.0, 0.0, 0.0])
  vis_ray_weights_cmap = visualize_cmap(
      sqrt_ray_weights, np.ones_like(sqrt_ray_weights), cm.get_cmap('gray'),
      lo=0, hi=1, matte_background=False)
  vis_ray_weights = np.where(
      ray_alpha[:, :, None] == 0, null_color[None, None],
      vis_ray_weights_cmap)

  vis = {
      'color': rgb,
      'acc': acc,
      'color_matte': matte(rgb, acc),
      'depth_mean': vis_depth_mean,
      'depth_median': vis_depth_median,
      'depth_triplet': vis_depth_triplet,
      'coords_mod': visualize_coord_mod(coords, acc),
      'ray_colors': vis_ray_colors,
      'ray_weights': vis_ray_weights,
  }

  if 'rgb_cc' in rendering:
    vis['color_corrected'] = np.asarray(rendering['rgb_cc'])

  for key, val in rendering.items():
    if key.startswith('normals') and not key.startswith('ray_'):
      vis[key] = matte(np.asarray(val) / 2.0 + 0.5, acc)

  if 'roughness' in rendering:
    vis['roughness'] = matte(np.tanh(np.asarray(rendering['roughness'])), acc)
  if 'diffuse' in rendering:
    diffuse_rgb = np.asarray(rendering['diffuse'])
    if linear_to_srgb:
      diffuse_rgb = np.asarray(image_ops.linear_to_srgb(diffuse_rgb))
    vis['diffuse'] = diffuse_rgb
    vis['diffuse_matte'] = matte(diffuse_rgb, acc)
  if 'specular' in rendering:
    specular_rgb = np.asarray(rendering['specular'])
    if linear_to_srgb:
      specular_rgb = np.asarray(image_ops.linear_to_srgb(specular_rgb))
    vis['specular'] = specular_rgb
    vis['specular_matte'] = matte(specular_rgb, acc)
  if 'tint' in rendering:
    vis['tint'] = np.asarray(rendering['tint'])
    vis['tint_matte'] = matte(np.asarray(rendering['tint']), acc)

  return vis


def _write_video(path: str, frames: List[np.ndarray], fps: int, crf: int):
  """h264 via the ffmpeg binary if present, else animated GIF fallback."""
  if shutil.which('ffmpeg'):
    h, w = frames[0].shape[:2]
    cmd = [
        'ffmpeg', '-y', '-f', 'rawvideo', '-vcodec', 'rawvideo',
        '-s', f'{w}x{h}', '-pix_fmt', 'rgb24', '-r', str(fps), '-i', '-',
        '-an', '-vcodec', 'libx264', '-crf', str(crf),
        '-pix_fmt', 'yuv420p', path]
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    for f in frames:
      proc.stdin.write(np.ascontiguousarray(f).tobytes())
    proc.stdin.close()
    proc.wait()
  else:
    from PIL import Image
    gif_path = os.path.splitext(path)[0] + '.gif'
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(gif_path, save_all=True, append_images=imgs[1:],
                 duration=max(1, int(1000 / fps)), loop=0)


def create_videos(config, base_dir, out_dir, out_name, num_frames):
  """Assemble videos from per-frame renders on disk (ref: vis.py:295-353)."""
  from refnerf_tpu.utils import io as io_lib

  names = [n for n in config.checkpoint_dir.split('/') if n]
  exp_name, scene_name = (names[-2:] if len(names) >= 2
                          else (names[-1], names[-1]))
  video_prefix = f'{scene_name}_{exp_name}_{out_name}'

  zpad = max(3, len(str(num_frames - 1)))
  idx_to_str = lambda idx: str(idx).zfill(zpad)

  os.makedirs(base_dir, exist_ok=True)

  depth_file = os.path.join(out_dir, f'distance_mean_{idx_to_str(0)}.tiff')
  depth_frame = io_lib.load_img(depth_file)
  shape = depth_frame.shape
  p = config.render_dist_percentile
  distance_limits = np.percentile(depth_frame.flatten(), [p, 100 - p])
  lo, hi = [config.render_dist_curve_fn(x) for x in distance_limits]
  print(f'Video shape is {shape[:2]}')

  for k in ['color', 'diffuse', 'specular', 'normals_pred', 'acc',
            'distance_mean', 'distance_median']:
    video_file = os.path.join(base_dir, f'{video_prefix}_{k}.mp4')
    file_ext = ('png' if k in ['color', 'diffuse', 'specular', 'normals_pred']
                else 'tiff')
    file0 = os.path.join(out_dir, f'{k}_{idx_to_str(0)}.{file_ext}')
    if not os.path.exists(file0):
      print(f'Images missing for tag {k}')
      continue
    print(f'Making video {video_file}...')
    frames = []
    for idx in range(num_frames):
      img_file = os.path.join(out_dir, f'{k}_{idx_to_str(idx)}.{file_ext}')
      if not os.path.exists(img_file):
        raise ValueError(f'Image file {img_file} does not exist.')
      img = io_lib.load_img(img_file)
      if k in ['color', 'diffuse', 'specular', 'normals_pred']:
        img = img / 255.0
      elif k.startswith('distance'):
        img = config.render_dist_curve_fn(img)
        img = np.clip((img - np.minimum(lo, hi)) / np.abs(hi - lo), 0, 1)
        img = cm.get_cmap('turbo')(img)[..., :3]
      elif k == 'acc':
        img = np.stack([img] * 3, axis=-1)
      frames.append(
          (np.clip(np.nan_to_num(img), 0.0, 1.0) * 255.0).astype(np.uint8))
    _write_video(video_file, frames, config.render_video_fps,
                 config.render_video_crf)
