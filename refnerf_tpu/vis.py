"""Visualization panels and video export.

Host-side numpy: these run on rendered (device_get) buffers for TensorBoard
panels and video export. The panel set and per-panel output contract follow
internal/vis.py:184-292 of the reference; the implementation here is its own
— ray-bundle rendering is batched over all rays per level (one resample call
per level instead of a Python loop per ray), and image assembly uses
repeat/pad row construction.

Video writing uses the ffmpeg binary when present and falls back to animated
GIF via PIL (this image ships no ffmpeg/mediapy).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np
from matplotlib import colormaps as mpl_colormaps

from refnerf_tpu.ops import image as image_ops
from refnerf_tpu.ops import stepfun

_EPS = float(np.finfo(np.float32).eps)


def weighted_percentile(x, weight, ps, assume_sorted=False):
  """Weighted percentiles of one flattened vector."""
  x = np.asarray(x).reshape([-1])
  weight = np.asarray(weight).reshape([-1])
  if not assume_sorted:
    order = np.argsort(x)
    x = x[order]
    weight = weight[np.remainder(order, len(weight))]
  cumw = np.cumsum(weight)
  return np.interp(np.asarray(ps) / 100 * cumw[-1], cumw, x)


def sinebow(h):
  """Cyclic uniform colormap (basecase.org/env/on-rainbows)."""
  f = lambda x: np.sin(np.pi * x) ** 2
  return np.stack([f(3 / 6 - h), f(5 / 6 - h), f(7 / 6 - h)], -1)


def _checkerboard(shape, width, dark, light):
  """A [H, W] Photoshop-style transparency checkerboard."""
  yy = np.arange(shape[0])[:, None] // width
  xx = np.arange(shape[1])[None, :] // width
  return np.where((yy + xx) % 2 == 0, dark, light)


def matte(vis, acc, dark=0.8, light=1.0, width=8):
  """Alpha-composite an image over a checkerboard using `acc` as alpha."""
  vis = np.asarray(vis)
  acc = np.asarray(acc)[..., None]
  bg = _checkerboard(acc.shape[:2], width, dark, light)[..., None]
  return vis * acc + bg * (1 - acc)


def _auto_bounds(value, weight, percentile):
  """Symmetric weighted-percentile range around the median."""
  tail = (100 - percentile) / 2
  lo, hi = weighted_percentile(value, weight, [tail, 100 - tail])
  return lo - _EPS, hi + _EPS


def visualize_cmap(value, weight, colormap, lo=None, hi=None, percentile=99.0,
                   curve_fn=lambda x: x, modulus=None, matte_background=True):
  """Colormap a scalar image with weighted-percentile range selection."""
  value = np.asarray(value)
  weight = np.asarray(weight)
  if lo is None or hi is None:
    lo_auto, hi_auto = _auto_bounds(value, weight, percentile)
    lo = lo_auto if lo is None else lo
    hi = hi_auto if hi is None else hi

  value, lo, hi = curve_fn(value), curve_fn(lo), curve_fn(hi)

  if modulus:
    unit = np.mod(value, modulus) / modulus
  else:
    # Affine squash of [lo, hi] onto [0, 1], robust to lo/hi order and NaNs.
    unit = (value - min(lo, hi)) / abs(hi - lo)
    unit = np.nan_to_num(np.clip(unit, 0, 1))

  if colormap:
    colorized = colormap(unit)[..., :3].astype(np.float32)
  else:
    if unit.ndim != 3 or unit.shape[-1] != 3:
      raise ValueError(f'value must be HxWx3, got {unit.shape}')
    colorized = unit

  return matte(colorized, weight) if matte_background else colorized


def visualize_coord_mod(coords, acc):
  """Each point's coordinate within its unit "cell"."""
  return matte(((np.asarray(coords) + 1) % 2) / 2, acc)


def _resample_bundle(tvals, tdist, values):
  """Resample step functions (tdist, values) onto the grid `tvals`.

  tdist: [R, S+1] endpoints; values: [R, S, C]; returns [R, len(tvals)-1, C].
  One batched call over all rays and channels.
  """
  import jax.numpy as jnp
  d = jnp.asarray(tdist)[:, None, :]  # [R, 1, S+1]
  v = jnp.moveaxis(jnp.asarray(values), -1, -2)  # [R, C, S]
  t = jnp.broadcast_to(jnp.asarray(tvals), (d.shape[0], 1, len(tvals)))
  out = stepfun.resample(t, d, v, use_avg=True)  # [R, C, T-1]
  return np.moveaxis(np.asarray(out), -2, -1)


def visualize_rays(dist, dist_range, weights, rgbs, accumulate=False,
                   renormalize=False, resolution=2048, bg_color=0.8):
  """Render a bundle of rays' step functions as an image.

  Each ray becomes a group of horizontal strips (one per level, each
  repeated `rep` times) showing its color/weight step function resampled
  onto a common distance grid, with a black separator row between rays.
  Returns (rgb_image[:-1], alpha_image[:-1]).
  """
  tvals = np.linspace(*dist_range, resolution + 1)

  level_rgb, level_alpha = [], []
  for d, w, r in zip(dist, weights, rgbs):
    d, w, r = np.asarray(d), np.asarray(w), np.asarray(r)
    if accumulate:
      # Show the running composite along the ray instead of raw samples.
      w_total = np.cumsum(w, axis=-1)
      r_total = np.cumsum(r * w[..., None], axis=-2)
      r = (r_total + _EPS) / (w_total[..., None] + 2 * _EPS)
      w = w_total
    level_rgb.append(_resample_bundle(tvals, d, r))  # [R, res, 3]
    level_alpha.append(_resample_bundle(tvals, d, w[..., None])[..., 0])
  rgb = np.stack(level_rgb, axis=1)  # [R, L, res, 3]
  alpha = np.stack(level_alpha, axis=1)  # [R, L, res]

  if renormalize:
    alpha = alpha / np.maximum(_EPS, alpha.max())

  n_rays, n_levels = rgb.shape[:2]
  if resolution > n_rays:
    # Row budget: rep copies of each (ray, level) strip + 1 separator/ray.
    rep = resolution // (n_rays * n_levels + 1)
    res, nc = rgb.shape[-2], rgb.shape[-1]
    rgb = np.repeat(rgb.reshape(n_rays * n_levels, res, nc), rep, axis=0)
    alpha = np.repeat(alpha.reshape(n_rays * n_levels, res), rep, axis=0)
    # One black separator row after each ray's group of level strips.
    rgb = rgb.reshape(n_rays, n_levels * rep, res, nc)
    alpha = alpha.reshape(n_rays, n_levels * rep, res)
    rgb = np.concatenate([rgb, np.zeros_like(rgb[:, :1])], axis=1)
    alpha = np.concatenate([alpha, np.zeros_like(alpha[:, :1])], axis=1)
    rgb = rgb.reshape(-1, res, nc)
    alpha = alpha.reshape(-1, res)

  vis = rgb * alpha[..., None] + bg_color * (1 - alpha)[..., None]
  return vis[:-1], alpha[:-1]


def _tone(img, linear_to_srgb):
  img = np.asarray(img)
  return np.asarray(image_ops.linear_to_srgb(img)) if linear_to_srgb else img


def _depth_panels(rendering, acc):
  """Turbo-mapped mean/median depth plus the percentile-triplet panel."""
  neglog = lambda x: -np.log(x + _EPS)
  turbo = mpl_colormaps['turbo']
  mean_d = np.asarray(rendering['distance_mean'])
  median_d = np.asarray(rendering['distance_median'])
  p5 = np.asarray(rendering['distance_percentile_5'])
  p95 = np.asarray(rendering['distance_percentile_95'])
  # Percentile triplet as RGB: channel spacing encodes the density profile.
  triplet = np.stack([2 * median_d - p5, median_d, p95], -1)
  return {
      'depth_mean': visualize_cmap(mean_d, acc, turbo, curve_fn=neglog),
      'depth_median': visualize_cmap(median_d, acc, turbo, curve_fn=neglog),
      'depth_triplet': visualize_cmap(
          triplet, acc, None, curve_fn=lambda x: np.log(x + _EPS)),
  }


def _ray_panels(rendering):
  """Flattened per-level step-function renders of the vis ray bundle."""
  sdist = rendering['ray_sdist']
  weights = rendering['ray_weights']
  rgbs = [np.clip(np.asarray(r), 0, 1) for r in rendering['ray_rgbs']]

  ray_colors, _ = visualize_rays(sdist, (0, 1), weights, rgbs)

  # Weights panel: sqrt-scaled weights rendered as gray, red where empty.
  sqrt_w = [np.sqrt(np.asarray(w)) for w in weights]
  gray, alpha = visualize_rays(
      sdist, (0, 1),
      [np.ones_like(w) for w in sqrt_w],
      [w[..., None] for w in sqrt_w],
      bg_color=0)
  gray_cmap = visualize_cmap(
      gray[..., 0], np.ones_like(gray[..., 0]), mpl_colormaps['gray'],
      lo=0, hi=1, matte_background=False)
  empty = np.array([1.0, 0.0, 0.0])
  ray_weights = np.where(alpha[..., None] == 0, empty, gray_cmap)
  return {'ray_colors': ray_colors, 'ray_weights': ray_weights}


def visualize_suite(rendering, rays, linear_to_srgb=False):
  """The standard panel set (contract: internal/vis.py:184-292)."""
  rgb = _tone(rendering['rgb'], linear_to_srgb)
  acc = np.asarray(rendering['acc'])
  distance_mean = np.asarray(rendering['distance_mean'])
  acc = np.where(np.isnan(distance_mean), np.zeros_like(acc), acc)

  panels = {'color': rgb, 'acc': acc, 'color_matte': matte(rgb, acc)}
  panels.update(_depth_panels(rendering, acc))

  surface_pts = (np.asarray(rays.origins) +
                 np.asarray(rays.directions) * distance_mean[:, :, None])
  panels['coords_mod'] = visualize_coord_mod(surface_pts, acc)

  panels.update(_ray_panels(rendering))

  if 'rgb_cc' in rendering:
    panels['color_corrected'] = np.asarray(rendering['rgb_cc'])

  for key, val in rendering.items():
    if key.startswith('normals') and not key.startswith('ray_'):
      panels[key] = matte(np.asarray(val) / 2 + 0.5, acc)

  if 'roughness' in rendering:
    panels['roughness'] = matte(np.tanh(np.asarray(rendering['roughness'])),
                                acc)
  for key in ('diffuse', 'specular', 'tint'):
    if key in rendering:
      buf = _tone(rendering[key], linear_to_srgb and key != 'tint')
      panels[key] = buf
      panels[f'{key}_matte'] = matte(buf, acc)

  return panels


def _write_video(path: str, frames, fps: int, crf: int):
  """Best available encoder: ffmpeg h264 > OpenCV mp4v > animated GIF.

  Matches the role of the reference's mediapy h264 writer (reference
  internal/vis.py:295-353) with two fallbacks for ffmpeg-less images:
  OpenCV's VideoWriter (MPEG-4 Part 2 in an mp4 container — a real,
  seekable video file) and, when cv2 is absent too, an animated GIF.

  `frames` may be any iterable of uint8 [H, W, 3] arrays; frames stream to
  the encoder one at a time, so a 480-frame 1080p render never sits in
  memory at once.
  """
  import itertools

  frames = iter(frames)
  first = next(frames)
  h, w = first.shape[:2]
  if h % 2 or w % 2:
    # libx264 + yuv420p requires even dimensions; edge-replicate odd frames.
    pad = lambda f: np.pad(f, ((0, h % 2), (0, w % 2), (0, 0)), mode='edge')
  else:
    pad = lambda f: f
  stream = map(pad, itertools.chain([first], frames))
  ph, pw = pad(first).shape[:2]

  if shutil.which('ffmpeg'):
    cmd = [
        'ffmpeg', '-y', '-f', 'rawvideo', '-vcodec', 'rawvideo',
        '-s', f'{pw}x{ph}', '-pix_fmt', 'rgb24', '-r', str(fps), '-i', '-',
        '-an', '-vcodec', 'libx264', '-crf', str(crf),
        '-pix_fmt', 'yuv420p', path]
    # stderr goes to a spool file (a pipe could fill and deadlock the
    # stdin-streaming loop on long renders).
    with tempfile.TemporaryFile() as errf:
      proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                              stdout=subprocess.DEVNULL, stderr=errf)
      try:
        for f in stream:
          proc.stdin.write(np.ascontiguousarray(f).tobytes())
        proc.stdin.close()
      except BrokenPipeError:
        # ffmpeg died early (bad path, missing codec): fall through so the
        # wait() branch reports its actual stderr instead of this pipe
        # error masking it.
        pass
      if proc.wait() != 0:
        errf.seek(0)
        stderr = errf.read()
        raise RuntimeError(
            f'ffmpeg failed writing {path} (exit {proc.returncode}): '
            f'{stderr[-2000:].decode(errors="replace")}')
    return

  if _cv2_video_writer(path, stream, fps, (pw, ph)):
    return

  from PIL import Image
  gif_path = os.path.splitext(path)[0] + '.gif'
  img0 = Image.fromarray(next(stream))
  img0.save(gif_path, save_all=True,
            append_images=(Image.fromarray(f) for f in stream),
            duration=max(1, int(1000 / fps)), loop=0)


def _cv2_video_writer(path, stream, fps, size) -> bool:
  """Stream RGB frames into an mp4 via OpenCV, if cv2 can encode here.

  Returns False (with `stream` unconsumed) when cv2 is missing or its
  FFMPEG backend has no usable encoder, so the caller can fall back.
  """
  try:
    import cv2
  except ImportError:
    return False
  writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), fps, size)
  if not writer.isOpened():
    writer.release()
    return False
  try:
    for f in stream:
      writer.write(np.ascontiguousarray(f[..., ::-1]))  # RGB -> BGR
  finally:
    writer.release()
  return True


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

    def frames(k=k, file_ext=file_ext):
      # Generator: one frame in memory at a time (the encoder streams).
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
          img = mpl_colormaps['turbo'](img)[..., :3]
        elif k == 'acc':
          img = np.stack([img] * 3, axis=-1)
        yield (np.clip(np.nan_to_num(img), 0.0, 1.0) * 255.0).astype(
            np.uint8)

    _write_video(video_file, frames(), config.render_video_fps,
                 config.render_video_crf)
