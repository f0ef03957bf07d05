"""Generate an analytic forward-facing (LLFF-layout) test capture.

Writes images/ + sparse/0 (binary COLMAP model via data/colmap.py) +
poses_bounds.npy for a camera rig translating in front of a shaded sphere -
the forward-facing twin of tools/make_sphere_scene.py. Exercises the COLMAP
reader, NDC parameterization, pose recentering, and the spiral render path
end to end (tools/quality_check_llff.py trains on it).
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from refnerf_tpu.data import colmap  # noqa: E402
from tools.make_sphere_scene import SPHERE_RADIUS  # noqa: E402


def render_view_opencv(c2w_opencv, res, focal, specular=False):
  """Exact sphere render for an OpenCV-convention (z forward) camera.

  With specular=True, mixes in the mirror-reflection environment radiance
  from make_shiny_scene (Phong lobes) - the view-dependent radiance family
  Ref-NeRF's consistency losses target in the few-shot regime.
  """
  xs, ys = np.meshgrid(np.arange(res) + 0.5, np.arange(res) + 0.5,
                       indexing='xy')
  dirs_cam = np.stack([(xs - res / 2) / focal, (ys - res / 2) / focal,
                       np.ones_like(xs)], -1)
  dirs = dirs_cam @ c2w_opencv[:3, :3].T
  dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
  origin = c2w_opencv[:3, 3]

  b = 2 * (dirs @ origin)
  c = origin @ origin - SPHERE_RADIUS ** 2
  disc = b ** 2 - 4 * c
  hit = disc > 0
  # Misses get t=0 (not inf) so pts/normals stay finite; their shading is
  # masked out by the `hit` select below anyway.
  t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, 0.0)

  pts = origin + t[..., None] * dirs
  normals = np.where(hit[..., None], pts / SPHERE_RADIUS, 1.0)
  albedo = 0.5 + 0.5 * normals
  light = np.array([0.58, 0.58, 0.58])
  lambert = np.clip(normals @ light, 0.1, 1.0)[..., None]
  shade = albedo * lambert
  if specular:
    from tools.make_shiny_scene import (_DIFFUSE_WEIGHT, _SPECULAR_WEIGHT,
                                        env_radiance)
    refl = dirs - 2.0 * (dirs * normals).sum(-1, keepdims=True) * normals
    shade = _DIFFUSE_WEIGHT * shade + _SPECULAR_WEIGHT * env_radiance(refl)
  rgb = np.where(hit[..., None], shade, 1.0)
  return np.clip(rgb, 0, 1)


def _quat_from_rotmat(r):
  w = np.sqrt(max(0, 1 + r[0, 0] + r[1, 1] + r[2, 2])) / 2
  return np.array([w, (r[2, 1] - r[1, 2]) / (4 * w),
                   (r[0, 2] - r[2, 0]) / (4 * w),
                   (r[1, 0] - r[0, 1]) / (4 * w)])


def make_scene(root, n_images=12, res=64, specular=False):
  img_dir = os.path.join(root, 'images')
  os.makedirs(img_dir, exist_ok=True)
  focal = res * 1.2

  cams = {1: colmap.Camera(
      1, 'SIMPLE_PINHOLE', res, res,
      np.array([focal, res / 2, res / 2]))}
  images = {}
  for i in range(n_images):
    # Cameras on a small grid at z = -4 (OpenCV: +z looks at the sphere).
    tx = 0.35 * (i % 4 - 1.5)
    ty = 0.25 * (i // 4 - 1.0)
    c2w = np.eye(4)
    c2w[:3, 3] = [tx, ty, -4.0]
    rgb = render_view_opencv(c2w, res, focal, specular=specular)
    name = f'img_{i:03d}.png'
    Image.fromarray((rgb * 255).astype(np.uint8)).save(
        os.path.join(img_dir, name))
    # world-to-cam for COLMAP.
    w2c_r = c2w[:3, :3].T
    w2c_t = -w2c_r @ c2w[:3, 3]
    images[i + 1] = colmap.ImagePose(
        i + 1, _quat_from_rotmat(w2c_r), w2c_t, 1, name)

  colmap.write_test_model(os.path.join(root, 'sparse', '0'), cams, images)
  # Scene depth spans roughly [3, 5] in front of the rig.
  poses_bounds = np.concatenate(
      [np.zeros((n_images, 15)), np.tile([3.0, 5.0], (n_images, 1))], -1)
  np.save(os.path.join(root, 'poses_bounds.npy'), poses_bounds)
  return root


if __name__ == '__main__':
  root = sys.argv[1] if len(sys.argv) > 1 else '/tmp/sphere_llff'
  make_scene(root)
  print(f'wrote analytic forward-facing scene to {root}')
