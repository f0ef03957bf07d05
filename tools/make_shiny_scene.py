"""Generate an analytic, 3D-consistent *specular* test scene.

A glossy sphere under a smooth analytic environment: outgoing radiance is
diffuse (normal-dependent albedo, as in make_sphere_scene.py) plus a
specular term that depends only on the mirror reflection direction -
exactly the radiance family Ref-NeRF parameterizes (color as a function of
reflection direction, arxiv 2112.03907). Rendered by exact ray-sphere
intersection, so the images are perfectly view-consistent and a correct
Ref-NeRF implementation (reflections + IDE + normals machinery) should
reach high held-out PSNR; quality_check.py --scene-kind shiny runs the
end-to-end check on it.

The environment is a sum of Phong-style lobes L(r) = sum_i c_i max(0, r.d_i)^p_i
- low-frequency enough for deg_view=4 IDE, sharp enough that getting the
normals (and thus reflection directions) wrong visibly hurts.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_sphere_scene import (FOV_X, SPHERE_RADIUS,  # noqa: E402
                                     look_at_pose)

# Environment lobes: direction, color, exponent. Exponents are chosen so
# the highlights are sharp in *view* space (they sweep across the surface
# at twice the camera's angular rate) but still within reach of the
# deg_view=4 IDE in *reflection* space - the regime Ref-NeRF's
# reflection-direction parameterization is built for.
_LOBES = [
    (np.array([0.577, 0.577, 0.577]), np.array([0.9, 0.7, 0.2]), 96.0),
    (np.array([-0.707, 0.0, 0.707]), np.array([0.2, 0.5, 0.9]), 48.0),
    (np.array([0.0, -0.894, 0.447]), np.array([0.7, 0.2, 0.6]), 24.0),
]
_DIFFUSE_WEIGHT = 0.45
_SPECULAR_WEIGHT = 0.55


def env_radiance(dirs):
  """Smooth environment radiance as a function of (unit) direction.

  `dirs` may contain NaN rows for rays that miss the sphere (their shading
  is masked out by the caller) - silence the spurious invalid-value
  warning those rows trigger."""
  out = np.full(dirs.shape[:-1] + (3,), 0.08)
  with np.errstate(invalid='ignore'):
    for d, c, p in _LOBES:
      out = out + np.maximum(0.0, dirs @ d)[..., None] ** p * c
  return out


def render_view(c2w, res):
  """Exact render: ray-sphere intersection, diffuse + mirror specular."""
  focal = 0.5 * res / np.tan(0.5 * FOV_X)
  xs, ys = np.meshgrid(np.arange(res) + 0.5, np.arange(res) + 0.5,
                       indexing='xy')
  dirs_cam = np.stack([
      (xs - res / 2) / focal, -(ys - res / 2) / focal, -np.ones_like(xs)], -1)
  dirs = dirs_cam @ c2w[:3, :3].T
  dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
  origin = c2w[:3, 3]

  b = 2 * (dirs @ origin)
  c = origin @ origin - SPHERE_RADIUS ** 2
  disc = b ** 2 - 4 * c
  hit = disc > 0
  t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, np.inf)

  pts = origin + t[..., None] * dirs
  normals = pts / SPHERE_RADIUS
  # Mirror reflection of the incoming view ray about the surface normal.
  refl = dirs - 2.0 * (dirs * normals).sum(-1, keepdims=True) * normals

  albedo = 0.5 + 0.5 * normals
  light = np.array([0.58, 0.58, 0.58])
  with np.errstate(invalid='ignore'):  # NaN miss rays, masked below
    lambert = np.clip(normals @ light, 0.1, 1.0)[..., None]
  diffuse = albedo * lambert
  specular = env_radiance(refl)

  rgb = _DIFFUSE_WEIGHT * diffuse + _SPECULAR_WEIGHT * specular
  rgb = np.where(hit[..., None], rgb, 1.0)  # white background
  alpha = hit.astype(np.float32)
  return np.clip(rgb, 0, 1), alpha


def make_scene(root, n_train=24, n_test=4, res=64):
  os.makedirs(root, exist_ok=True)
  for split, n, offset in [('train', n_train, 0.0),
                           ('test', n_test, 0.5 * np.pi / n_test)]:
    frames = []
    for i in range(n):
      theta = 2 * np.pi * i / n + offset
      c2w = look_at_pose(theta)
      rgb, alpha = render_view(c2w, res)
      rgba = np.concatenate([rgb, alpha[..., None]], -1)
      name = f'r_{split}_{i}'
      Image.fromarray((rgba * 255).astype(np.uint8), 'RGBA').save(
          os.path.join(root, name + '.png'))
      frames.append({'file_path': name, 'transform_matrix': c2w.tolist()})
    with open(os.path.join(root, f'transforms_{split}.json'), 'w') as f:
      json.dump({'camera_angle_x': FOV_X, 'frames': frames}, f)
  print(f'wrote analytic shiny-sphere scene to {root}')


if __name__ == '__main__':
  import sys
  make_scene(sys.argv[1] if len(sys.argv) > 1 else '/tmp/shiny_scene')
