"""Generate the publication-scale analytic benchmark scene.

Blender-protocol dataset (the format/scale of nerf_synthetic, which this
environment cannot download): 800x800 frames, 100 train / 200 test views on
the upper hemisphere, white background, multiple objects with distinct
materials:

  * a GLOSSY sphere (mirror-sharp environment lobes - the content class
    Ref-NeRF's reflection-direction parameterization exists for),
  * a DIFFUSE sphere (normal-dependent Lambertian albedo),
  * a ROUGH-specular sphere (broad lobes: exercises the roughness head).

Rendering is exact ray-sphere intersection with nearest-hit occlusion, so
images are perfectly 3D-consistent and held-out metrics measure the model,
not the data. Drives tools/run_full_protocol.sh: train blender_refnerf.gin
>= 25k steps, real eval.py/render.py, floors pinned in
tests/test_protocol_floors.py. (Protocol shape per reference README.md:34-44
and nerf_system.py:377-465.)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_shiny_scene import env_radiance  # noqa: E402

FOV_X = 0.6911112070083618  # nerf_synthetic camera_angle_x
CAM_DIST = 4.0

# (center, radius, material): scene bounded well inside near=2/far=6.
_LIGHT = np.array([0.58, 0.58, 0.58])


def _mat_glossy(normals, dirs, pts):
  refl = dirs - 2.0 * (dirs * normals).sum(-1, keepdims=True) * normals
  albedo = np.array([0.55, 0.55, 0.6])
  lambert = np.clip(normals @ _LIGHT, 0.1, 1.0)[..., None]
  return 0.35 * albedo * lambert + 0.65 * env_radiance(refl)


def _mat_diffuse(normals, dirs, pts):
  albedo = 0.5 + 0.5 * normals
  lambert = np.clip(normals @ _LIGHT, 0.1, 1.0)[..., None]
  return albedo * lambert


def _mat_rough(normals, dirs, pts):
  refl = dirs - 2.0 * (dirs * normals).sum(-1, keepdims=True) * normals
  # Broad lobes: soften the environment by mixing toward its mean along
  # the normal (a cheap stand-in for a high-roughness BRDF integral).
  env_sharp = env_radiance(refl)
  env_soft = env_radiance(normals)
  albedo = np.array([0.7, 0.45, 0.3])
  lambert = np.clip(normals @ _LIGHT, 0.1, 1.0)[..., None]
  return 0.5 * albedo * lambert + 0.5 * (0.35 * env_sharp + 0.65 * env_soft)


SPHERES = [
    (np.array([-1.05, 0.15, 0.0]), 0.85, _mat_glossy),
    (np.array([1.05, 0.35, -0.1]), 0.75, _mat_diffuse),
    (np.array([0.1, -1.15, 0.25]), 0.6, _mat_rough),
]


def look_at_pose(theta, phi):
  pos = CAM_DIST * np.array([
      np.cos(theta) * np.cos(phi),
      np.sin(theta) * np.cos(phi),
      np.sin(phi)])
  z = pos / np.linalg.norm(pos)
  up = np.array([0.0, 0.0, 1.0])
  x = np.cross(up, z); x /= np.linalg.norm(x)
  y = np.cross(z, x)
  c2w = np.eye(4)
  c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, pos
  return c2w


def render_view(c2w, res):
  focal = 0.5 * res / np.tan(0.5 * FOV_X)
  xs, ys = np.meshgrid(np.arange(res) + 0.5, np.arange(res) + 0.5,
                       indexing='xy')
  dirs_cam = np.stack([
      (xs - res / 2) / focal, -(ys - res / 2) / focal, -np.ones_like(xs)], -1)
  dirs = dirs_cam @ c2w[:3, :3].T
  dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
  origin = c2w[:3, 3]

  best_t = np.full(dirs.shape[:-1], np.inf)
  rgb = np.ones(dirs.shape[:-1] + (3,))
  for center, radius, material in SPHERES:
    oc = origin - center
    b = 2 * (dirs @ oc)
    c = oc @ oc - radius ** 2
    disc = b ** 2 - 4 * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, np.inf)
    closer = (t > 0) & (t < best_t)
    if not np.any(closer):
      continue
    # Non-hit lanes carry t=inf; their NaN shading is masked out below.
    with np.errstate(invalid='ignore'):
      pts = origin + np.where(closer, t, 1.0)[..., None] * dirs
      normals = (pts - center) / radius
      color = np.clip(material(normals, dirs, pts), 0.0, 1.0)
    rgb = np.where(closer[..., None], color, rgb)
    best_t = np.where(closer, t, best_t)

  alpha = np.isfinite(best_t).astype(np.float32)
  return rgb, alpha


def make_scene(root, n_train=100, n_test=200, res=800, seed=0):
  os.makedirs(root, exist_ok=True)
  rng = np.random.RandomState(seed)
  for split, n in [('train', n_train), ('test', n_test)]:
    frames = []
    for i in range(n):
      # Blender-protocol style: views scattered on the upper hemisphere.
      theta = 2 * np.pi * ((i + 0.5) / n + 0.05 * rng.uniform(-1, 1))
      phi = rng.uniform(0.05, 1.1) if split == 'train' else (
          0.05 + 1.05 * ((i * 7919) % n) / n)
      c2w = look_at_pose(theta, phi)
      rgb, alpha = render_view(c2w, res)
      rgba = np.concatenate([rgb, alpha[..., None]], -1)
      name = f'r_{split}_{i}'
      Image.fromarray((rgba * 255).astype(np.uint8), 'RGBA').save(
          os.path.join(root, name + '.png'))
      frames.append({'file_path': name, 'transform_matrix': c2w.tolist()})
      if (i + 1) % 25 == 0:
        print(f'{split}: {i + 1}/{n}')
    with open(os.path.join(root, f'transforms_{split}.json'), 'w') as f:
      json.dump({'camera_angle_x': FOV_X, 'frames': frames}, f)
  print(f'wrote {res}x{res} benchmark scene ({n_train} train / {n_test} '
        f'test) to {root}')


if __name__ == '__main__':
  import argparse
  p = argparse.ArgumentParser()
  p.add_argument('root')
  p.add_argument('--res', type=int, default=800)
  p.add_argument('--n-train', type=int, default=100)
  p.add_argument('--n-test', type=int, default=200)
  a = p.parse_args()
  make_scene(a.root, n_train=a.n_train, n_test=a.n_test, res=a.res)
