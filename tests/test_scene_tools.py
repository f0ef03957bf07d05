"""The analytic scene generators behind the quality checks.

These scenes are the ground truth for tools/quality_check.py; if they are
not internally consistent, the end-to-end PSNR numbers mean nothing.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from tools import make_shiny_scene, make_sphere_scene  # noqa: E402


@pytest.mark.parametrize('mod', [make_sphere_scene, make_shiny_scene])
def test_scene_layout(tmp_path, mod):
  root = str(tmp_path / 'scene')
  mod.make_scene(root, n_train=3, n_test=2, res=16)
  for split, n in [('train', 3), ('test', 2)]:
    with open(os.path.join(root, f'transforms_{split}.json')) as f:
      meta = json.load(f)
    assert len(meta['frames']) == n
    assert meta['camera_angle_x'] > 0
    for fr in meta['frames']:
      assert os.path.exists(os.path.join(root, fr['file_path'] + '.png'))
      c2w = np.asarray(fr['transform_matrix'])
      # Proper rigid transform: orthonormal rotation, camera off-origin.
      r = c2w[:3, :3]
      np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
      assert np.linalg.norm(c2w[:3, 3]) > 1.0


def test_shiny_scene_is_view_dependent():
  """Same surface geometry, different specular color across views - the
  property that makes this the Ref-NeRF capability check."""
  res = 48
  c2w_a = make_shiny_scene.look_at_pose(0.0)
  c2w_b = make_shiny_scene.look_at_pose(0.35)
  rgb_a, alpha_a = make_shiny_scene.render_view(c2w_a, res)
  rgb_b, _ = make_shiny_scene.render_view(c2w_b, res)
  # Specular content: the two views disagree substantially on the sphere.
  diff = np.abs(rgb_a - rgb_b)[alpha_a > 0].mean()
  assert diff > 0.02
  # At one fixed surface point, the outgoing radiance depends on the view
  # direction through the mirror reflection (unlike the diffuse scene).
  n = np.array([0.0, 0.0, 1.0])
  # d_in_a reflects exactly onto the brightest environment lobe; d_in_b is
  # the same incoming ray rotated ~15 degrees, whose reflection falls off
  # the sharp lobe - the radiance at the same surface point changes a lot.
  d_in_a = np.array([0.577, 0.577, -0.577])
  d_in_b = np.array([0.75, 0.33, -0.577])
  d_in_b /= np.linalg.norm(d_in_b)
  refl = lambda d: d - 2.0 * (d @ n) * n
  la = make_shiny_scene.env_radiance(refl(d_in_a)[None])[0]
  lb = make_shiny_scene.env_radiance(refl(d_in_b)[None])[0]
  assert np.abs(la - lb).max() > 0.2


def test_env_radiance_smooth_positive():
  rng = np.random.RandomState(0)
  d = rng.randn(1000, 3)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  L = make_shiny_scene.env_radiance(d)
  assert np.all(L >= 0.0)
  assert np.all(np.isfinite(L))
  # Nearby directions -> nearby radiance (lobes are low-frequency).
  eps_d = d + 1e-3 * rng.randn(*d.shape)
  eps_d /= np.linalg.norm(eps_d, axis=-1, keepdims=True)
  assert np.abs(make_shiny_scene.env_radiance(eps_d) - L).max() < 0.2


def test_shell_launchers_parse():
  """Every shipped launcher and tool script passes bash -n."""
  import glob
  import subprocess
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  scripts = sorted(glob.glob(os.path.join(repo, 'scripts', '*.sh')) +
                   glob.glob(os.path.join(repo, 'tools', '*.sh')))
  assert len(scripts) >= 12
  for s in scripts:
    subprocess.run(['bash', '-n', s], check=True)


def test_downsample_images_tool(tmp_path):
  """images_N generation matches the in-memory area downsample and loads
  through the LLFF factor-directory path."""
  from PIL import Image

  from tools.downsample_images import downsample_scene
  from refnerf_tpu.data.datasets import downsample_np, load_img

  src = tmp_path / 'images'
  src.mkdir()
  rng = np.random.RandomState(0)
  for i in range(3):
    img = rng.randint(0, 256, (17, 13, 3)).astype(np.uint8)  # odd dims
    Image.fromarray(img).save(str(src / f'im_{i}.png'))

  n = downsample_scene(str(tmp_path), [2, 4])
  assert n == 6
  for factor in (2, 4):
    d = tmp_path / f'images_{factor}'
    files = sorted(os.listdir(d))
    assert len(files) == 3
    small = load_img(str(d / files[0]))
    assert small.shape == (17 // factor, 13 // factor, 3)
    full = load_img(str(src / 'im_0.png'))
    cropped = full[:17 - 17 % factor, :13 - 13 % factor]
    np.testing.assert_allclose(
        small, np.round(downsample_np(cropped, factor)), atol=0.5)
