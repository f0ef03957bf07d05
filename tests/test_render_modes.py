"""Render-path dataset modes: pano (spherical), render_resolution/focal,
render_path_file overrides."""

import os

import numpy as np
import pytest

from refnerf_tpu import configs as configs_lib
from refnerf_tpu.data import datasets
from tests.test_llff_dataset import llff_dir  # fixture  # noqa: F401


def _render_config(**kw):
  c = configs_lib.Config()
  c.dataset_loader = 'llff'
  c.forward_facing = True
  c.near, c.far = 0.0, 1.0
  c.batch_size = 32
  c.render_path = True
  c.render_path_frames = 6
  for k, v in kw.items():
    setattr(c, k, v)
  return c


def test_render_path_uses_render_poses(llff_dir):  # noqa: F811
  ds = datasets.load_dataset('test', llff_dir, _render_config())
  assert ds.size == 6  # render_path_frames
  batch = ds.generate_ray_batch(0)
  assert batch.rgb is None  # no ground truth along a synthetic path
  assert batch.rays.origins.shape[-1] == 3


def test_render_resolution_and_focal_override(llff_dir):  # noqa: F811
  cfg = _render_config(render_resolution=(20, 10), render_focal=33.0)
  ds = datasets.load_dataset('test', llff_dir, cfg)
  assert (ds.width, ds.height) == (20, 10)
  batch = ds.generate_ray_batch(0)
  assert batch.rays.origins.shape[:2] == (10, 20)


def test_render_pano_spherical(llff_dir):  # noqa: F811
  cfg = _render_config(render_camtype='pano', render_resolution=(16, 8))
  ds = datasets.load_dataset('test', llff_dir, cfg)
  batch = ds.generate_ray_batch(0)
  d = np.asarray(batch.rays.directions)
  assert d.shape == (8, 16, 3)
  np.testing.assert_allclose(
      np.linalg.norm(d.reshape(-1, 3), axis=-1), 1.0, atol=1e-5)


def test_render_path_file_override(llff_dir, tmp_path):  # noqa: F811
  poses = np.stack([np.eye(4)[:3]] * 4).astype(np.float32)
  path_file = str(tmp_path / 'poses.npy')
  np.save(path_file, poses)
  cfg = _render_config(render_path_file=path_file)
  ds = datasets.load_dataset('test', llff_dir, cfg)
  assert ds.size == 4
