"""TensorBoard logging path: train summaries + validation image panels
actually write event files (the reference logs the same families,
nerf_system.py:220-321)."""

import os

import numpy as np
import pytest

from refnerf_tpu import configs as configs_lib
from refnerf_tpu.system import NeRFSystem
from tests.test_data import _make_blender_scene
from tests.test_system import _TINY


@pytest.fixture(scope='module')
def scene_dir(tmp_path_factory):
  root = str(tmp_path_factory.mktemp('tb_scene') / 'scene')
  _make_blender_scene(root, n_frames=2, res=16, split='train')
  _make_blender_scene(root, n_frames=1, res=16, split='test')
  return root


def test_train_writes_tensorboard_events(scene_dir, tmp_path_factory):
  from tensorboardX import SummaryWriter
  root = tmp_path_factory.mktemp('tb')
  log_dir = str(root / 'logs')
  writer = SummaryWriter(log_dir)
  config, gin = configs_lib.parse(None, [
      _TINY,
      f"Config.data_dir = '{scene_dir}'",
      f"Config.checkpoint_dir = '{root / 'exp'}'",
      "Config.exp_name = 'tb_test'",
      'Config.vis_decimate = 2',
  ])
  system = NeRFSystem(config, gin, summary_writer=writer)
  system.train()
  writer.flush()
  events = [f for f in os.listdir(log_dir) if 'tfevents' in f]
  assert events, os.listdir(log_dir)
  size = os.path.getsize(os.path.join(log_dir, events[0]))
  assert size > 10000  # histograms + images + scalars, not just a header


def test_eval_showcase_logging_and_ray_dump(scene_dir, tmp_path_factory):
  """system.test honors num_showcase_images/deterministic_showcase: showcase
  panels go to TensorBoard and ray bundles to ray_data files
  (ref: nerf_system.py:329-349, 400-403)."""
  from tensorboardX import SummaryWriter
  root = tmp_path_factory.mktemp('tb_eval')
  log_dir = str(root / 'logs')
  writer = SummaryWriter(log_dir)
  config, gin = configs_lib.parse(None, [
      _TINY,
      f"Config.data_dir = '{scene_dir}'",
      f"Config.checkpoint_dir = '{root / 'exp'}'",
      "Config.exp_name = 'tb_eval'",
      'Config.eval_dataset_limit = 1',
      'Config.num_showcase_images = 1',
      'Config.deterministic_showcase = True',
      'Config.eval_save_ray_data = True',
  ])
  system = NeRFSystem(config, gin, summary_writer=writer)
  system.test(step=1)
  writer.flush()

  out_dir = os.path.join(str(root / 'exp'), 'ckpt', 'tb', 'tb_eval',
                         'test_preds')
  ray_files = [f for f in os.listdir(out_dir) if f.startswith('ray_data_')]
  assert ray_files == ['ray_data_0.txt']
  content = open(os.path.join(out_dir, ray_files[0])).read()
  assert 'ray_sdist' in content and 'ray_weights' in content

  events = [f for f in os.listdir(log_dir) if 'tfevents' in f]
  assert events
  size = os.path.getsize(os.path.join(log_dir, events[0]))
  assert size > 5000  # showcase image panels, not just a header
