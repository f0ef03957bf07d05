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
