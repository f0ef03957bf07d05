"""Preemption equivalence: train(N) + kill + resume(M) == train(N+M).

The reference gets approximate resume from Lightning's ckpt_path
(reference train.py:92) with a free-running data RNG, so a resumed run sees
different batches than an uninterrupted one. Here the batch stream is a
pure function of (seed, global step) and the checkpoint carries the full
TrainState, so the two runs must produce identical parameters.
"""

import numpy as np
import pytest

from refnerf_tpu import configs as configs_lib
from refnerf_tpu.system import NeRFSystem
from tests.test_data import _make_blender_scene
from tests.test_system import _TINY


@pytest.fixture(scope='module')
def scene_dir(tmp_path_factory):
  root = str(tmp_path_factory.mktemp('scene_resume') / 'lego')
  _make_blender_scene(root, n_frames=3, res=16, split='train')
  _make_blender_scene(root, n_frames=2, res=16, split='test')
  return root


def _parse(scene_dir, ckpt_root, exp, extra=()):
  return configs_lib.parse(None, [
      _TINY,
      'Config.max_steps = 8',
      'Config.checkpoint_every = 4',
      f"Config.data_dir = '{scene_dir}'",
      f"Config.checkpoint_dir = '{ckpt_root}'",
      f"Config.exp_name = '{exp}'",
      *extra,
  ])


def test_kill_resume_matches_uninterrupted(scene_dir, tmp_path_factory):
  ckpt_root = str(tmp_path_factory.mktemp('exp_resume'))

  # Uninterrupted run: 8 steps.
  config_a, gin_a = _parse(scene_dir, ckpt_root, 'runA')
  sys_a = NeRFSystem(config_a, gin_a)
  sys_a.train()
  assert int(sys_a.state.step) == 8

  # Preempted run: 4 steps, killed (early_exit), then resumed for 4 more.
  config_b, gin_b = _parse(scene_dir, ckpt_root, 'runB',
                           ('Config.early_exit_steps = 4',))
  sys_b = NeRFSystem(config_b, gin_b)
  sys_b.train()
  assert int(sys_b.state.step) == 4

  config_b2, gin_b2 = _parse(scene_dir, ckpt_root, 'runB')
  sys_b2 = NeRFSystem(config_b2, gin_b2)
  sys_b2.train()
  assert int(sys_b2.state.step) == 8

  # Final parameters identical (same batches, same updates, same counts).
  import jax
  leaves_a = jax.tree_util.tree_leaves_with_path(sys_a.state.params)
  leaves_b = jax.tree_util.tree_leaves(sys_b2.state.params)
  assert len(leaves_a) == len(leaves_b)
  for (path, a), b in zip(leaves_a, leaves_b):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-7,
        err_msg=jax.tree_util.keystr(path))
  # Optimizer state matches too (Adam moments ride the checkpoint).
  for a, b in zip(jax.tree_util.tree_leaves(sys_a.state.opt_state),
                  jax.tree_util.tree_leaves(sys_b2.state.opt_state)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_batch_stream_is_seekable(scene_dir):
  """dataset.seek(k) reproduces the k-th batch of a fresh stream."""
  from refnerf_tpu.data import datasets as datasets_lib
  config, _ = _parse(scene_dir, '/tmp/unused', 'seek')
  ds = datasets_lib.load_dataset('train', scene_dir, config)
  fresh = [next(ds) for _ in range(5)]
  ds.seek(3)
  replay = next(ds)
  np.testing.assert_array_equal(np.asarray(replay.rgb),
                                np.asarray(fresh[3].rgb))
  import jax
  for (path, av), bv in zip(
      jax.tree_util.tree_leaves_with_path(fresh[3].rays),
      jax.tree_util.tree_leaves(replay.rays)):
    np.testing.assert_array_equal(np.asarray(av), np.asarray(bv),
                                  err_msg=jax.tree_util.keystr(path))
