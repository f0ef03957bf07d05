import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refnerf_tpu import configs as configs_lib
from refnerf_tpu.models import construct
from refnerf_tpu.train import checkpoints as ckpt_lib
from refnerf_tpu.train import step as step_lib

_TINY = """
Config.max_steps = 100
NerfMLP.net_depth = 1
NerfMLP.net_width = 8
NerfMLP.net_depth_viewdirs = 1
NerfMLP.net_width_viewdirs = 8
NerfMLP.bottleneck_width = 4
NerfMLP.max_deg_point = 2
NerfMLP.deg_view = 1
NerfMLP.basis_shape = 'octahedron'
NerfMLP.basis_subdivisions = 1
NerfMLP.disable_density_normals = True
NerfMLP.use_directional_enc = False
NerfMLP.use_reflections = False
Model.num_levels = 2
Model.single_mlp = True
Model.num_prop_samples = 4
Model.num_nerf_samples = 4
"""


def _make_state():
  config, gin = configs_lib.parse(None, [_TINY])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  return config, step_lib.create_train_state(config, model, params)


def test_save_restore_roundtrip(tmp_path):
  config, state = _make_state()
  mgr = ckpt_lib.CheckpointManager(str(tmp_path / 'ckpt'), save_top_k=3)
  mgr.save(10, jax.device_get(state), val_psnr=20.0)
  mgr.wait()
  assert mgr.latest_step() == 10
  restored = mgr.restore(jax.device_get(state))
  for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                  jax.tree_util.tree_leaves(state.params)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  mgr.close()


def test_latest_and_best(tmp_path):
  config, state = _make_state()
  mgr = ckpt_lib.CheckpointManager(str(tmp_path / 'ckpt'), save_top_k=2)
  host_state = jax.device_get(state)
  mgr.save(1, host_state, val_psnr=25.0)
  mgr.save(2, host_state, val_psnr=30.0)  # best
  mgr.save(3, host_state, val_psnr=10.0)
  mgr.wait()
  assert mgr.latest_step() == 3
  assert mgr.best_step() == 2
  mgr.close()


def test_restore_empty_raises(tmp_path):
  config, state = _make_state()
  mgr = ckpt_lib.CheckpointManager(str(tmp_path / 'empty'))
  with pytest.raises(FileNotFoundError):
    mgr.restore(jax.device_get(state))
  mgr.close()


def test_checkpoint_dir_layout():
  cfg = configs_lib.Config()
  cfg.checkpoint_dir = '/x'
  cfg.exp_name = 'lego_refnerf'
  assert ckpt_lib.checkpoint_dir(cfg) == '/x/ckpt/lego/lego_refnerf'
