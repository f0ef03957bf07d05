"""End-to-end: train a tiny Ref-NeRF on a synthetic Blender scene, validate,
checkpoint, resume, and evaluate - the whole system layer on the CPU mesh."""

import os

import numpy as np
import pytest

from refnerf_tpu import configs as configs_lib
from refnerf_tpu.system import NeRFSystem
from tests.test_data import _make_blender_scene

_TINY = """
Config.dataset_loader = 'blender'
Config.batching = 'all_images'
Config.near = 2.
Config.far = 6.
Config.batch_size = 32
Config.render_chunk_size = 64
Config.max_steps = 6
Config.checkpoint_every = 3
Config.print_every = 2
Config.val_sample_num = 1
Config.lr_delay_steps = 2
Config.randomized = False
Config.sample_noise_size = 0
Config.data_loss_type = 'mse'
Config.interlevel_loss_mult = 0.0
Config.orientation_loss_mult = 0.1
Config.orientation_coarse_loss_mult = 0.01
Config.predicted_normal_loss_mult = 3e-4
Config.predicted_normal_coarse_loss_mult = 3e-5
Config.eval_dataset_limit = 1
Config.save_top_k = 2
Model.num_levels = 2
Model.single_mlp = True
Model.num_prop_samples = 8
Model.num_nerf_samples = 8
Model.anneal_slope = 0.
Model.dilation_bias = 0.
Model.dilation_multiplier = 0.
Model.single_jitter = False
Model.resample_padding = 0.01
NerfMLP.net_depth = 2
NerfMLP.net_width = 16
NerfMLP.net_depth_viewdirs = 1
NerfMLP.net_width_viewdirs = 16
NerfMLP.bottleneck_width = 8
NerfMLP.max_deg_point = 4
NerfMLP.deg_view = 2
NerfMLP.basis_shape = 'octahedron'
NerfMLP.basis_subdivisions = 1
NerfMLP.density_bias = 0.5
NerfMLP.disable_density_normals = False
NerfMLP.enable_pred_normals = True
NerfMLP.use_directional_enc = True
NerfMLP.use_reflections = True
NerfMLP.enable_pred_roughness = True
NerfMLP.use_diffuse_color = True
NerfMLP.use_specular_tint = True
NerfMLP.use_n_dot_v = True
"""


@pytest.fixture(scope='module')
def scene_dir(tmp_path_factory):
  root = str(tmp_path_factory.mktemp('scene') / 'lego')
  _make_blender_scene(root, n_frames=3, res=16, split='train')
  _make_blender_scene(root, n_frames=2, res=16, split='test')
  return root


def test_end_to_end_train_eval(scene_dir, tmp_path_factory):
  ckpt_root = str(tmp_path_factory.mktemp('exp'))
  config, gin = configs_lib.parse(None, [
      _TINY,
      f"Config.data_dir = '{scene_dir}'",
      f"Config.checkpoint_dir = '{ckpt_root}'",
      "Config.exp_name = 'tiny_test'",
  ])

  system = NeRFSystem(config, gin)
  system.train()
  final_step = int(system.state.step)
  assert final_step == 6

  # A checkpoint exists and is restorable.
  system2 = NeRFSystem(config, gin)
  step = system2.restore_latest()
  assert step == 6
  p1 = np.asarray(
      list(system.state.params['nerf_mlp']['raw_density'].values())[0])
  p2 = np.asarray(
      list(system2.state.params['nerf_mlp']['raw_density'].values())[0])
  np.testing.assert_allclose(p1, p2)

  # Evaluation produces metrics and writes dumps.
  metrics = system2.test(step=step)
  assert len(metrics) == 1
  assert np.isfinite(metrics[0]['psnr'])
  assert 0.0 <= metrics[0]['ssim'] <= 1.0
  out_dir = os.path.join(ckpt_root, 'ckpt', 'tiny', 'tiny_test', 'test_preds')
  assert os.path.exists(os.path.join(out_dir, 'avg_metrics.txt'))
  assert os.path.exists(os.path.join(out_dir, 'metric_psnr.txt'))
  assert os.path.exists(os.path.join(out_dir, 'color_000.png'))
  assert os.path.exists(os.path.join(out_dir, 'render_times.txt'))


def test_validation_returns_psnr(scene_dir, tmp_path_factory):
  ckpt_root = str(tmp_path_factory.mktemp('exp2'))
  config, gin = configs_lib.parse(None, [
      _TINY,
      f"Config.data_dir = '{scene_dir}'",
      f"Config.checkpoint_dir = '{ckpt_root}'",
      "Config.exp_name = 'tiny_val'",
  ])
  system = NeRFSystem(config, gin)
  psnr = system.validate(step=1)
  assert np.isfinite(psnr) and psnr > 0


def test_frame_pipeline_orders_and_raises():
  """_FramePipeline: results keep submission order (metric lists must line
  up with frame indices), backpressure caps in-flight frames, and a worker
  exception surfaces like the serial loop's would."""
  import time as time_lib

  from refnerf_tpu.system import _FramePipeline

  pipe = _FramePipeline(max_pending=2)
  in_flight, max_seen = [0], [0]

  def job(i):
    in_flight[0] += 1
    max_seen[0] = max(max_seen[0], in_flight[0])
    time_lib.sleep(0.01 * (5 - i))  # early jobs are slower
    in_flight[0] -= 1
    return i

  for i in range(5):
    pipe.submit(job, i)
  assert pipe.results() == [0, 1, 2, 3, 4]
  assert max_seen[0] == 1  # single worker: strictly sequential

  pipe = _FramePipeline()
  pipe.submit(lambda: 1 / 0)
  with pytest.raises(ZeroDivisionError):
    pipe.results()


def test_frame_pipeline_submit_race_stress():
  """Regression for a submit()-time race: with fast jobs and tiny thread
  switch intervals, the old pending-count-then-scan backpressure could
  StopIteration mid-run. The fixed version waits on the oldest unwaited
  future unconditionally."""
  import sys as sys_lib

  from refnerf_tpu.system import _FramePipeline

  old = sys_lib.getswitchinterval()
  sys_lib.setswitchinterval(1e-6)
  try:
    for _ in range(50):
      pipe = _FramePipeline(max_pending=2)
      for i in range(20):
        pipe.submit(lambda i=i: i)
      assert pipe.results() == list(range(20))
  finally:
    sys_lib.setswitchinterval(old)


def test_batch_lookahead_order_state_and_errors():
  """_BatchLookahead: yields builder outputs in key order even when the
  builder is STATEFUL (the eval loop wraps `next(self.val_dataset)`, so
  out-of-order or concurrent calls would corrupt the stream), runs at most
  one build ahead of consumption, propagates builder exceptions to the
  consumer, and terminates cleanly on exhaustion."""
  import threading
  import time as time_lib

  from refnerf_tpu.system import _BatchLookahead

  # Stateful builder: ignores the key, returns a counter — exactly the
  # `lambda _: next(dataset)` shape the eval loop uses. Order of results
  # proves calls were serialized in submission order.
  counter = [0]
  lock = threading.Lock()
  concurrent, max_concurrent = [0], [0]

  def build(_):
    with lock:
      concurrent[0] += 1
      max_concurrent[0] = max(max_concurrent[0], concurrent[0])
    time_lib.sleep(0.002)
    with lock:
      concurrent[0] -= 1
      counter[0] += 1
      return counter[0]

  out = list(_BatchLookahead(build, range(7)))
  assert out == [1, 2, 3, 4, 5, 6, 7]
  assert max_concurrent[0] == 1  # single worker: stateful-safe

  # Depth bound: with a consumer that never advances, at most depth+1
  # builds may START (the initial fill); the rest wait for consumption.
  started = []
  la = _BatchLookahead(lambda k: started.append(k) or k, range(10), depth=1)
  time_lib.sleep(0.05)
  assert len(started) <= 2
  assert next(la) == 0
  assert list(la) == list(range(1, 10))

  # Builder exception surfaces at the consumer like the serial loop's.
  def boom(k):
    if k == 2:
      raise ValueError('bad frame')
    return k

  la = _BatchLookahead(boom, range(5))
  assert next(la) == 0
  assert next(la) == 1
  with pytest.raises(ValueError, match='bad frame'):
    for _ in la:
      pass

  # Empty key list: immediately exhausted, no hang.
  assert list(_BatchLookahead(lambda k: k, [])) == []
