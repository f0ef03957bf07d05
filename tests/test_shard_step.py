"""Explicit shard_map+psum DP must match the GSPMD path numerically."""

import jax
import jax.numpy as jnp
import numpy as np

from refnerf_tpu.parallel import mesh as mesh_lib
from refnerf_tpu.parallel import shard_step as shard_step_lib
from refnerf_tpu.train import step as step_lib
from tests.test_train_step import _setup


def test_shard_map_matches_gspmd():
  config, model, state, batch = _setup()
  mesh = mesh_lib.create_mesh()
  assert mesh.shape[mesh_lib.DATA_AXIS] == 8

  # GSPMD path.
  state_g = mesh_lib.replicate(state, mesh)
  batch_g = mesh_lib.shard_batch(batch, mesh)
  gspmd_step = jax.jit(step_lib.make_train_step(model, config))
  state_g, stats_g = gspmd_step(state_g, batch_g)

  # Explicit shard_map path (fresh state from the same init).
  config2, model2, state2, batch2 = _setup()
  state_s = mesh_lib.replicate(state2, mesh)
  batch_s = mesh_lib.shard_batch(batch2, mesh)
  sharded_step = shard_step_lib.make_sharded_train_step(model2, config2, mesh)
  state_s, stats_s = sharded_step(state_s, batch_s)

  np.testing.assert_allclose(float(stats_g['loss']), float(stats_s['loss']),
                             rtol=1e-5)
  # Updated parameters agree across the two parallelization strategies.
  for a, b in zip(jax.tree_util.tree_leaves(state_g.params),
                  jax.tree_util.tree_leaves(state_s.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_shard_map_trains():
  config, model, state, batch = _setup()
  mesh = mesh_lib.create_mesh()
  state = mesh_lib.replicate(state, mesh)
  batch = mesh_lib.shard_batch(batch, mesh)
  step_fn = shard_step_lib.make_sharded_train_step(model, config, mesh)
  losses = []
  for _ in range(4):
    state, stats = step_fn(state, batch)
    losses.append(float(stats['loss']))
  assert np.all(np.isfinite(losses))
  assert losses[-1] < losses[0]


_GEOMETRY = """
Config.batch_size = 128
Config.sample_noise_size = 16
Config.sample_noise_angles = 2
Config.sample_angle_range = 0.1
Config.consistency_warmup_steps = 0.0
Config.consistency_diffuse_loss_type = 'var'
Config.consistency_diffuse_loss_mult = 3e-5
Config.consistency_specular_loss_type = 'var'
Config.consistency_specular_loss_mult = 3e-5
Config.consistency_normal_loss_target = 'normals'
Config.consistency_normal_loss_mult = 3e-5
Config.consistency_distance_loss_mult = 3e-6
Config.weights_entropy_loss_mult = 3e-5
Config.accumulated_weights_loss_mult = 3e-4
Config.acc_threshold_for_consistency_loss = 0.1
Config.acc_threshold_for_weights_entropy_loss = 0.1
"""


def test_shard_map_geometry_losses_bitmatch_single_device():
  """With one shard, the explicit path's consistency-ray selection, RNG
  streams, and psum'd masked means all coincide with the GSPMD step."""
  config, model, state, batch = _setup(_GEOMETRY)
  gspmd_step = jax.jit(step_lib.make_train_step(model, config))
  state_g, stats_g = gspmd_step(state, batch)

  config2, model2, state2, batch2 = _setup(_GEOMETRY)
  mesh = mesh_lib.create_mesh(n_devices=1)
  state_s = mesh_lib.replicate(state2, mesh)
  batch_s = mesh_lib.shard_batch(batch2, mesh)
  sharded_step = shard_step_lib.make_sharded_train_step(model2, config2, mesh)
  state_s, stats_s = sharded_step(state_s, batch_s)

  for k in ['diffuse_consistency', 'specular_consistency',
            'normals_consistency', 'distance_consistency', 'weights_entropy']:
    assert k in stats_g['losses'], k
  np.testing.assert_allclose(float(stats_g['loss']), float(stats_s['loss']),
                             rtol=1e-6)
  for a, b in zip(jax.tree_util.tree_leaves(state_g.params),
                  jax.tree_util.tree_leaves(state_s.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_shard_map_geometry_losses_train_8dev():
  """The flagship geometry-loss stack runs on the explicit path across the
  full 8-device mesh and optimizes."""
  config, model, state, batch = _setup(_GEOMETRY)
  mesh = mesh_lib.create_mesh()
  assert mesh.shape[mesh_lib.DATA_AXIS] == 8
  state = mesh_lib.replicate(state, mesh)
  batch = mesh_lib.shard_batch(batch, mesh)
  step_fn = shard_step_lib.make_sharded_train_step(model, config, mesh)
  losses = []
  for _ in range(4):
    state, stats = step_fn(state, batch)
    losses.append(float(stats['loss']))
  assert np.all(np.isfinite(losses))
  assert losses[-1] < losses[0]


def test_shard_map_geometry_losses_match_gspmd_8dev():
  """The hardest-to-shard losses (global-prefix noisy second forward +
  data-dependent masked means) agree between the two parallelization
  strategies at 8 devices: the shard path gathers the global consistency
  prefix and psums masked-mean numerators/denominators, so with
  randomized=False losses AND updated params coincide with GSPMD."""
  config, model, state, batch = _setup(_GEOMETRY)
  mesh = mesh_lib.create_mesh()
  assert mesh.shape[mesh_lib.DATA_AXIS] == 8

  state_g = mesh_lib.replicate(state, mesh)
  batch_g = mesh_lib.shard_batch(batch, mesh)
  gspmd_step = jax.jit(step_lib.make_train_step(model, config))
  state_g, stats_g = gspmd_step(state_g, batch_g)

  config2, model2, state2, batch2 = _setup(_GEOMETRY)
  state_s = mesh_lib.replicate(state2, mesh)
  batch_s = mesh_lib.shard_batch(batch2, mesh)
  sharded_step = shard_step_lib.make_sharded_train_step(model2, config2, mesh)
  state_s, stats_s = sharded_step(state_s, batch_s)

  for k in ['diffuse_consistency', 'specular_consistency',
            'normals_consistency', 'distance_consistency', 'weights_entropy']:
    assert k in stats_g['losses'], k
  np.testing.assert_allclose(float(stats_g['loss']), float(stats_s['loss']),
                             rtol=1e-5)
  for a, b in zip(jax.tree_util.tree_leaves(state_g.params),
                  jax.tree_util.tree_leaves(state_s.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_shard_map_rejects_indivisible_noise():
  config, model, state, batch = _setup(
      _GEOMETRY.replace('Config.sample_noise_size = 16',
                        'Config.sample_noise_size = 12'))
  mesh = mesh_lib.create_mesh()
  try:
    shard_step_lib.make_sharded_train_step(model, config, mesh)
    assert False, 'expected ValueError'
  except ValueError as e:
    assert 'divide' in str(e)


def test_shard_map_rejects_oversized_noise_prefix():
  """sample_noise_size must fit in one shard's batch slice (the global
  prefix is gathered from shard 0 in one hop)."""
  config, model, state, batch = _setup(
      _GEOMETRY.replace('Config.batch_size = 128',
                        'Config.batch_size = 64'))
  mesh = mesh_lib.create_mesh()
  try:
    shard_step_lib.make_sharded_train_step(model, config, mesh)
    assert False, 'expected ValueError'
  except ValueError as e:
    assert 'fit in one shard' in str(e)


_FUSED = """
NerfMLP.fused_trunk = 'on'
NerfMLP.fused_block = 16
NerfMLP.fuse_compositing = True
NerfMLP.fuse_dir_enc = True
NerfMLP.fuse_dir_geo = True
NerfMLP.fuse_dir_rgb = True
NerfMLP.fuse_lift = True
"""


def test_fused_kernels_under_sharding():
  """The fused Pallas path (incl. the compositing / IDE / rgb-epilogue
  fusions) must compose with BOTH parallelization strategies at 8 devices
  and agree with the single-device fused step. On CPU the kernels run in
  interpret mode (plain jax ops), so GSPMD partitioning here validates the
  program structure; on real multi-chip TPUs shard_map is the strategy
  that hands the kernels per-device local shapes by construction."""
  config, model, state, batch = _setup(_FUSED)
  single = jax.jit(step_lib.make_train_step(model, config))
  state_1, stats_1 = single(state, batch)

  mesh = mesh_lib.create_mesh()

  config2, model2, state2, batch2 = _setup(_FUSED)
  state_g = mesh_lib.replicate(state2, mesh)
  batch_g = mesh_lib.shard_batch(batch2, mesh)
  gspmd_step = jax.jit(step_lib.make_train_step(model2, config2))
  state_g, stats_g = gspmd_step(state_g, batch_g)

  config3, model3, state3, batch3 = _setup(_FUSED)
  state_s = mesh_lib.replicate(state3, mesh)
  batch_s = mesh_lib.shard_batch(batch3, mesh)
  sharded_step = shard_step_lib.make_sharded_train_step(model3, config3,
                                                        mesh)
  state_s, stats_s = sharded_step(state_s, batch_s)

  np.testing.assert_allclose(float(stats_1['loss']), float(stats_g['loss']),
                             rtol=1e-5)
  np.testing.assert_allclose(float(stats_1['loss']), float(stats_s['loss']),
                             rtol=1e-5)
  for a, b, c in zip(jax.tree_util.tree_leaves(state_1.params),
                     jax.tree_util.tree_leaves(state_g.params),
                     jax.tree_util.tree_leaves(state_s.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)
