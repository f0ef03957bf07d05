import jax
import jax.numpy as jnp
import numpy as np

from refnerf_tpu import configs as configs_lib
from refnerf_tpu.cameras import rays as rays_lib
from refnerf_tpu.models import construct
from refnerf_tpu.parallel import mesh as mesh_lib
from refnerf_tpu.train import step as step_lib

_TINY = """
Config.batch_size = 16
Config.max_steps = 100
Config.lr_delay_steps = 10
Config.randomized = False
Config.sample_noise_size = 0
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
Config.orientation_loss_mult = 0.1
Config.orientation_coarse_loss_mult = 0.01
Config.predicted_normal_loss_mult = 3e-4
Config.predicted_normal_coarse_loss_mult = 3e-5
Config.interlevel_loss_mult = 0.0
Config.data_loss_type = 'mse'
"""


def _setup(extra=''):
  config, gin = configs_lib.parse(None, [_TINY + extra])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  state = step_lib.create_train_state(config, model, params)

  b = config.batch_size
  rng = np.random.RandomState(0)
  r = rays_lib.dummy_rays(b).replace(
      origins=jnp.asarray(rng.randn(b, 3).astype(np.float32)),
      directions=jnp.asarray(rng.randn(b, 3).astype(np.float32)),
      viewdirs=jnp.asarray(
          (lambda v: v / np.linalg.norm(v, axis=-1, keepdims=True))(
              rng.randn(b, 3)).astype(np.float32)),
      radii=jnp.full((b, 1), 0.01),
      lossmult=jnp.ones((b, 1)),
      near=jnp.full((b, 1), 0.5),
      far=jnp.full((b, 1), 3.0))
  batch = rays_lib.Batch(
      rays=r, rgb=jnp.asarray(rng.uniform(0, 1, (b, 3)).astype(np.float32)))
  return config, model, state, batch


def test_train_step_decreases_loss():
  config, model, state, batch = _setup()
  train_step = jax.jit(step_lib.make_train_step(model, config))
  losses = []
  for _ in range(5):
    state, stats = train_step(state, batch)
    losses.append(float(stats['loss']))
  assert np.all(np.isfinite(losses))
  assert losses[-1] < losses[0]
  assert int(state.step) == 5


def test_train_step_stats_contents():
  config, model, state, batch = _setup()
  train_step = jax.jit(step_lib.make_train_step(model, config))
  state, stats = train_step(state, batch)
  for k in ['loss', 'losses', 'mses', 'psnrs', 'psnr', 'learning_rate',
            'weights_l2s', 'grad_norms', 'grad_maxes']:
    assert k in stats, k
  assert 'data' in stats['losses']
  assert 'orientation' in stats['losses']
  assert 'predicted_normals' in stats['losses']
  assert stats['mses'].shape == (2,)
  for v in stats['grad_norms'].values():
    assert np.isfinite(float(v))


def test_train_step_with_consistency_losses():
  extra = """
Config.sample_noise_size = 8
Config.sample_noise_angles = 2
Config.consistency_diffuse_loss_type = 'var'
Config.consistency_diffuse_loss_mult = 3e-5
Config.consistency_specular_loss_type = 'var'
Config.consistency_specular_loss_mult = 3e-5
Config.consistency_normal_loss_target = 'normals'
Config.consistency_normal_loss_mult = 3e-5
Config.consistency_distance_loss_mult = 3e-6
Config.consistency_warmup_steps = 0.6
Config.weights_entropy_loss_mult = 3e-5
Config.accumulated_weights_loss_mult = 3e-4
Config.acc_threshold_for_consistency_loss = 0.1
"""
  config, model, state, batch = _setup(extra)
  train_step = jax.jit(step_lib.make_train_step(model, config))
  state, stats = train_step(state, batch)
  for k in ['diffuse_consistency', 'specular_consistency',
            'normals_consistency', 'distance_consistency', 'weights_entropy',
            'acc']:
    assert k in stats['losses'], k
  assert np.isfinite(float(stats['loss']))


def test_lr_schedule_matches_reference_decay():
  config, _ = configs_lib.parse(None, [
      'Config.lr_init = 0.002\nConfig.lr_final = 2e-5\n'
      'Config.max_steps = 1000\nConfig.lr_delay_steps = 100\n'
      'Config.lr_delay_mult = 0.01'])
  sched = step_lib.create_lr_schedule(config)
  lr0 = float(sched(0))
  np.testing.assert_allclose(lr0, 0.01 * 0.002, rtol=1e-4)
  lr_end = float(sched(1000))
  np.testing.assert_allclose(lr_end, 2e-5, rtol=1e-4)
  # Monotone decreasing after warmup.
  lrs = [float(sched(s)) for s in range(100, 1000, 100)]
  assert all(a > b for a, b in zip(lrs, lrs[1:]))


def test_gradient_clipping_applied():
  config, model, state, batch = _setup()
  assert config.grad_max_norm == 0.001
  train_step = jax.jit(step_lib.make_train_step(model, config))
  prev = state.params
  state, _ = train_step(state, batch)
  # The global-norm clip bounds the Adam input; updates remain finite/small.
  deltas = jax.tree_util.tree_map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                                  state.params, prev)
  assert max(jax.tree_util.tree_leaves(deltas)) < 1.0


def test_train_step_sharded_over_mesh():
  # The same step function runs with the batch sharded over all 8 virtual
  # devices; params replicated; GSPMD handles the gradient reduction.
  config, model, state, batch = _setup()
  mesh = mesh_lib.create_mesh()
  assert mesh.shape[mesh_lib.DATA_AXIS] == 8
  state = mesh_lib.replicate(state, mesh)
  batch = mesh_lib.shard_batch(batch, mesh)
  train_step = jax.jit(step_lib.make_train_step(model, config))
  state, stats = train_step(state, batch)
  assert np.isfinite(float(stats['loss']))
  # Result matches the unsharded run bit-for... (numerically closely).
  config2, model2, state2, batch2 = _setup()
  train_step2 = jax.jit(step_lib.make_train_step(model2, config2))
  state2, stats2 = train_step2(state2, batch2)
  np.testing.assert_allclose(float(stats['loss']), float(stats2['loss']),
                             rtol=1e-4)


def test_grouped_param_stats_match_per_leaf():
  # The shape-grouped single-kernel reductions must reproduce the naive
  # per-leaf statistics (what the reference logs, nerf_system.py:212-217).
  config, model, state, batch = _setup()
  train_step = jax.jit(step_lib.make_train_step(model, config))
  _, stats = train_step(state, batch)
  named = step_lib._param_stats(state.params)
  for name, leaf in named.items():
    np.testing.assert_allclose(
        float(stats['weights_l2s'][name]), float(jnp.sum(leaf ** 2)),
        rtol=1e-6, err_msg=name)


def test_consistency_losses_with_batch_smaller_than_noise_size():
  """sample_noise_size > batch_size: the sampler clamps to the batch
  (sampling.py:56) and the consistency losses must group by the EFFECTIVE
  count, not the configured one (regression: reshape crash at tiny
  batches)."""
  extra = """
Config.sample_noise_size = 64
Config.sample_noise_angles = 2
Config.consistency_diffuse_loss_type = 'var'
Config.consistency_diffuse_loss_mult = 3e-5
Config.consistency_specular_loss_type = 'var'
Config.consistency_specular_loss_mult = 3e-5
Config.consistency_normal_loss_target = 'normals'
Config.consistency_normal_loss_mult = 3e-5
Config.consistency_distance_loss_mult = 3e-6
Config.acc_threshold_for_consistency_loss = 0.1
"""
  config, model, state, batch = _setup(extra)
  assert config.sample_noise_size > config.batch_size
  train_step = jax.jit(step_lib.make_train_step(model, config))
  state, stats = train_step(state, batch)
  for k in ['diffuse_consistency', 'specular_consistency',
            'distance_consistency']:
    assert k in stats['losses'], k
  assert np.isfinite(float(stats['loss']))


def test_consistency_config_validation():
  """Disabled decay/warmup windows (values outside (0,1]) must not trip
  the inverted-window check; a zero noise-ray budget with a distance-only
  consistency loss must fail loudly instead of silently no-opping."""
  # warmup 0.6 with decay DISABLED (0.0) is legal.
  config, model, state, batch = _setup(
      'Config.sample_noise_size = 16\n'
      'Config.sample_noise_angles = 2\n'
      'Config.consistency_diffuse_loss_mult = 1e-4\n'
      'Config.consistency_warmup_steps = 0.6\n'
      'Config.consistency_decay_steps = 0.0\n')
  step_lib.make_train_step(model, config)  # no raise

  # Inverted ENABLED windows still raise.
  config2, model2, _, _ = _setup(
      'Config.sample_noise_size = 16\n'
      'Config.sample_noise_angles = 2\n'
      'Config.consistency_diffuse_loss_mult = 1e-4\n'
      'Config.consistency_warmup_steps = 0.8\n'
      'Config.consistency_decay_steps = 0.5\n')
  import pytest as pytest_lib
  with pytest_lib.raises(ValueError, match='decay should be after'):
    step_lib.make_train_step(model2, config2)

  # Distance consistency with no noise budget: loud, not a silent no-op.
  config3, model3, _, _ = _setup(
      'Config.sample_noise_size = 0\n'
      'Config.consistency_distance_loss_mult = 1e-4\n')
  with pytest_lib.raises(ValueError, match='too large for sampling noise'):
    step_lib.make_train_step(model3, config3)


def test_randomized_background_training():
  """A non-degenerate bg_intensity_range samples per-ray backgrounds in
  training (restored multinerf behavior the torch port dropped) and uses
  the midpoint deterministically in eval."""
  config, model, state, batch = _setup('Model.bg_intensity_range = (0., 1.)\n')
  rays = batch.rays

  def rgb(train, seed):
    rng = jax.random.PRNGKey(seed) if seed is not None else None
    renderings, _ = model.apply({'params': state.params}, rays,
                                train_frac=1.0, compute_extras=False,
                                train=train, rng=rng)
    return np.asarray(renderings[-1]['rgb'])

  r1, r2 = rgb(True, 1), rgb(True, 2)
  assert np.abs(r1 - r2).max() > 1e-4  # different bg draws
  e1, e2 = rgb(False, None), rgb(False, None)
  np.testing.assert_array_equal(e1, e2)  # eval stays deterministic
