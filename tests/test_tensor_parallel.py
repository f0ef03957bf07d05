"""Tensor parallelism (parallel/tp.py): the model-sharded step must agree
with the replicated-params DP step, and the trunk weights must actually be
distributed over the 'model' mesh axis."""

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from refnerf_tpu.parallel import mesh as mesh_lib
from refnerf_tpu.parallel import tp as tp_lib
from refnerf_tpu.train import step as step_lib
from tests.test_train_step import _setup


def _run_steps(state, batch, model, config, n=2):
  train_step = jax.jit(step_lib.make_train_step(model, config))
  stats = None
  for _ in range(n):
    state, stats = train_step(state, batch)
  return state, stats


def test_tp_matches_dp():
  """2x4 (data, model) mesh vs 8-way DP: same loss, same updated params."""
  config, model, state, batch = _setup()

  mesh_dp = mesh_lib.create_mesh()
  state_dp = mesh_lib.replicate(state, mesh_dp)
  batch_dp = mesh_lib.shard_batch(batch, mesh_dp)
  state_dp, stats_dp = _run_steps(state_dp, batch_dp, model, config)

  config2, model2, state2, batch2 = _setup()
  mesh_tp = tp_lib.create_mesh_2d(model_parallel=4)
  assert dict(mesh_tp.shape) == {'data': 2, 'model': 4}
  state_tp = tp_lib.shard_state_tp(state2, mesh_tp)
  batch_tp = mesh_lib.shard_batch(batch2, mesh_tp)
  state_tp, stats_tp = _run_steps(state_tp, batch_tp, model2, config2)

  np.testing.assert_allclose(float(stats_dp['loss']),
                             float(stats_tp['loss']), rtol=1e-5)
  for (pa, a), (pb, b) in zip(
      jax.tree_util.tree_leaves_with_path(state_dp.params),
      jax.tree_util.tree_leaves_with_path(state_tp.params)):
    assert pa == pb
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                               err_msg=jax.tree_util.keystr(pa))


def test_tp_actually_shards_trunks():
  """Trunk kernels/biases land with a 'model'-axis sharding; heads and the
  optimizer mirrors follow the same rule."""
  config, model, state, batch = _setup()
  mesh = tp_lib.create_mesh_2d(model_parallel=4)
  state = tp_lib.shard_state_tp(state, mesh)

  def spec_of(x):
    return x.sharding.spec

  seen_sharded = 0
  for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
    name = jax.tree_util.keystr(path)
    if 'spatial_' in name or 'viewdir_' in name:
      if name.endswith("['kernel']"):
        assert spec_of(leaf) == P(None, 'model'), name
      else:
        assert spec_of(leaf) == P('model'), name
      seen_sharded += 1
    else:
      assert spec_of(leaf) == P(), name
  assert seen_sharded >= 6  # tiny config: 2 spatial + 1 viewdir layers

  # Adam mu/nu mirror the param tree and must shard identically (a
  # replicated optimizer moment next to a sharded weight would silently
  # blow the memory budget TP exists to save).
  mu = state.opt_state[0].mu if hasattr(state.opt_state[0], 'mu') else None
  if mu is not None:
    for path, leaf in jax.tree_util.tree_leaves_with_path(mu):
      name = jax.tree_util.keystr(path)
      if ('spatial_' in name or 'viewdir_' in name) and \
          name.endswith("['kernel']"):
        assert spec_of(leaf) == P(None, 'model'), name


def test_tp_indivisible_width_stays_replicated():
  """A hidden width that doesn't divide the model axis must not fail -
  the rule degrades to replication for that leaf."""
  config, model, state, batch = _setup(
      'NerfMLP.net_width = 20\nNerfMLP.net_width_viewdirs = 20\n')
  mesh = tp_lib.create_mesh_2d(model_parallel=8)  # 20 % 8 != 0
  state = tp_lib.shard_state_tp(state, mesh)
  for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
    if jax.tree_util.keystr(path).endswith("['spatial_1']['kernel']"):
      assert leaf.sharding.spec == P()
  state, stats = _run_steps(state, mesh_lib.shard_batch(batch, mesh),
                            model, config, n=1)
  assert np.isfinite(float(stats['loss']))


def test_mesh_2d_validates_divisibility():
  import pytest
  with pytest.raises(ValueError, match='must divide'):
    tp_lib.create_mesh_2d(model_parallel=3)
