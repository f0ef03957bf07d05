"""One process of a real multi-process distributed training run.

Launched (2 or 4 times) by tests/test_multiprocess.py with
COORDINATOR_ADDRESS / JAX_PROCESS_COUNT / JAX_PROCESS_ID set. Each process
owns 2 virtual CPU devices; parallel.mesh.initialize_distributed brings up
the jax.distributed runtime (cross-process collectives ride gloo on CPU,
ICI/DCN on real hardware - same program either way), create_mesh builds the
global mesh, and the train step runs with the batch sharded across all
processes. This exercises the multi-host code path of parallel/mesh.py end
to end, matching the role of the reference's DDP launch (reference
train.py:76-90).

Two modes, selected by MP_MODE:
- (default) plain: the standard GSPMD data-parallel step on the base
  config. Writes {"process_id", "loss", "psnr", "checksum"}.
- geometry3: the flagship geometry-loss stack (noisy second forward +
  masked consistency means, the hardest losses to shard) trained for
  N_STEPS under ALL THREE strategies - GSPMD DP, explicit shard_map+psum,
  and tensor parallelism over a 2D (data, model) mesh - in one process
  tree. Writes per-strategy losses + jitted global param checksums.

IMPORT-SAFE: all environment mutation and jax initialization live inside
main(), because the pytest process imports this module (for N_STEPS) and
must not have its own 8-device virtual platform reconfigured.
"""

N_STEPS = 3

# The llff_refnerf_geometry_losses.gin loss stack at test scale (cf.
# __graft_entry__._geometry_bindings). Batch 64 over 8 devices = 8
# rays/shard, so the 8 noise rays fit in one shard (the shard_map
# strategy's one-hop consistency-prefix gather requires it).
GEOMETRY_BINDINGS = """
Config.batch_size = 64
Config.sample_noise_size = 8
Config.sample_noise_angles = 2
Config.sample_angle_range = 5
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


def main():
  import json
  import os
  import sys

  # Platform must be pinned before jax initializes (the host image pins a
  # TPU plugin via sitecustomize; each worker gets 2 virtual CPU devices).
  os.environ['JAX_PLATFORMS'] = 'cpu'
  os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'

  import jax

  jax.config.update('jax_platforms', 'cpu')

  sys.path.insert(
      0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

  from refnerf_tpu.parallel import mesh as mesh_lib

  # Before any computation: join the 2-process cluster.
  mesh_lib.initialize_distributed()

  import numpy as np

  from refnerf_tpu.train import step as step_lib
  from tests.test_train_step import _setup

  def fetch(x):
    """Host value of a (replicated) global array via this process's shard."""
    return np.asarray(x.addressable_data(0))

  out_path = sys.argv[1]
  nproc = int(os.environ['JAX_PROCESS_COUNT'])
  assert jax.process_count() == nproc, jax.process_count()
  assert jax.local_device_count() == 2
  assert jax.device_count() == 2 * nproc

  if os.environ.get('MP_MODE') == 'geometry3':
    result = _run_geometry3(jax, np, mesh_lib, step_lib, _setup, fetch)
  else:
    result = _run_plain(jax, np, mesh_lib, step_lib, _setup, fetch)
  with open(out_path, 'w') as f:
    json.dump(result, f)
  print('worker', jax.process_index(), 'ok', result, flush=True)


def _run_plain(jax, np, mesh_lib, step_lib, _setup, fetch):
  # Identical seeded setup in every process -> identical global batch; the
  # device_put in shard_batch places only this process's shards.
  config, model, state, batch = _setup()
  mesh = mesh_lib.create_mesh()
  assert mesh.shape[mesh_lib.DATA_AXIS] == jax.device_count()

  state = mesh_lib.replicate(state, mesh)
  batch = mesh_lib.shard_batch(batch, mesh)
  train_step = jax.jit(step_lib.make_train_step(model, config))
  for _ in range(N_STEPS):
    state, stats = train_step(state, batch)

  checksum = float(sum(
      np.abs(fetch(leaf)).sum()
      for leaf in jax.tree_util.tree_leaves(state.params)))
  return {
      'process_id': jax.process_index(),
      'loss': float(fetch(stats['loss'])),
      'psnr': float(fetch(stats['psnr'])),
      'checksum': checksum,
  }


def _run_geometry3(jax, np, mesh_lib, step_lib, _setup, fetch):
  """Geometry-loss stack for N_STEPS under DP / shard_map / TP.

  Params may be cross-process sharded (TP), so checksums are computed
  INSIDE jit - the global sum reduction yields a replicated scalar every
  process can fetch from its local shard.
  """
  from refnerf_tpu.models import construct
  from refnerf_tpu.parallel import shard_step as shard_step_lib
  from refnerf_tpu.parallel import tp as tp_lib

  config, model, _, batch = _setup(extra=GEOMETRY_BINDINGS)
  mesh = mesh_lib.create_mesh()

  @jax.jit
  def checksum(params):
    return sum(jax.numpy.abs(leaf).sum()
               for leaf in jax.tree_util.tree_leaves(params))

  def fresh_state():
    params = construct.init_params(jax.random.PRNGKey(0), model)
    return step_lib.create_train_state(config, model, params)

  out = {'process_id': jax.process_index()}

  # 1. GSPMD data parallelism (replicated params, sharded rays).
  state = mesh_lib.replicate(fresh_state(), mesh)
  dp_batch = mesh_lib.shard_batch(batch, mesh)
  train_step = jax.jit(step_lib.make_train_step(model, config))
  for _ in range(N_STEPS):
    state, stats = train_step(state, dp_batch)
  out['dp_loss'] = float(fetch(stats['loss']))
  out['dp_checksum'] = float(fetch(checksum(state.params)))

  # 2. Explicit shard_map + psum collectives over the same mesh.
  state = mesh_lib.replicate(fresh_state(), mesh)
  sharded_step = shard_step_lib.make_sharded_train_step(model, config, mesh)
  for _ in range(N_STEPS):
    state, stats = sharded_step(state, dp_batch)
  out['shard_map_loss'] = float(fetch(stats['loss']))
  out['shard_map_checksum'] = float(fetch(checksum(state.params)))

  # 3. Tensor parallelism: trunk weights sharded over 'model' on a 2D
  # (data, model) mesh. model_parallel=4 > the 2 local devices, so each
  # model group spans two processes and the TP collectives cross gloo for
  # real (trunk width 16 shards 4 ways).
  mesh2d = tp_lib.create_mesh_2d(model_parallel=4)
  state = tp_lib.shard_state_tp(fresh_state(), mesh2d)
  tp_batch = mesh_lib.shard_batch(batch, mesh2d)
  tp_step = jax.jit(step_lib.make_train_step(model, config))
  for _ in range(N_STEPS):
    state, stats = tp_step(state, tp_batch)
  out['tp_loss'] = float(fetch(stats['loss']))
  out['tp_checksum'] = float(fetch(checksum(state.params)))
  return out


if __name__ == '__main__':
  main()
