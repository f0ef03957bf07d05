"""One process of a real two-process data-parallel training run.

Launched (twice) by tests/test_multiprocess.py with COORDINATOR_ADDRESS /
JAX_PROCESS_COUNT / JAX_PROCESS_ID set. Each process owns 2 virtual CPU
devices; parallel.mesh.initialize_distributed brings up the jax.distributed
runtime (cross-process collectives ride gloo on CPU, ICI/DCN on real
hardware - same program either way), create_mesh builds the 4-device global
mesh, and the standard GSPMD train step runs with the batch sharded across
all processes. This exercises the multi-host code path of
parallel/mesh.py end to end, matching the role of the reference's DDP
launch (reference train.py:76-90).

Writes {"process_id", "loss", "psnr", "checksum"} as JSON to argv[1].

IMPORT-SAFE: all environment mutation and jax initialization live inside
main(), because the pytest process imports this module (for N_STEPS) and
must not have its own 8-device virtual platform reconfigured.
"""

N_STEPS = 3


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
  assert jax.process_count() == 2, jax.process_count()
  assert jax.local_device_count() == 2
  assert jax.device_count() == 4

  # Identical seeded setup in every process -> identical global batch; the
  # device_put in shard_batch places only this process's shards.
  config, model, state, batch = _setup()
  mesh = mesh_lib.create_mesh()
  assert mesh.shape[mesh_lib.DATA_AXIS] == 4

  state = mesh_lib.replicate(state, mesh)
  batch = mesh_lib.shard_batch(batch, mesh)
  train_step = jax.jit(step_lib.make_train_step(model, config))
  for _ in range(N_STEPS):
    state, stats = train_step(state, batch)

  checksum = float(sum(
      np.abs(fetch(leaf)).sum()
      for leaf in jax.tree_util.tree_leaves(state.params)))
  result = {
      'process_id': jax.process_index(),
      'loss': float(fetch(stats['loss'])),
      'psnr': float(fetch(stats['psnr'])),
      'checksum': checksum,
  }
  with open(out_path, 'w') as f:
    json.dump(result, f)
  print('worker', jax.process_index(), 'ok', result, flush=True)


if __name__ == '__main__':
  main()
