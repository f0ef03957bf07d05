"""Mesh + sharding helpers: the framework's entire distributed runtime.

The reference delegates multi-device training to PyTorch-Lightning DDP with
NCCL allreduce (ref: train.py:76-90, SURVEY §2 parallelism inventory). Here
data parallelism is expressed declaratively: rays are embarrassingly parallel,
so the batch is sharded along its leading axis over a 1D 'data' mesh, params
are replicated, and GSPMD inserts the gradient psum over ICI. The same
annotations scale to multi-host (DCN) without code changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def initialize_distributed():
  """Multi-host init: call once per process before any jax computation.

  Two modes:
  - Explicit coordinator (COORDINATOR_ADDRESS + JAX_PROCESS_COUNT +
    JAX_PROCESS_ID set): passes them to jax.distributed.initialize. This is
    how multi-process CPU/GPU clusters (and tests/test_multiprocess.py, a
    real two-process run with cross-process gloo collectives) come up.
  - Autodetect (only JAX_PROCESS_COUNT > 1): on TPU pods
    jax.distributed.initialize() finds the coordinator from the TPU
    environment; gradient reduction then spans ICI within a slice and DCN
    across hosts with the same sharding annotations.

  No-op on one host.
  """
  import os
  addr = os.environ.get('COORDINATOR_ADDRESS')
  nproc = os.environ.get('JAX_PROCESS_COUNT')
  if addr and nproc:
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(nproc),
        process_id=int(os.environ.get('JAX_PROCESS_ID', '0')))
  elif addr:
    # A coordinator address with no process count is a half-configured
    # launch; silently degrading to an un-joined single-process run would
    # train a wrong (un-synchronized) model, so fail loudly instead.
    raise ValueError(
        'COORDINATOR_ADDRESS is set but JAX_PROCESS_COUNT is not. Set '
        'JAX_PROCESS_COUNT (and JAX_PROCESS_ID) for an explicit multi-host '
        'launch, or unset COORDINATOR_ADDRESS for single-process runs.')
  elif int(nproc or '1') > 1:
    jax.distributed.initialize()


def create_mesh(devices: Optional[Sequence] = None,
                n_devices: Optional[int] = None) -> Mesh:
  """A 1D data-parallel mesh over the given (or all addressable+remote)
  devices. jax.devices() spans every process after initialize_distributed,
  so the same call builds the pod-wide mesh on multi-host."""
  if devices is None:
    devices = jax.devices()
    if n_devices is not None:
      devices = devices[:n_devices]
  return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
  """Shard the leading (ray) axis across the data mesh."""
  return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
  """Device_put a host batch with its ray axis sharded across the mesh."""
  sharding = batch_sharding(mesh)
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
  """Replicate a pytree (params/opt state) on every device of the mesh."""
  sharding = replicated(mesh)
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, sharding), tree)


def round_up_to_multiple(n: int, m: int) -> int:
  return ((n + m - 1) // m) * m


def pad_batch_size(batch_size: int, mesh: Mesh) -> int:
  """Batch sizes must divide evenly across the data axis."""
  return round_up_to_multiple(batch_size, mesh.shape[DATA_AXIS])
