"""Tensor parallelism: trunk weights sharded over a 2D (data, model) mesh.

The reference has no tensor parallelism (SURVEY §2: "TP/PP/SP/EP absent" -
its only axis is DDP over rays, train.py:88). Ref-NeRF's shipped MLPs are
small enough to replicate, so plain data parallelism (parallel/mesh.py) is
the right default; this module exists for the scaling regime where a trunk
no longer fits (or no longer wants to be replicated) per chip: giant-MLP
variants, many-model ensembles, HBM-tight serving.

Design: declarative GSPMD, not hand-written collectives. Every trunk Dense
kernel [in, hidden] is sharded on its hidden axis over the 'model' mesh
axis (weight-stationary column parallelism; biases shard alongside), heads
and everything else stay replicated, and XLA inserts the all-gathers /
reduce-scatters wherever the program needs them - the same annotations
scale ICI-first on a real pod slice. The batch's ray axis continues to
shard over 'data', so the gradient all-reduce and the TP collectives
compose in one program.

Use with `NerfMLP.fused_trunk = 'off'` (the default decides per platform):
the fused Pallas kernels assume whole-trunk weights in VMEM, so GSPMD
would re-gather sharded params around every custom call - correct but
pointless. TP targets exactly the regime where a trunk outgrows that
kernel anyway.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from refnerf_tpu.parallel import mesh as mesh_lib

MODEL_AXIS = 'model'

# Trunk layers of both MLP stacks (spatial_N / viewdir_N, models/mlp.py);
# heads (raw_density, rgb, bottleneck, ...) are a few columns wide and stay
# replicated - sharding them would trade a broadcast for lane-starved
# matmul shards.
_TRUNK_RE = re.compile(r'(spatial|viewdir)_\d+$')


def create_mesh_2d(model_parallel: int, devices=None) -> Mesh:
  """A (data, model) mesh. `model_parallel` must divide the device count.

  Device order keeps the model axis innermost so TP collectives ride the
  fastest links (ICI neighbors on a real slice).
  """
  if devices is None:
    devices = jax.devices()
  n = len(devices)
  if n % model_parallel != 0:
    raise ValueError(
        f'model_parallel {model_parallel} must divide device count {n}')
  grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
  return Mesh(grid, (mesh_lib.DATA_AXIS, MODEL_AXIS))


def _path_keys(path):
  return [getattr(p, 'key', getattr(p, 'name', str(p))) for p in path]


def trunk_sharding(path, leaf, mesh: Mesh) -> NamedSharding:
  """Sharding for one state leaf: trunk kernels/biases over 'model',
  everything else (heads, step counter, optimizer scalars) replicated.

  The leaf path may be the raw param path or an optimizer-state path with
  extra prefix keys (optax adam's mu/nu mirror the param tree), so only
  the trailing (layer, kernel|bias) pair is matched.
  """
  keys = _path_keys(path)
  if len(keys) >= 2 and _TRUNK_RE.search(str(keys[-2])):
    hidden = int(np.shape(leaf)[-1]) if np.ndim(leaf) else 0
    if hidden % mesh.shape[MODEL_AXIS] == 0 and hidden > 0:
      if keys[-1] == 'kernel' and np.ndim(leaf) == 2:
        return NamedSharding(mesh, P(None, MODEL_AXIS))
      if keys[-1] == 'bias' and np.ndim(leaf) == 1:
        return NamedSharding(mesh, P(MODEL_AXIS))
  return NamedSharding(mesh, P())


def shard_state_tp(state, mesh: Mesh):
  """device_put a TrainState (params + optimizer mirrors) with trunk
  weights model-sharded. Widths that don't divide the model axis stay
  replicated rather than failing - the rule is an optimization, not a
  constraint."""
  return jax.tree_util.tree_map_with_path(
      lambda path, x: jax.device_put(x, trunk_sharding(path, x, mesh)),
      state)
