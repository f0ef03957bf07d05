"""AOT pod-shape compile evidence: lower + compile the flagship sharded
train step at pod-slice meshes (16/64/256 virtual devices) on the CPU
backend and verify the GSPMD collectives.

Single-chip environments can't execute pod programs, but XLA's SPMD
partitioner runs entirely at compile time, so `jit(...).lower().compile()`
over an N-device mesh is a real pod-scale signal: it proves the flagship
program (geometry-loss stack included) partitions, that the gradient
all-reduce is emitted, and that gradients are bucketed into a handful of
fused all-reduces rather than one per parameter (the reference trusts
torch DDP for the same property, train.py:88).

Usage: python tools/pod_compile_check.py --devices 16 [--geometry]
Prints one JSON line: {"devices": N, "ok": true, "all_reduce": k, ...}.
Must be run in a fresh process (the device count is fixed at backend init).
"""

import argparse
import json
import os
import re
import sys


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--devices', type=int, required=True)
  p.add_argument('--geometry', action='store_true',
                 help='include the noisy-consistency geometry-loss stack')
  p.add_argument('--model-parallel', type=int, default=1,
                 help='shard trunk weights over a model axis this wide '
                      '(2D (data, model) mesh, parallel/tp.py)')
  args = p.parse_args()
  n = args.devices

  flags = os.environ.get('XLA_FLAGS', '')
  if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + f' --xla_force_host_platform_device_count={n}').strip()

  sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
      __file__))))

  import jax
  jax.config.update('jax_platforms', 'cpu')
  import jax.numpy as jnp
  import numpy as np

  import __graft_entry__ as ge
  from refnerf_tpu import configs as configs_lib
  from refnerf_tpu.cameras import rays as rays_lib
  from refnerf_tpu.models import construct
  from refnerf_tpu.parallel import mesh as mesh_lib
  from refnerf_tpu.train import step as step_lib

  devices = jax.devices()
  assert len(devices) >= n, (len(devices), n)
  if args.model_parallel > 1:
    from refnerf_tpu.parallel import tp as tp_lib
    mesh = tp_lib.create_mesh_2d(args.model_parallel, devices[:n])
  else:
    mesh = mesh_lib.create_mesh(devices[:n])

  batch_size = 8 * n
  bindings = [ge._tiny_bindings(batch=batch_size, samples=8, width=16)]
  if args.geometry:
    bindings.append(ge._geometry_bindings(batch_size, n))
  config, gin = configs_lib.parse(None, bindings)
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  if args.model_parallel > 1:
    state = tp_lib.shard_state_tp(
        step_lib.create_train_state(config, model, params), mesh)
  else:
    state = mesh_lib.replicate(
        step_lib.create_train_state(config, model, params), mesh)

  rays = ge._example_rays(batch_size)
  rng = np.random.RandomState(1)
  batch = rays_lib.Batch(
      rays=rays,
      rgb=jnp.asarray(rng.uniform(0, 1, (batch_size, 3)).astype(np.float32)))
  batch = mesh_lib.shard_batch(batch, mesh)

  step = jax.jit(step_lib.make_train_step(model, config))
  compiled = step.lower(state, batch).compile()
  txt = compiled.as_text()

  n_ar = len(re.findall(r'all-reduce[\w.]*\s*=', txt))
  n_ag = len(re.findall(r'all-gather[\w.]*\s*=', txt))
  n_params = len(jax.tree_util.tree_leaves(params))

  ok = n_ar >= 1 and n_ar < n_params
  if args.model_parallel > 1:
    # TP must actually communicate: the partitioner emits gather/reduce
    # collectives for the sharded trunk activations.
    ok = ok and (n_ag >= 1 or n_ar >= 2)
  print(json.dumps({
      'devices': n, 'ok': bool(ok), 'geometry': bool(args.geometry),
      'model_parallel': args.model_parallel,
      'all_reduce': n_ar, 'all_gather': n_ag, 'param_leaves': n_params}))
  return 0 if ok else 1


if __name__ == '__main__':
  sys.exit(main())
