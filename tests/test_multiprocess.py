"""Two-process jax.distributed training: the multi-host path, for real.

Spawns two OS processes (tests/multiprocess_worker.py), each owning 2
virtual CPU devices, joined through parallel.mesh.initialize_distributed
into one 4-device global mesh. The standard GSPMD train step runs with the
batch sharded across both processes - gradient reduction crosses the
process boundary through real collectives (gloo on CPU; the identical
program rides ICI/DCN on TPU pods). Matches the role of the reference's
multi-GPU DDP launch (reference train.py:76-90), which trusts
torch-lightning; here the cross-process path is asserted numerically
against a single-process run of the same 4-way-sharded computation.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from refnerf_tpu.parallel import mesh as mesh_lib
from refnerf_tpu.train import step as step_lib
from tests import multiprocess_worker
from tests.test_train_step import _setup

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
  with socket.socket() as s:
    s.bind(('localhost', 0))
    return s.getsockname()[1]


def _spawn_workers(outdir, n_procs, mode=None, timeout=420):
  port = _free_port()
  procs, outs = [], []
  for pid in range(n_procs):
    out = outdir / f'result_{pid}.json'
    outs.append(out)
    env = dict(
        os.environ,
        COORDINATOR_ADDRESS=f'localhost:{port}',
        JAX_PROCESS_COUNT=str(n_procs),
        JAX_PROCESS_ID=str(pid),
    )
    if mode:
      env['MP_MODE'] = mode
    # Don't register the host image's remote-TPU plugin in CPU workers
    # (it would dial the chip tunnel; see test_cli._run).
    env.pop('PALLAS_AXON_POOL_IPS', None)
    procs.append(subprocess.Popen(
        [sys.executable, os.path.join(_REPO, 'tests', 'multiprocess_worker.py'),
         str(out)],
        env=env, cwd=_REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
  results = []
  for pid, p in enumerate(procs):
    try:
      stdout, _ = p.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
      for q in procs:
        q.kill()
      raise
    assert p.returncode == 0, f'worker {pid} failed:\n{stdout[-4000:]}'
    with open(outs[pid]) as f:
      results.append(json.load(f))
  return results


@pytest.fixture(scope='module')
def worker_results(tmp_path_factory):
  return _spawn_workers(tmp_path_factory.mktemp('mp'), n_procs=2)


def test_two_process_train_step_runs(worker_results):
  assert sorted(r['process_id'] for r in worker_results) == [0, 1]
  for r in worker_results:
    assert np.isfinite(r['loss'])
    assert np.isfinite(r['checksum'])


def test_processes_agree(worker_results):
  a, b = worker_results
  assert a['loss'] == b['loss']
  assert a['psnr'] == b['psnr']
  assert a['checksum'] == b['checksum']


def test_matches_single_process(worker_results):
  """The same 4-way-sharded computation in one process gives the same step."""
  config, model, state, batch = _setup()
  mesh = mesh_lib.create_mesh(n_devices=4)
  state = mesh_lib.replicate(state, mesh)
  batch = mesh_lib.shard_batch(batch, mesh)
  train_step = jax.jit(step_lib.make_train_step(model, config))
  for _ in range(multiprocess_worker.N_STEPS):
    state, stats = train_step(state, batch)
  checksum = float(sum(
      np.abs(np.asarray(leaf)).sum()
      for leaf in jax.tree_util.tree_leaves(state.params)))
  for r in worker_results:
    np.testing.assert_allclose(r['loss'], float(stats['loss']), rtol=1e-5)
    np.testing.assert_allclose(r['checksum'], checksum, rtol=1e-5)


@pytest.fixture(scope='module')
def geometry3_results(tmp_path_factory):
  """4 processes x 2 devices = one 8-device global mesh, geometry-loss
  stack, all three strategies (GSPMD DP, shard_map+psum, cross-process
  TP) inside each process tree."""
  return _spawn_workers(
      tmp_path_factory.mktemp('mp4'), n_procs=4, mode='geometry3',
      timeout=900)


def test_four_process_geometry_all_strategies_agree(geometry3_results):
  """Cross-process loss/checksum equality at 4 procs for all three
  strategies (VERDICT r3 #7; reference's only analog: train.py:88 DDP)."""
  assert sorted(r['process_id'] for r in geometry3_results) == [0, 1, 2, 3]
  r0 = geometry3_results[0]
  for key in ('dp_loss', 'shard_map_loss', 'tp_loss',
              'dp_checksum', 'shard_map_checksum', 'tp_checksum'):
    vals = [r[key] for r in geometry3_results]
    assert np.isfinite(vals).all(), (key, vals)
    # Same global program, same global data: every process sees the same
    # replicated scalar.
    np.testing.assert_allclose(vals, r0[key], rtol=1e-6, err_msg=key)
  # The three strategies compute the same step (modulo reduction order).
  np.testing.assert_allclose(
      r0['shard_map_loss'], r0['dp_loss'], rtol=1e-5)
  np.testing.assert_allclose(r0['tp_loss'], r0['dp_loss'], rtol=1e-5)
  np.testing.assert_allclose(
      r0['shard_map_checksum'], r0['dp_checksum'], rtol=1e-5)
  np.testing.assert_allclose(r0['tp_checksum'], r0['dp_checksum'], rtol=1e-5)


def test_four_process_geometry_matches_single_process(geometry3_results):
  """The same 8-way-sharded geometry-loss run in ONE process agrees with
  the 4-process cluster."""
  from tests import multiprocess_worker as mw
  config, model, _, batch = _setup(extra=mw.GEOMETRY_BINDINGS)
  from refnerf_tpu.models import construct
  params = construct.init_params(jax.random.PRNGKey(0), model)
  state = step_lib.create_train_state(config, model, params)
  mesh = mesh_lib.create_mesh(n_devices=8)
  state = mesh_lib.replicate(state, mesh)
  sharded = mesh_lib.shard_batch(batch, mesh)
  train_step = jax.jit(step_lib.make_train_step(model, config))
  for _ in range(mw.N_STEPS):
    state, stats = train_step(state, sharded)
  checksum = float(sum(
      np.abs(np.asarray(leaf)).sum()
      for leaf in jax.tree_util.tree_leaves(state.params)))
  for r in geometry3_results:
    np.testing.assert_allclose(r['dp_loss'], float(stats['loss']), rtol=1e-5)
    np.testing.assert_allclose(r['dp_checksum'], checksum, rtol=1e-5)


def test_half_configured_launch_raises(monkeypatch):
  """COORDINATOR_ADDRESS without JAX_PROCESS_COUNT must fail loudly, not
  degrade to an un-joined single-process run."""
  monkeypatch.setenv('COORDINATOR_ADDRESS', 'localhost:12345')
  monkeypatch.delenv('JAX_PROCESS_COUNT', raising=False)
  with pytest.raises(ValueError, match='JAX_PROCESS_COUNT'):
    mesh_lib.initialize_distributed()
