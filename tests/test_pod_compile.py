"""Pod-shape AOT compile: the flagship sharded step partitions at
pod-slice meshes (the only pod-scale signal a single-chip environment can
produce). Each shape needs its own process because the virtual device
count is fixed at backend init, so the tool is driven via subprocess.
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(n, geometry=True):
  env = dict(os.environ)
  env.pop('XLA_FLAGS', None)
  env.pop('JAX_PLATFORMS', None)
  # CPU-only AOT check: skip the host image's remote-TPU plugin registration
  # (it would dial the chip tunnel; see test_cli._run).
  env.pop('PALLAS_AXON_POOL_IPS', None)
  cmd = [sys.executable, os.path.join(_REPO, 'tools', 'pod_compile_check.py'),
         '--devices', str(n)]
  if geometry:
    cmd.append('--geometry')
  out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=_REPO, timeout=1500)
  assert out.returncode == 0, out.stderr[-2000:]
  return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.parametrize('n', [16, 64])
def test_pod_slice_compiles_with_bucketed_allreduce(n):
  r = _run(n)
  assert r['ok']
  # The gradient all-reduce exists and gradients are bucketed into a
  # handful of fused collectives, not one per parameter leaf.
  assert 1 <= r['all_reduce'] < r['param_leaves']


def test_pod_slice_compiles_tensor_parallel():
  """The 2D (data, model) TP program partitions at a pod slice and emits
  real TP collectives (trunk activation all-gathers) alongside the
  gradient all-reduce."""
  env = dict(os.environ)
  env.pop('XLA_FLAGS', None)
  env.pop('JAX_PLATFORMS', None)
  env.pop('PALLAS_AXON_POOL_IPS', None)
  cmd = [sys.executable, os.path.join(_REPO, 'tools', 'pod_compile_check.py'),
         '--devices', '16', '--model-parallel', '4']
  out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=_REPO, timeout=1500)
  assert out.returncode == 0, out.stderr[-2000:]
  r = json.loads(out.stdout.strip().splitlines()[-1])
  assert r['ok'] and r['model_parallel'] == 4
  assert r['all_gather'] >= 1
