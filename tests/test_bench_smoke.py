"""Smoke-test bench.py end to end on the CPU backend.

bench.py is the round-level headline artifact (the driver runs it on real
TPU hardware and records the JSON line); nothing else exercised its full
path — config parse, model construct, jitted train step, the host-fetch
sync, JSON output — so a refactor could break it silently until the next
hardware run. Runs it as a subprocess at tiny batch/steps on CPU (fused
kernels auto-fall back to plain XLA there; the code path up to kernel
dispatch is identical) and checks the JSON contract.
"""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(env_extra):
  env = {k: v for k, v in os.environ.items()
         if k != 'PALLAS_AXON_POOL_IPS'}  # force-selects the remote TPU
  env.update({
      'JAX_PLATFORMS': 'cpu',
      'JAX_COMPILATION_CACHE_DIR': os.path.join(_REPO, '.jax_cache'),
      'BENCH_BATCH': '64',
      'BENCH_STEPS': '2',
  })
  env.update(env_extra)
  out = subprocess.run(
      [sys.executable, os.path.join(_REPO, 'bench.py')],
      capture_output=True, text=True, env=env, cwd=_REPO, timeout=600)
  assert out.returncode == 0, out.stderr[-2000:]
  # The contract: exactly ONE JSON line on stdout.
  lines = [l for l in out.stdout.splitlines() if l.strip()]
  assert len(lines) == 1, out.stdout
  return json.loads(lines[0])


def test_bench_train_json_contract():
  rec = _run({})
  assert rec['metric'] == 'train_rays_per_sec'
  assert rec['unit'] == 'rays/s'
  assert rec['value'] > 0 and rec['vs_baseline'] > 0


def test_bench_forward_json_contract():
  rec = _run({'BENCH_FWD': '1'})
  assert rec['metric'] == 'eval_rays_per_sec'
  assert rec['value'] > 0


def test_bench_watchdog_emits_error_json():
  """With a 0s init budget the watchdog must print one parseable error JSON
  and exit nonzero instead of hanging - the driver-facing failure contract
  when the TPU pool is unreachable at round end."""
  env = {k: v for k, v in os.environ.items()
         if k != 'PALLAS_AXON_POOL_IPS'}
  env.update({'JAX_PLATFORMS': 'cpu', 'BENCH_INIT_TIMEOUT': '0'})
  out = subprocess.run(
      [sys.executable, os.path.join(_REPO, 'bench.py')],
      capture_output=True, text=True, env=env, cwd=_REPO, timeout=120)
  assert out.returncode == 3, (out.returncode, out.stderr[-500:])
  lines = [l for l in out.stdout.splitlines() if l.strip()]
  rec = json.loads(lines[0])
  assert 'error' in rec and rec['metric'] == 'train_rays_per_sec'
