"""Tracing/profiling hooks (aux-subsystem parity; SURVEY §5).

The reference leans on Lightning's 'simple' profiler + hand-rolled
throughput counters (nerf_system.py:226-271). Here the counters live in
system.py, and deep tracing is jax.profiler: set
REFNERF_TPU_PROFILE_DIR=/tmp/trace (or call `trace(...)`) to capture a
TensorBoard-viewable device trace of a few training steps.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator

import jax

PROFILE_DIR_ENV = 'REFNERF_TPU_PROFILE_DIR'
# Capture window (steps) when env-driven profiling is on.
TRACE_START_STEP = 10
TRACE_NUM_STEPS = 5


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
  """Capture a jax.profiler trace for the enclosed block."""
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class StepTracer:
  """Env-driven trace of steps [TRACE_START_STEP, +TRACE_NUM_STEPS)."""

  def __init__(self):
    self.log_dir = os.environ.get(PROFILE_DIR_ENV)
    self._active = False

  def step(self, step: int):
    if not self.log_dir:
      return
    if step == TRACE_START_STEP and not self._active:
      jax.profiler.start_trace(self.log_dir)
      self._active = True
    elif step == TRACE_START_STEP + TRACE_NUM_STEPS and self._active:
      jax.profiler.stop_trace()
      self._active = False
      print(f'Wrote jax profiler trace to {self.log_dir}')

  def close(self):
    if self._active:
      jax.profiler.stop_trace()
      self._active = False


class Timer:
  """Tiny scoped wall-clock timer for host-side phases."""

  def __init__(self, name: str, verbose: bool = True):
    self.name = name
    self.verbose = verbose

  def __enter__(self):
    self.t0 = time.perf_counter()
    return self

  def __exit__(self, *exc):
    self.elapsed = time.perf_counter() - self.t0
    if self.verbose:
      print(f'[{self.name}] {self.elapsed:.3f}s')
