"""Checkpoint / resume via orbax.

Replaces PL ModelCheckpoint (ref: train.py:62-70): checkpoints carry the full
TrainState (params + optimizer state + step), are written every
`checkpoint_every` steps, monitored on val PSNR with `save_top_k` retention
plus an always-retained latest ("last") checkpoint, and resume picks the
newest step (the reference's eval/render do the same by filename sort,
eval.py:54-56).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def checkpoint_dir(config) -> str:
  """<ckpt>/ckpt/<exp-prefix>/<exp> (reference layout, train.py:63-64)."""
  return os.path.join(config.checkpoint_dir, 'ckpt',
                      config.exp_name.split('_')[0], config.exp_name)


class CheckpointManager:
  """Step-indexed TrainState checkpoints with best-PSNR retention."""

  def __init__(self, directory: str, save_top_k: int = 5):
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max(save_top_k, 1),
        best_fn=(lambda m: m.get('val_psnr', -np.inf)) if save_top_k > 0
        else None,
        best_mode='max',
        keep_checkpoints_without_metrics=True,
        create=True)
    self._mgr = ocp.CheckpointManager(directory, options=options)

  def save(self, step: int, state, val_psnr: Optional[float] = None):
    metrics = {'val_psnr': float(val_psnr)} if val_psnr is not None else None
    self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)

  def wait(self):
    self._mgr.wait_until_finished()

  def latest_step(self) -> Optional[int]:
    return self._mgr.latest_step()

  def best_step(self) -> Optional[int]:
    return self._mgr.best_step()

  def restore(self, state_template, step: Optional[int] = None):
    """Restore into the structure of `state_template` (latest by default)."""
    if step is None:
      step = self.latest_step()
    if step is None:
      raise FileNotFoundError('No checkpoint found.')
    return self._mgr.restore(
        step, args=ocp.args.StandardRestore(state_template))

  def close(self):
    self._mgr.close()
