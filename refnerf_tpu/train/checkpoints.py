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
from typing import Optional

import numpy as np
import orbax.checkpoint as ocp


def checkpoint_dir(config) -> str:
  """<ckpt>/ckpt/<exp-prefix>/<exp> (reference layout, train.py:63-64)."""
  return os.path.join(config.checkpoint_dir, 'ckpt',
                      config.exp_name.split('_')[0], config.exp_name)


class CheckpointManager:
  """Step-indexed TrainState checkpoints: top-k by val PSNR + always-latest.

  Two orbax managers mirror the reference's ModelCheckpoint policy
  (save_top_k on val/psnr AND save_last; train.py:62-70): `best/` retains the
  k best-scoring steps, `last/` always holds the most recent step for resume.
  """

  def __init__(self, directory: str, save_top_k: int = 5):
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    self._last = ocp.CheckpointManager(
        os.path.join(directory, 'last'),
        options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True))
    best_options = ocp.CheckpointManagerOptions(
        max_to_keep=max(save_top_k, 1),
        best_fn=lambda m: m.get('val_psnr', -np.inf),
        best_mode='max',
        keep_checkpoints_without_metrics=True,
        create=True)
    self._best = ocp.CheckpointManager(
        os.path.join(directory, 'best'), options=best_options)

  def save(self, step: int, state, val_psnr: Optional[float] = None):
    self._last.save(step, args=ocp.args.StandardSave(state))
    if val_psnr is None:
      # "Best" is defined by the metric: a score-less save goes to last/
      # only. (Handing orbax a metrics-less checkpoint with
      # keep_checkpoints_without_metrics=True would retain it FOREVER,
      # bypassing save_top_k and duplicating last/ on disk every save.)
      return
    self._best.save(step, args=ocp.args.StandardSave(state),
                    metrics={'val_psnr': float(val_psnr)})

  def wait(self):
    self._last.wait_until_finished()
    self._best.wait_until_finished()

  def latest_step(self) -> Optional[int]:
    steps = [s for s in (self._last.latest_step(), self._best.latest_step())
             if s is not None]
    return max(steps) if steps else None

  def best_step(self) -> Optional[int]:
    return self._best.best_step()

  def restore(self, state_template, step: Optional[int] = None):
    """Restore into the structure of `state_template` (latest by default)."""
    if step is None:
      step = self.latest_step()
    if step is None:
      raise FileNotFoundError('No checkpoint found.')
    args = ocp.args.StandardRestore(state_template)
    if self._last.latest_step() == step:
      return self._last.restore(step, args=args)
    return self._best.restore(step, args=args)

  def close(self):
    self._last.close()
    self._best.close()
