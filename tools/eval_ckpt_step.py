"""Evaluate one SPECIFIC checkpoint step (e.g. the top-k 'best' one).

eval.py always evaluates the newest checkpoint (the reference's behavior,
eval.py:85); this diagnostic driver restores an arbitrary saved step -
defaulting to the best-val-PSNR one the top-k policy retained - and runs
the same system.test() loop print-only (no files are overwritten), so a
declining-validation run can be compared best-vs-last after the fact.

Usage:
  python tools/eval_ckpt_step.py --step=best [gin flags as for eval.py]
  python tools/eval_ckpt_step.py --step=5000 ...
"""

import os
import random
import sys

import numpy as np
from absl import app, flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from refnerf_tpu import configs as configs_lib  # noqa: E402

_STEP = flags.DEFINE_string('step', 'best', "checkpoint step, or 'best'.")


def main(unused_argv):
  config, gin = configs_lib.load_config(scope='eval', save_config=False)
  config.eval_save_output = False  # print-only: never clobber test_preds
  random.seed(config.seed)
  np.random.seed(config.seed)

  import jax
  from refnerf_tpu.system import NeRFSystem
  from refnerf_tpu.train import checkpoints as ckpt_lib

  system = NeRFSystem(config, gin)
  mgr = ckpt_lib.CheckpointManager(
      ckpt_lib.checkpoint_dir(config), save_top_k=config.save_top_k)
  step = mgr.best_step() if _STEP.value == 'best' else int(_STEP.value)
  if step is None:
    raise SystemExit('no best/ checkpoint retained for this experiment')
  system.state = mgr.restore(jax.device_get(system.state), step=step)
  mgr.close()
  print(f'Evaluating checkpoint at step {step} '
        f'(policy: {"best val_psnr" if _STEP.value == "best" else "explicit"})')
  system.test(step=step)


if __name__ == '__main__':
  configs_lib.define_common_flags()
  app.run(main)
