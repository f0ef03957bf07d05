"""Evaluation CLI: loads the newest checkpoint and runs the test loop.

Same flag surface as the reference (eval.py:85) under the 'eval' gin scope.
Writes metric_{psnr,ssim,lpips}.txt, color-corrected variants,
render_times.txt and avg_metrics.txt next to the checkpoints. With
Config.eval_only_once = False, keeps watching for new checkpoints and
evaluates each as it appears (continuous eval alongside training).
"""

import random
import time

import numpy as np
from absl import app

from refnerf_tpu import configs as configs_lib

CHECKPOINT_POLL_SECS = 30


def main(unused_argv):
  config, gin = configs_lib.load_config(scope='eval', save_config=False)
  random.seed(config.seed)
  np.random.seed(config.seed)

  from refnerf_tpu.system import NeRFSystem

  system = NeRFSystem(config, gin)
  last_evaluated = None
  while True:
    step = system.restore_latest()
    if step != last_evaluated:
      print(f'Evaluating checkpoint at step {step}')
      system.test(step=step)
      last_evaluated = step
    if config.eval_only_once or step >= config.max_steps:
      break
    time.sleep(CHECKPOINT_POLL_SECS)


if __name__ == '__main__':
  configs_lib.define_common_flags()
  app.run(main)
