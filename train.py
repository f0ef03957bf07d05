"""Training CLI: `python train.py --gin_configs=configs/... [--gin_bindings=...]`.

Same flag surface as the reference (train.py:97) under the 'train' gin scope.
Seeds every RNG source, builds the NeRFSystem, and runs the training loop
(periodic validation + top-k checkpoints on val/psnr handled inside).
"""

import os
import random

import numpy as np
from absl import app

from refnerf_tpu import configs as configs_lib


def setup_seed(seed):
  random.seed(seed)
  np.random.seed(seed)


def main(unused_argv):
  config, gin = configs_lib.load_config(scope='train')
  setup_seed(config.seed)

  from tensorboardX import SummaryWriter
  from refnerf_tpu.system import NeRFSystem

  log_dir = os.path.join(config.checkpoint_dir, 'logs',
                         config.exp_name.split('_')[0], config.exp_name)
  os.makedirs(log_dir, exist_ok=True)
  writer = SummaryWriter(log_dir)

  system = NeRFSystem(config, gin, summary_writer=writer)
  system.train()


if __name__ == '__main__':
  configs_lib.define_common_flags()
  with_flags = app.run
  with_flags(main)
