"""Path-rendering CLI: render a camera path from the newest checkpoint.

Same flag surface as the reference (render.py:115) under the 'render' scope.
Output frames land in `path_renders_step_N/` (or `test_preds_step_N/`),
rendering is resumable and shardable across jobs via
Config.render_job_id/render_num_jobs, and videos are assembled once all
frames exist.
"""

import os
import random

import numpy as np
from absl import app

from refnerf_tpu import configs as configs_lib


def main(unused_argv):
  config, gin = configs_lib.load_config(scope='render', save_config=False)
  random.seed(config.seed + config.render_job_id)
  np.random.seed(config.seed + config.render_job_id)

  from refnerf_tpu.data import datasets as datasets_lib
  from refnerf_tpu.system import NeRFSystem
  from refnerf_tpu.train import checkpoints as ckpt_lib

  dataset = datasets_lib.load_dataset('test', config.data_dir, config)

  system = NeRFSystem(config, gin)
  step = system.restore_latest()
  print(f'Rendering checkpoint at step {step}')

  base_dir = ckpt_lib.checkpoint_dir(config)
  out_name = 'path_renders' if config.render_path else 'test_preds'
  out_name = f'{out_name}_step_{step}'
  out_dir = os.path.join(base_dir, out_name)

  system.render(dataset, base_dir, out_dir, out_name)


if __name__ == '__main__':
  configs_lib.define_common_flags()
  app.run(main)
