"""Export a trained orbax checkpoint as a refnerf-pl Lightning .ckpt.

The inverse of tools/import_torch_checkpoint.py - lets models trained here
load back into the PyTorch reference (or any torch tooling expecting its
layout):

  python tools/export_torch_checkpoint.py \
      --gin_configs=exps/logs/lego/lego_refnerf/config.gin \
      --out=exported.ckpt [--ref_basis=basis.npy] [--step=N]

The emitted dict holds {'state_dict': model.nerf_mlp.* / model.prop_mlp.*
tensors, 'global_step': step}; the geodesic-basis signed row permutation
is inverted so the reference's own basis ordering sees equivalent weights
(refnerf_tpu/interop.py).
"""

import sys

from absl import app
from absl import flags

sys.path.insert(0, '.')

flags.DEFINE_string('out', None, 'Output .ckpt path.', required=True)
flags.DEFINE_string('ref_basis', '',
                    'Optional .npy reference basis for non-standard '
                    'basis configs.')
flags.DEFINE_integer('step', -1, 'Checkpoint step (-1 = newest).')


def main(unused_argv):
  import jax
  import numpy as np
  import torch

  from refnerf_tpu import configs as configs_lib
  from refnerf_tpu import interop
  from refnerf_tpu.models import construct
  from refnerf_tpu.train import checkpoints as ckpt_lib
  from refnerf_tpu.train import step as step_lib

  config, gin = configs_lib.load_config(save_config=False)
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(config.seed), model)
  state = step_lib.create_train_state(config, model, params)

  mgr = ckpt_lib.CheckpointManager(ckpt_lib.checkpoint_dir(config))
  step = None if flags.FLAGS.step < 0 else flags.FLAGS.step
  state = mgr.restore(jax.device_get(state), step=step)
  mgr.close()

  ref_basis = (np.load(flags.FLAGS.ref_basis)
               if flags.FLAGS.ref_basis else None)
  sd = interop.params_to_torch_state_dict(
      jax.device_get(state.params), model, ref_basis=ref_basis)
  torch.save({'state_dict': {k: torch.from_numpy(np.array(v))
                             for k, v in sd.items()},
              'global_step': int(state.step)}, flags.FLAGS.out)
  print(f'Exported step {int(state.step)} ({len(sd)} tensors) -> '
        f'{flags.FLAGS.out}')


if __name__ == '__main__':
  from refnerf_tpu import configs as _c
  _c.define_common_flags()
  app.run(main)
