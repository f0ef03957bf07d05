"""Import a refnerf-pl (PyTorch-Lightning) checkpoint into this framework.

One command converts a reference `.ckpt` into an orbax checkpoint that
eval.py / render.py / tools/export_serving.py consume directly:

  python tools/import_torch_checkpoint.py \
      --ckpt=last.ckpt \
      --gin_configs=configs/blender_refnerf.gin \
      --gin_bindings="Config.checkpoint_dir = 'exps'" \
      --gin_bindings="Config.exp_name = 'imported'" \
      [--ref_basis=basis.npy] [--step=N]

The gin config must describe the architecture the checkpoint was trained
with (the reference stores no architecture metadata in the ckpt). Layer
names map one-to-one; torch Linear weights transpose into Flax Dense
kernels; and the geodesic-basis vertex-order difference between the two
implementations is corrected exactly by a signed row permutation of the
encoding-consuming kernels (refnerf_tpu/interop.py). Optimizer moments are
not migrated - the imported checkpoint serves evaluation/rendering/serving
and fine-tuning from fresh optimizer state.
"""

import sys

from absl import app
from absl import flags

sys.path.insert(0, '.')

flags.DEFINE_string('ckpt', None, 'Path to the Lightning .ckpt file.',
                    required=True)
flags.DEFINE_string('ref_basis', '',
                    'Optional .npy with the reference basis matrix '
                    '[n_basis, 3] for non-standard basis configs.')
flags.DEFINE_integer('step', -1,
                     'Step to record (-1 = the ckpt\'s global_step).')


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

  try:
    ckpt = torch.load(flags.FLAGS.ckpt, map_location='cpu',
                      weights_only=True)
  except Exception as e:  # Lightning ckpts may pickle hyper_parameters etc.
    print(f'weights_only load failed ({type(e).__name__}); retrying with '
          'full unpickling - only do this with checkpoints you trust.')
    ckpt = torch.load(flags.FLAGS.ckpt, map_location='cpu',
                      weights_only=False)
  state_dict = ckpt.get('state_dict', ckpt)
  state_dict = {k: np.asarray(v) for k, v in state_dict.items()}
  step = flags.FLAGS.step
  if step < 0:
    step = int(ckpt.get('global_step', 0))

  ref_basis = (np.load(flags.FLAGS.ref_basis)
               if flags.FLAGS.ref_basis else None)
  new_params = interop.torch_state_dict_to_params(
      state_dict, params, model, ref_basis=ref_basis)
  new_params = jax.tree_util.tree_map(
      lambda t, s: np.asarray(s, dtype=t.dtype).reshape(np.shape(t)),
      params, new_params)

  state = step_lib.create_train_state(config, model, new_params)
  state = state.replace(step=step)
  out_dir = ckpt_lib.checkpoint_dir(config)
  mgr = ckpt_lib.CheckpointManager(out_dir)
  mgr.save(step, jax.device_get(state))
  mgr.wait()
  mgr.close()
  print(f'Imported {flags.FLAGS.ckpt} -> {out_dir} at step {step}')


if __name__ == '__main__':
  from refnerf_tpu import configs as _c
  _c.define_common_flags()
  app.run(main)
