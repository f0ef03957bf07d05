"""Export a trained checkpoint as a standalone serving artifact.

One command turns an experiment directory into a single weight-embedded
StableHLO file (refnerf_tpu/serving.py) a serving host can load without
gin configs, orbax checkpoints, or the model code:

  python tools/export_serving.py \
      --gin_configs=<ckpt>/logs/<exp>/config.gin \
      --out=/tmp/scene.rnsrv [--chunk=8192] [--platforms=cpu,tpu] \
      [--extras] [--step=N]

The gin snapshot written by train.py is the natural input: it pins the
architecture exactly as trained. The export forces fused_trunk='off' so the
artifact stays portable across hosts/TPU generations (see serving.py).
"""

import sys

from absl import app
from absl import flags

sys.path.insert(0, '.')

flags.DEFINE_string('out', None, 'Output .rnsrv path.', required=True)
flags.DEFINE_integer('chunk', 8192, 'Rays per serving call (static).')
flags.DEFINE_string('platforms', 'cpu,tpu',
                    'Comma-separated lowering platforms.')
flags.DEFINE_bool('extras', False, 'Include full extras buffers.')
flags.DEFINE_integer('step', -1, 'Checkpoint step (-1 = newest).')


def main(unused_argv):
  import jax

  from refnerf_tpu import configs as configs_lib
  from refnerf_tpu import serving
  from refnerf_tpu.models import construct
  from refnerf_tpu.train import checkpoints as ckpt_lib
  from refnerf_tpu.train import step as step_lib

  config, gin = configs_lib.load_config(save_config=False)
  # Portability: the artifact must not carry Pallas/Mosaic custom calls.
  gin.parse_line("NerfMLP.fused_trunk = 'off'")
  gin.parse_line("PropMLP.fused_trunk = 'off'")

  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(config.seed), model)
  state = step_lib.create_train_state(config, model, params)

  mgr = ckpt_lib.CheckpointManager(ckpt_lib.checkpoint_dir(config))
  step = None if flags.FLAGS.step < 0 else flags.FLAGS.step
  state = mgr.restore(jax.device_get(state), step=step)
  mgr.close()
  print(f'Restored step {int(state.step)} from '
        f'{ckpt_lib.checkpoint_dir(config)}')

  meta = serving.export_serving(
      model, state.params, flags.FLAGS.out, chunk=flags.FLAGS.chunk,
      platforms=tuple(p.strip()
                      for p in flags.FLAGS.platforms.split(',') if p.strip()),
      compute_extras=flags.FLAGS.extras,
      near=config.near, far=config.far)
  print(f'Wrote {flags.FLAGS.out}: {meta}')


if __name__ == '__main__':
  from refnerf_tpu import configs as _c
  _c.define_common_flags()
  app.run(main)
