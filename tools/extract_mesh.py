"""Extract a triangle mesh (PLY) from a trained checkpoint's density field.

Beyond-reference tool (the reference renders images only): evaluates the
NerfMLP density on a grid and runs marching tetrahedra with
density-gradient normals (refnerf_tpu/geometry.py).

Usage (same gin surface as eval.py, plus mesh flags):
  python tools/extract_mesh.py --gin_configs=... \
      [--resolution 256] [--iso 25] [--bound 1.5] [--out mesh.ply]

Scene bounds default to the [-bound, bound]^3 cube around the origin,
which matches the Blender-protocol object box; for LLFF-style scenes pass
explicit --lower/--upper.
"""

import os
import sys

from absl import app, flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from refnerf_tpu import configs as configs_lib  # noqa: E402

flags.DEFINE_integer('resolution', 256, 'grid resolution per axis')
flags.DEFINE_float('iso', 25.0, 'density isovalue; pass a negative value '
                   'to auto-pick the grid midpoint (min+max)/2')
flags.DEFINE_float('bound', 1.5, 'half-extent of the sampling cube')
flags.DEFINE_list('lower', None, 'explicit lower corner x,y,z')
flags.DEFINE_list('upper', None, 'explicit upper corner x,y,z')
flags.DEFINE_string('out', None,
                    'output .ply (default <ckpt_dir>/mesh_step_N.ply)')
FLAGS = flags.FLAGS


def main(unused_argv):
  config, gin = configs_lib.load_config(scope='eval', save_config=False)

  from refnerf_tpu import geometry
  from refnerf_tpu.system import NeRFSystem
  from refnerf_tpu.train import checkpoints as ckpt_lib

  system = NeRFSystem(config, gin)
  step = system.restore_latest()
  print(f'Extracting mesh from checkpoint at step {step}')

  if bool(FLAGS.lower) != bool(FLAGS.upper):
    raise app.UsageError('--lower and --upper must be given together')
  if FLAGS.lower and FLAGS.upper:
    lower = [float(v) for v in FLAGS.lower]
    upper = [float(v) for v in FLAGS.upper]
  else:
    lower = [-FLAGS.bound] * 3
    upper = [FLAGS.bound] * 3

  params = system.state.params
  out = geometry.extract_mesh(system.model, params,
                              resolution=FLAGS.resolution,
                              lower=lower, upper=upper,
                              iso=None if FLAGS.iso < 0 else FLAGS.iso)
  verts, faces, normals = out['verts'], out['faces'], out['normals']
  print(f'{len(verts)} vertices, {len(faces)} faces '
        f'(density range {out["grid"].min():.2f}..{out["grid"].max():.2f}'
        f'{", diffuse vertex colors" if out["colors"] is not None else ""})')

  path = FLAGS.out or os.path.join(
      ckpt_lib.checkpoint_dir(config), f'mesh_step_{step}.ply')
  geometry.write_ply(path, verts, faces, normals, colors=out['colors'])
  print(f'Wrote {path}')
  return 0 if len(faces) else 1


if __name__ == '__main__':
  configs_lib.define_common_flags()
  app.run(main)
