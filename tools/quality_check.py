"""End-to-end quality check: train Ref-NeRF on the analytic sphere scene and
report held-out PSNR/SSIM. A healthy implementation exceeds ~25 dB within a
few thousand steps; failures in sampling, IPE, compositing, or the loss
stack show up immediately as a plateau.

Usage: python tools/quality_check.py [--steps 3000] [--out /tmp/quality]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--steps', type=int, default=3000)
  p.add_argument('--out', default='/tmp/quality_check')
  p.add_argument('--scene', default=None,
                 help='scene dir (default: /tmp/<kind>_scene)')
  p.add_argument('--scene-kind', choices=['sphere', 'shiny'],
                 default='sphere',
                 help='sphere = diffuse Lambertian; shiny = glossy sphere '
                      'under an analytic environment (view-dependent '
                      'specular - the Ref-NeRF capability check)')
  p.add_argument('--gin', default='blender_refnerf.gin',
                 help='config under configs/ (e.g. blender_mipnerf.gin '
                      'for the no-reflection ablation)')
  p.add_argument('--res', type=int, default=64)
  p.add_argument('--bf16', action='store_true', default=True)
  p.add_argument('--f32', action='store_true',
                 help='override --bf16: run the trunks in float32')
  p.add_argument('--fused', choices=['auto', 'on', 'off'], default='auto',
                 help='NerfMLP.fused_trunk (A/B the Pallas kernels)')
  p.add_argument('--bindings', action='append', default=[],
                 help='extra gin bindings, applied last (win over the '
                      'built-in ones), e.g. "Config.n_input_views = 4"')
  args = p.parse_args()

  import jax
  jax.config.update('jax_compilation_cache_dir',
                    os.path.join(os.path.dirname(__file__), '..',
                                 '.jax_cache'))
  if args.scene_kind == 'shiny':
    from tools.make_shiny_scene import make_scene
  else:
    from tools.make_sphere_scene import make_scene
  if args.scene is None:
    args.scene = f'/tmp/{args.scene_kind}_scene'
  from refnerf_tpu import configs as configs_lib
  from refnerf_tpu.system import NeRFSystem

  if not os.path.exists(os.path.join(args.scene, 'transforms_train.json')):
    make_scene(args.scene, res=args.res)

  bindings = [
      f"Config.data_dir = '{args.scene}'",
      f"Config.checkpoint_dir = '{args.out}'",
      "Config.exp_name = 'sphere_quality'",
      'Config.batch_size = 1024',
      'Config.render_chunk_size = 4096',
      f'Config.max_steps = {args.steps}',
      f'Config.checkpoint_every = {args.steps}',
      'Config.print_every = 500',
      'Config.val_sample_num = 4',
      'Config.sample_noise_size = 0',
      # Short-run LR schedule (the 300k-step schedule barely decays here).
      'Config.lr_delay_steps = 512',
  ]
  if args.bf16 and not args.f32:
    bindings.append("NerfMLP.compute_dtype = 'bfloat16'")
  bindings.append(f"NerfMLP.fused_trunk = '{args.fused}'")
  bindings.extend(args.bindings)

  config, gin = configs_lib.parse(
      [os.path.join(os.path.dirname(__file__), '..', 'configs',
                    args.gin)], bindings)

  system = NeRFSystem(config, gin)
  t0 = time.time()
  system.train()
  train_time = time.time() - t0
  psnr = system.validate(step=args.steps)
  print(f'QUALITY_CHECK steps={args.steps} train_time={train_time:.0f}s '
        f'heldout_psnr={psnr:.2f}')
  return psnr


if __name__ == '__main__':
  main()
