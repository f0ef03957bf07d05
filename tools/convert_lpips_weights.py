"""Produce the VGG16-LPIPS .npz consumed by refnerf_tpu/metrics.py::VGGLPIPS.

The eval harness computes LPIPS(VGG) like the reference does via the `lpips`
package (reference internal/image.py:133-137); pretrained weights cannot be
fetched from a zero-egress TPU pod, so they are provisioned once as a
single .npz and pointed to with REFNERF_TPU_LPIPS_WEIGHTS.

Two ways to run:

1. From local weight files (only `torch` required - works offline):

     python tools/convert_lpips_weights.py out.npz \
         --vgg16 /path/to/vgg16-397923af.pth \
         --lpips /path/to/lpips_vgg.pth

   where vgg16-397923af.pth is torchvision's IMAGENET1K_V1 VGG16 state
   dict (https://download.pytorch.org/models/vgg16-397923af.pth) and
   lpips_vgg.pth is the LPIPS v0.1 VGG linear head
   (https://github.com/richzhang/PerceptualSimilarity
    lpips/weights/v0.1/vgg.pth).

2. From the installed packages, downloading as needed (requires network +
   `torchvision` + `lpips`):

     python tools/convert_lpips_weights.py out.npz

Then ship out.npz and `export REFNERF_TPU_LPIPS_WEIGHTS=/path/to/out.npz`.
tests/test_lpips.py pins the evaluator's math against a torch
reimplementation of the lpips-package pipeline, so a correctly converted
archive reproduces the reference's LPIPS values.
"""

import argparse

import numpy as np

# torchvision VGG16 `features` indices that are convolutions.
CONV_IDS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
# Channel width of each LPIPS tap (relu1_2 / 2_2 / 3_3 / 4_3 / 5_3).
LIN_CHANNELS = (64, 128, 256, 512, 512)


def from_state_dicts(vgg_sd, lpips_sd):
  """(torchvision-vgg16 state dict, lpips-vgg state dict) -> npz arrays."""
  arrays = {}
  for cid in CONV_IDS:
    arrays[f'features_{cid}_weight'] = np.asarray(
        vgg_sd[f'features.{cid}.weight'], np.float32)
    arrays[f'features_{cid}_bias'] = np.asarray(
        vgg_sd[f'features.{cid}.bias'], np.float32)
  for k, c in enumerate(LIN_CHANNELS):
    # lpips>=0.1 names them 'lin{k}.model.1.weight'; some dumps drop the
    # 'lin' prefix structure - accept both.
    for key in (f'lin{k}.model.1.weight', f'lins.{k}.model.1.weight'):
      if key in lpips_sd:
        w = np.asarray(lpips_sd[key], np.float32)
        break
    else:
      raise KeyError(f'no linear-head weight for tap {k} in lpips dict '
                     f'(keys: {sorted(lpips_sd)[:8]}...)')
    if w.shape != (1, c, 1, 1):
      raise ValueError(f'lin{k} expected (1,{c},1,1), got {w.shape}')
    arrays[f'lin{k}_weight'] = w
  return arrays


def _to_numpy_dict(sd):
  return {k: v.detach().cpu().numpy() if hasattr(v, 'detach') else v
          for k, v in sd.items()}


def main():
  p = argparse.ArgumentParser()
  p.add_argument('out', nargs='?', default='vgg_lpips.npz')
  p.add_argument('--vgg16', help='local torchvision vgg16 .pth state dict')
  p.add_argument('--lpips', help='local lpips v0.1 vgg.pth linear heads')
  args = p.parse_args()

  if args.vgg16 and args.lpips:
    import torch
    vgg_sd = _to_numpy_dict(torch.load(args.vgg16, map_location='cpu',
                                       weights_only=True))
    lpips_sd = _to_numpy_dict(torch.load(args.lpips, map_location='cpu',
                                         weights_only=True))
  else:
    import lpips as lpips_lib  # pip install lpips
    import torchvision
    vgg_sd = _to_numpy_dict(
        torchvision.models.vgg16(weights='IMAGENET1K_V1').state_dict())
    model = lpips_lib.LPIPS(net='vgg')
    lpips_sd = {f'lin{k}.model.1.weight': lin.model[-1].weight.detach().numpy()
                for k, lin in enumerate(model.lins)}

  arrays = from_state_dicts(vgg_sd, lpips_sd)
  np.savez(args.out, **arrays)
  print(f'wrote {len(arrays)} arrays to {args.out}')


if __name__ == '__main__':
  main()
