"""Convert torchvision VGG16 + lpips linear heads into the .npz this
framework's LPIPS harness consumes (refnerf_tpu/metrics.py::VGGLPIPS).

Run this on a machine WITH network access (TPU pods are zero-egress):

    python tools/convert_lpips_weights.py /path/to/vgg_lpips.npz

then ship the file and set REFNERF_TPU_LPIPS_WEIGHTS=/path/to/vgg_lpips.npz.
Requires `torchvision` and `lpips` (not dependencies of this framework).
"""

import sys

import numpy as np


def main(out_path):
  import lpips as lpips_lib          # pip install lpips
  import torchvision

  model = lpips_lib.LPIPS(net='vgg')
  vgg = torchvision.models.vgg16(weights='IMAGENET1K_V1')

  arrays = {}
  for idx, layer in enumerate(vgg.features):
    if hasattr(layer, 'weight') and layer.weight is not None:
      arrays[f'features_{idx}_weight'] = layer.weight.detach().numpy()
      arrays[f'features_{idx}_bias'] = layer.bias.detach().numpy()

  for k, lin in enumerate(model.lins):
    arrays[f'lin{k}_weight'] = lin.model[-1].weight.detach().numpy()

  np.savez(out_path, **arrays)
  print(f'wrote {len(arrays)} arrays to {out_path}')


if __name__ == '__main__':
  main(sys.argv[1] if len(sys.argv) > 1 else 'vgg_lpips.npz')
