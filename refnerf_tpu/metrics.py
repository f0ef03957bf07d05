"""Image-quality metric harness (PSNR / SSIM / optional LPIPS).

Parity surface with the reference MetricHarness (internal/image.py:130-156).
PSNR/SSIM are this framework's own jnp implementations. LPIPS needs
pretrained VGG16 features: when a weights file is available (npz; see
LPIPS_WEIGHTS_ENV) a Flax VGG16-LPIPS evaluates on device, otherwise LPIPS is
skipped gracefully (this environment has no network access to fetch weights).
"""

from __future__ import annotations

import os
import warnings
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from refnerf_tpu.ops import image as image_ops

LPIPS_WEIGHTS_ENV = 'REFNERF_TPU_LPIPS_WEIGHTS'

# Warn once per process: MetricHarness is constructed per eval/val call site
# and repeating the missing-LPIPS-weights warning spams logs/test output.
_LPIPS_WARNED = [False]

_IMAGENET_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)
_IMAGENET_STD = np.array([0.458, 0.448, 0.450], np.float32)


class VGGLPIPS:
  """LPIPS(VGG) from a weights archive.

  Expects an .npz containing VGG16 conv kernels/biases named
  `features_{i}_weight` / `features_{i}_bias` (torchvision layer indexing,
  OIHW) and LPIPS linear head weights `lin{k}_weight` [1, C, 1, 1].
  """

  def __init__(self, weights_path: str):
    data = np.load(weights_path)
    # torchvision VGG16 conv layer indices; LPIPS taps the post-relu output
    # of the last conv in each block (relu1_2/2_2/3_3/4_3/5_3).
    self.conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    self.block_end_convs = {2, 7, 14, 21, 28}
    # Device-resident, pre-transposed weights + ONE jitted distance program:
    # re-uploading ~55 MB of kernels per frame and dispatching eagerly would
    # serialize the eval loop's host pipeline.
    self.params = {}
    for cid in self.conv_ids:
      self.params[f'w{cid}'] = jnp.transpose(  # OIHW -> HWIO
          jnp.asarray(data[f'features_{cid}_weight']), (2, 3, 1, 0))
      self.params[f'b{cid}'] = jnp.asarray(data[f'features_{cid}_bias'])
    for k in range(5):
      self.params[f'lin{k}'] = jnp.asarray(
          data[f'lin{k}_weight'])[:, :, 0, 0].T  # [C, 1]
    self._dist = jax.jit(self._distance)

  def _features(self, params, x):
    """x: [H, W, 3] in [-1, 1] -> list of 5 unit-normalized feature maps."""
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    x = x[None]  # NHWC
    feats = []
    for conv_id in self.conv_ids:
      x = jax.lax.conv_general_dilated(
          x, params[f'w{conv_id}'], (1, 1), 'SAME',
          dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
      x = jax.nn.relu(x + params[f'b{conv_id}'])
      if conv_id in self.block_end_convs:
        # lpips.normalize_tensor semantics: eps added to the norm, not the
        # squared sum (matters only at exactly-zero features).
        norm = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True))
        feats.append(x / (norm + 1e-10))
        if len(feats) < 5:
          x = jax.lax.reduce_window(
              x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')
    return feats

  def _distance(self, params, img0, img1):
    f0 = self._features(params, img0 * 2 - 1)
    f1 = self._features(params, img1 * 2 - 1)
    total = 0.0
    for k, (a, b) in enumerate(zip(f0, f1)):
      diff = (a - b) ** 2
      weighted = jnp.einsum('nhwc,co->nhwo', diff, params[f'lin{k}'])
      total = total + jnp.mean(weighted)
    return total

  def __call__(self, img0, img1) -> float:
    """img0/img1: [H, W, 3] in [0, 1]."""
    return float(self._dist(self.params,
                            jnp.asarray(img0, jnp.float32),
                            jnp.asarray(img1, jnp.float32)))


class MetricHarness:
  """PSNR + SSIM (+ LPIPS when weights are provided)."""

  def __init__(self, compute_lpips: bool = False,
               lpips_weights: Optional[str] = None):
    self.ssim_fn = image_ops.ssim
    self.lpips_fn = None
    if compute_lpips:
      path = lpips_weights or os.environ.get(LPIPS_WEIGHTS_ENV)
      if path and os.path.exists(path):
        self.lpips_fn = VGGLPIPS(path)
      elif not _LPIPS_WARNED[0]:
        _LPIPS_WARNED[0] = True
        warnings.warn(
            'LPIPS requested but no weights found '
            f'(path={path!r}; set ${LPIPS_WEIGHTS_ENV}). Eval metrics will '
            'NOT include lpips. Provision the .npz with '
            'tools/convert_lpips_weights.py (see README "LPIPS weights").',
            stacklevel=2)

  def __call__(self, rgb_pred, rgb_gt,
               name_fn: Callable[[str], str] = lambda s: s) -> Dict[str, float]:
    rgb_pred = jnp.asarray(rgb_pred, jnp.float32)
    rgb_gt = jnp.asarray(rgb_gt, jnp.float32)
    psnr = float(image_ops.mse_to_psnr(jnp.mean((rgb_pred - rgb_gt) ** 2)))
    ssim = float(self.ssim_fn(rgb_pred, rgb_gt))
    out = {name_fn('psnr'): psnr, name_fn('ssim'): ssim}
    if self.lpips_fn is not None:
      out[name_fn('lpips')] = self.lpips_fn(rgb_pred, rgb_gt)
    return out
