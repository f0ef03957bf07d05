"""Image/file IO helpers (ref: internal/utils.py:133-189)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def load_img(pth: str) -> np.ndarray:
  """Load an image as float32 (no scaling)."""
  with open(pth, 'rb') as f:
    return np.array(Image.open(f), dtype=np.float32)


def save_img_u8(img, pth, mask=None):
  """Save an image in [0, 1] as a uint8 PNG (optional acc-mask overlay)."""
  with open(pth, 'wb') as f:
    img_np = (np.clip(np.nan_to_num(np.asarray(img)), 0.0, 1.0)
              * 255).astype(np.uint8).squeeze()
    if mask is not None:
      mask_np = np.nan_to_num(np.asarray(mask)).astype(np.float32).squeeze()
      rng = mask_np.max() - mask_np.min()
      mask_np = 255 * (mask_np - mask_np.min()) / (rng if rng else 1.0)
      img_np = (255 - mask_np) + img_np
      rng2 = img_np.max() - img_np.min()
      img_np = np.array(255 * (img_np - img_np.min()) / (rng2 if rng2 else 1.0),
                        dtype=np.uint8)
    Image.fromarray(img_np).save(f, 'PNG')


def save_img_f32(depthmap, pth):
  """Save a float map (e.g. depth) as a 32-bit TIFF."""
  with open(pth, 'wb') as f:
    Image.fromarray(
        np.nan_to_num(np.asarray(depthmap)).astype(np.float32)).save(f, 'TIFF')


def makedirs(pth):
  os.makedirs(pth, exist_ok=True)
