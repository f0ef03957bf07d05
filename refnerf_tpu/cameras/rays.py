"""Core ray/pixel/batch containers as registered JAX pytrees.

Unlike the reference's mutable torch dataclasses (internal/utils.py:30-117),
these are immutable `flax.struct` pytrees: they flow through jit/vmap/shard_map
and can be sharded along their leading (ray) axis with a NamedSharding.
"""

from __future__ import annotations

import enum
from typing import Any, Optional

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class Pixels:
  """Pixel coordinates plus per-ray metadata, before ray casting.

  The train pipeline ships Pixels host->device and casts rays *inside* the
  jitted train step (the reference's optional `cast_rays_in_train_step` fast
  path, made the default here).
  """
  pix_x_int: Any
  pix_y_int: Any
  lossmult: Any
  near: Any
  far: Any
  cam_idx: Any

  @property
  def shape(self):
    return self.pix_x_int.shape


@flax.struct.dataclass
class Rays:
  """A bundle of rays; all leaves share leading dims (the ray axis)."""
  origins: Any
  directions: Any
  viewdirs: Any
  radii: Any
  imageplane: Any
  lossmult: Any
  near: Any
  far: Any
  cam_idx: Any

  @property
  def shape(self):
    return self.origins.shape[:-1]

  def reshape(self, *dims):
    """Reshape leading dims of every leaf, preserving each trailing dim."""
    import jax
    return jax.tree_util.tree_map(
        lambda x: x.reshape(*dims, x.shape[-1]) if hasattr(x, 'reshape') else x,
        self)

  def __getitem__(self, s):
    import jax
    return jax.tree_util.tree_map(lambda x: x[s], self)


@flax.struct.dataclass
class Batch:
  """A data batch for training or evaluation."""
  rays: Any                       # Rays or Pixels
  rgb: Optional[Any] = None
  disps: Optional[Any] = None
  normals: Optional[Any] = None
  alphas: Optional[Any] = None


class DataSplit(enum.Enum):
  TRAIN = 'train'
  VAL = 'val'
  TEST = 'test'


class BatchingMethod(enum.Enum):
  ALL_IMAGES = 'all_images'
  SINGLE_IMAGE = 'single_image'


def dummy_rays(n: int = 1, xnp=jnp) -> Rays:
  """A tiny Rays bundle used to initialize model parameters."""
  def data_fn(d):
    return xnp.zeros((n, d), dtype=xnp.float32)
  return Rays(
      origins=data_fn(3),
      directions=data_fn(3),
      viewdirs=data_fn(3),
      radii=data_fn(1),
      imageplane=data_fn(2),
      lossmult=data_fn(1),
      near=data_fn(1),
      far=data_fn(1) + 1.0,
      cam_idx=xnp.zeros((n, 1), dtype=xnp.int32))


def pad_rays_to(rays: Rays, n: int) -> tuple[Rays, int]:
  """Pad a ray bundle along axis 0 to exactly `n` rays (static shapes).

  Returns (padded_rays, padding). Padded rays repeat the last valid ray so
  they stay numerically well-behaved; callers slice outputs back by padding.
  """
  import jax
  count = rays.origins.shape[0]
  padding = n - count
  if padding < 0:
    raise ValueError(f'Cannot pad {count} rays down to {n}')
  if padding == 0:
    return rays, 0
  pad_fn = lambda x: np.concatenate(
      [x, np.repeat(np.asarray(x[-1:]), padding, axis=0)], axis=0)
  return jax.tree_util.tree_map(pad_fn, rays), padding
