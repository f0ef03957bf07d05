"""Full-image rendering: chunked, jit-once, mesh-shardable.

Replaces the reference's eager per-chunk loop (models.py:763-825). Rays are
padded to a whole number of fixed-size chunks so ONE compiled program serves
every chunk (static shapes); chunks can additionally be sharded across the
device mesh, tiling a frame over the slice.
"""

from __future__ import annotations

import collections
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from refnerf_tpu.cameras import rays as rays_lib
from refnerf_tpu.parallel import mesh as mesh_lib


def render_image(render_fn: Callable, rays: rays_lib.Rays, config,
                 rng: Optional[Any] = None, mesh=None,
                 verbose: bool = False, fetch: bool = True):
  """Render all pixels of an image in fixed-size ray chunks.

  Args:
    render_fn: (rays) -> (renderings, ray_history); typically a jitted
      partial of model.apply at a given train_frac.
    rays: a Rays pytree shaped [H, W, ...].
    config: Config (render_chunk_size, vis_num_rays).
    rng: optional key for the deterministic vis-bundle subsample.
    mesh: optional device mesh; chunks are sharded along the ray axis.
    fetch: when False, return a zero-arg `finish()` closure instead of the
      buffers. All device work is already dispatched (async) on return;
      finish() blocks on the device->host fetch and does the host-side
      merge. Lets callers move the multi-10s-of-MB frame fetch off the
      render critical path (e.g. onto a _FramePipeline worker) so the
      device starts the next frame immediately.

  Returns:
    dict of [H, W, ...] buffers + 'ray_' bundles (lists over levels), or
    a finish() closure returning that dict when fetch=False.
  """
  height, width = rays.origins.shape[:2]
  num_rays = height * width
  rays = rays.reshape(num_rays)

  chunk = config.render_chunk_size
  padded = ((num_rays + chunk - 1) // chunk) * chunk
  padding = padded - num_rays
  if padding > 0:
    pad_fn = lambda x: jnp.concatenate(
        [x, jnp.repeat(x[-1:], padding, axis=0)], axis=0)
    rays = jax.tree_util.tree_map(pad_fn, rays)

  sharding = mesh_lib.batch_sharding(mesh) if mesh is not None else None

  chunks = []
  for idx0 in range(0, padded, chunk):
    chunk_rays = jax.tree_util.tree_map(lambda x: x[idx0:idx0 + chunk], rays)
    if sharding is not None:
      chunk_rays = jax.tree_util.tree_map(
          lambda x: jax.device_put(x, sharding), chunk_rays)
    chunk_renderings, _ = render_fn(chunk_rays)

    # Keep the final level's 2D buffers, plus per-level ray bundles. The
    # device_get happens ONCE after the loop: per-chunk fetches would
    # synchronize and serialize chunk execution.
    chunk_rendering = dict(chunk_renderings[-1])
    for k in chunk_renderings[0]:
      if k.startswith('ray_'):
        chunk_rendering[k] = [r[k] for r in chunk_renderings]
    chunks.append(chunk_rendering)

  def finish():
    fetched = jax.device_get(chunks)

    # Merge chunks (concatenate along the ray axis).
    rendering = {}
    for k in fetched[0]:
      if isinstance(fetched[0][k], list):
        rendering[k] = [
            np.concatenate([c[k][i] for c in fetched])
            for i in range(len(fetched[0][k]))]
      else:
        rendering[k] = np.concatenate([c[k] for c in fetched])

    for k, z in rendering.items():
      if not k.startswith('ray_'):
        z = z[:num_rays]  # strip chunk padding
        rendering[k] = z.reshape((height, width) + z.shape[1:])

    # Deterministically subsample a fresh vis ray bundle from the
    # concatenation.
    keys = [k for k in rendering if k.startswith('ray_')]
    if keys:
      num_bundle_rays = rendering[keys[0]][0].shape[0]
      if rng is None:
        seed = 0
      else:
        # Works for both raw uint32 PRNGKeys and new-style typed keys.
        seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1])
      perm_rng = np.random.default_rng(seed)
      ray_idx = perm_rng.permutation(num_bundle_rays)[:config.vis_num_rays]
      for k in keys:
        rendering[k] = [r[ray_idx] for r in rendering[k]]

    return rendering

  return finish() if fetch else finish


# One jitted render program per (model, compute_extras): params and
# train_frac are traced ARGUMENTS, so periodic validation during training
# (new params + new train_frac each call) reuses the compiled executable
# instead of re-jitting - and the weights are not baked into the program as
# constants. Keyed by id(model); the value strongly holds the model, which
# pins the id against reuse for as long as the entry lives. Bounded LRU
# (training holds one model; eval/render at most a couple), so stale
# models/executables are evicted instead of accumulating for the process
# lifetime. An evicted model whose id is later reused simply recompiles.
_RENDER_PROGRAMS: "collections.OrderedDict[Any, Any]" = (
    collections.OrderedDict())
_RENDER_PROGRAMS_MAX = 4


def clear_render_programs() -> None:
  """Drop every cached render executable (and its pinned model)."""
  _RENDER_PROGRAMS.clear()


def make_render_fn(model, params, train_frac: float = 1.0,
                   compute_extras: bool = True):
  """A jitted full-extras forward at fixed train_frac (eval/render use)."""
  key = (id(model), bool(compute_extras))
  if key not in _RENDER_PROGRAMS:
    def apply_fn(params, rays, train_frac, model=model,
                 compute_extras=compute_extras):
      return model.apply({'params': params}, rays, train_frac=train_frac,
                         compute_extras=compute_extras, train=False)
    _RENDER_PROGRAMS[key] = (model, jax.jit(apply_fn))
    while len(_RENDER_PROGRAMS) > _RENDER_PROGRAMS_MAX:
      _RENDER_PROGRAMS.popitem(last=False)
  else:
    _RENDER_PROGRAMS.move_to_end(key)
  _, jitted = _RENDER_PROGRAMS[key]
  train_frac = jnp.float32(train_frac)
  return lambda rays: jitted(params, rays, train_frac)
