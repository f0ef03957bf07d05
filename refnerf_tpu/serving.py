"""Serving export: single-file, weight-embedded StableHLO render programs.

The reference has no deployment story beyond re-running eval.py with a
checkpoint directory (reference eval.py:47-86). For production serving this
module exports the fixed-chunk render program through `jax.export`:

- **One artifact, zero Python deps at load time** beyond jax + this module:
  the trained parameters are baked into the program as constants, so the
  serving host needs no orbax checkpoint, no gin config, and no flax module
  tree - just the `.rnsrv` file.
- **Multi-platform**: one export can carry `cpu` and `tpu` lowerings; the
  right one is picked at call time from the local backend.
- **Static shapes**: the program takes exactly `chunk` rays (the same
  fixed-chunk contract as models/renderer.py), so the serving process
  compiles once and streams chunks; `serve_image` pads/slices full frames
  onto it.

Portability note: the exported program uses the plain XLA path
(`fused_trunk='off'` is forced at export) - Pallas/Mosaic custom calls are
not stable across serialization boundaries, and the export must load on
hosts and TPU generations other than the builder's. For peak single-host
throughput keep serving in-process (bench.py BENCH_FWD=1) where the fused
kernels apply.

File format: 8-byte magic b'RNSRV001' + 4-byte little-endian JSON-metadata
length + metadata JSON + the jax.export serialization.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Dict, Sequence

import jax
import numpy as np
from jax import export as jax_export

from refnerf_tpu.cameras import rays as rays_lib

_MAGIC = b'RNSRV001'


def _register_serialization():
  # jax.export must be taught the Rays pytree (auxdata is empty - the
  # flax.struct dataclass flattens to its 9 array fields in order).
  try:
    jax_export.register_pytree_node_serialization(
        rays_lib.Rays,
        serialized_name='refnerf_tpu.cameras.rays.Rays',
        serialize_auxdata=lambda aux: b'',
        deserialize_auxdata=lambda b: ())
  except ValueError:
    pass  # already registered (repeat import under pytest)


_register_serialization()


def serving_render_fn(model, params, compute_extras: bool = False):
  """The chunk program: Rays -> dict of per-ray buffers (final level only).

  `ray_`-prefixed vis bundles are dropped (they subsample rows and are
  meaningless for serving); everything else in the final level's rendering
  dict (rgb, distance*, acc, normals, ...) passes through.
  """

  def fn(rays: rays_lib.Rays) -> Dict[str, Any]:
    renderings, _ = model.apply(
        {'params': params}, rays, train_frac=1.0,
        compute_extras=compute_extras, train=False)
    return {k: v for k, v in renderings[-1].items()
            if not k.startswith('ray_')}

  return fn


def _ray_specs(chunk: int) -> rays_lib.Rays:
  dummy = rays_lib.dummy_rays(chunk)
  return jax.tree_util.tree_map(
      lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), dummy)


def export_serving(model, params, path: str, chunk: int = 8192,
                   platforms: Sequence[str] = ('cpu', 'tpu'),
                   compute_extras: bool = False,
                   near: float = None, far: float = None) -> Dict[str, Any]:
  """Export the render program with weights embedded; returns the metadata.

  Args:
    model: constructed (unbound) Model whose MLPs force `fused_trunk='off'`
      (tools/export_serving.py does this by parsing the extra gin line
      "NerfMLP.fused_trunk = 'off'" before construct_model).
    params: trained parameter pytree (device or host arrays).
    path: output file.
    chunk: rays per call - the static chunk size of the program.
    platforms: lowering platforms baked into the artifact.
    compute_extras: include the full extras buffers (distance stats,
      normals, diffuse/specular) instead of just rgb/distance/acc.
    near/far: the scene's ray bounds (Config.near/far), recorded in the
      metadata so serving hosts can default them per artifact.
  """
  fn = serving_render_fn(model, params, compute_extras=compute_extras)
  exported = jax_export.export(
      jax.jit(fn), platforms=list(platforms))(_ray_specs(chunk))
  # Buffer names/shapes come from the export itself - no second trace.
  out_info = jax.tree_util.tree_unflatten(
      exported.out_tree, list(exported.out_avals))
  meta = {
      'chunk': chunk,
      'platforms': list(platforms),
      'compute_extras': bool(compute_extras),
      'buffers': {k: [list(v.shape), str(v.dtype)]
                  for k, v in sorted(out_info.items())},
  }
  if near is not None:
    meta['near'] = float(near)
  if far is not None:
    meta['far'] = float(far)
  blob = exported.serialize()
  header = json.dumps(meta).encode('utf-8')
  with open(path, 'wb') as f:
    f.write(_MAGIC)
    f.write(struct.pack('<I', len(header)))
    f.write(header)
    f.write(blob)
  return meta


class ServingModel:
  """A loaded serving artifact: __call__ renders one fixed-size chunk."""

  def __init__(self, exported, meta: Dict[str, Any]):
    self._exported = exported
    self.meta = meta
    self.chunk = int(meta['chunk'])

  def __call__(self, rays: rays_lib.Rays) -> Dict[str, Any]:
    if rays.origins.shape[0] != self.chunk:
      raise ValueError(
          f'this artifact renders exactly {self.chunk} rays per call, '
          f'got {rays.origins.shape[0]}; use serve_image for frames.')
    return self._exported.call(rays)

  def serve_image(self, rays: rays_lib.Rays) -> Dict[str, Any]:
    """Render a full [H, W] frame by padding onto the chunk program."""
    height, width = rays.origins.shape[:2]
    num_rays = height * width
    flat = rays.reshape(num_rays)
    padded_n = ((num_rays + self.chunk - 1) // self.chunk) * self.chunk
    flat, _ = rays_lib.pad_rays_to(flat, padded_n)
    outs = []
    for i in range(0, padded_n, self.chunk):
      chunk_rays = jax.tree_util.tree_map(lambda x: x[i:i + self.chunk],
                                          flat)
      outs.append(self(chunk_rays))
    outs = jax.device_get(outs)
    merged = {}
    for k in outs[0]:
      v = np.concatenate([o[k] for o in outs], axis=0)[:num_rays]
      merged[k] = v.reshape((height, width) + v.shape[1:])
    return merged


def load_serving(path: str) -> ServingModel:
  """Load a .rnsrv artifact written by export_serving.

  Raises ValueError for anything malformed (bad magic, truncation,
  corrupt metadata) - one error contract for all broken artifacts.
  """
  with open(path, 'rb') as f:
    magic = f.read(len(_MAGIC))
    if magic != _MAGIC:
      raise ValueError(f'{path} is not a refnerf_tpu serving artifact '
                       f'(bad magic {magic!r})')
    raw_len = f.read(4)
    if len(raw_len) != 4:
      raise ValueError(f'{path} is truncated (no metadata length)')
    (hlen,) = struct.unpack('<I', raw_len)
    header = f.read(hlen)
    if len(header) != hlen:
      raise ValueError(
          f'{path} is truncated (metadata: {len(header)}/{hlen} bytes)')
    try:
      meta = json.loads(header.decode('utf-8'))
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
      raise ValueError(f'{path} has corrupt metadata: {e}') from e
    blob = f.read()
  if not blob:
    raise ValueError(f'{path} is truncated (no program payload)')
  return ServingModel(jax_export.deserialize(blob), meta)
