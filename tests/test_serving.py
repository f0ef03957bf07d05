"""Serving export roundtrip: weight-embedded StableHLO artifact == model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refnerf_tpu import configs as configs_lib
from refnerf_tpu import serving
from refnerf_tpu.cameras import rays as rays_lib
from refnerf_tpu.models import construct

_TINY = """
Model.num_levels = 2
Model.single_mlp = True
Model.num_prop_samples = 4
Model.num_nerf_samples = 4
Model.anneal_slope = 0.
Model.dilation_bias = 0.
Model.dilation_multiplier = 0.
NerfMLP.net_depth = 2
NerfMLP.net_width = 8
NerfMLP.net_depth_viewdirs = 1
NerfMLP.net_width_viewdirs = 8
NerfMLP.bottleneck_width = 4
NerfMLP.max_deg_point = 3
NerfMLP.deg_view = 2
NerfMLP.basis_shape = 'octahedron'
NerfMLP.basis_subdivisions = 1
NerfMLP.fused_trunk = 'off'
"""

CHUNK = 8


def _model_and_params():
  config, gin = configs_lib.parse(None, [_TINY])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  return model, params


def _rays(n, seed=3):
  rng = np.random.RandomState(seed)
  d = rng.randn(n, 3).astype(np.float32)
  return rays_lib.dummy_rays(n).replace(
      origins=jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.1),
      directions=jnp.asarray(d),
      viewdirs=jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True)),
      radii=jnp.full((n, 1), 0.01),
      near=jnp.full((n, 1), 0.5),
      far=jnp.full((n, 1), 3.0))


def test_roundtrip_matches_model(tmp_path):
  model, params = _model_and_params()
  path = str(tmp_path / 'scene.rnsrv')
  meta = serving.export_serving(model, params, path, chunk=CHUNK,
                                platforms=('cpu',))
  assert meta['chunk'] == CHUNK and 'rgb' in meta['buffers']

  served = serving.load_serving(path)
  assert served.meta == meta
  rays = _rays(CHUNK)
  got = served(rays)
  want = serving.serving_render_fn(model, params)(rays)
  assert set(got) == set(want)
  for k in want:
    np.testing.assert_allclose(got[k], want[k], atol=1e-6, rtol=1e-5,
                               err_msg=k)


def test_serve_image_pads_and_reshapes(tmp_path):
  model, params = _model_and_params()
  path = str(tmp_path / 'scene.rnsrv')
  serving.export_serving(model, params, path, chunk=CHUNK,
                         platforms=('cpu',))
  served = serving.load_serving(path)

  h, w = 3, 5  # 15 rays: not a multiple of the chunk -> padding path
  flat = _rays(h * w, seed=4)
  frame_rays = jax.tree_util.tree_map(
      lambda x: x.reshape((h, w) + x.shape[1:]), flat)
  out = served.serve_image(frame_rays)
  assert out['rgb'].shape == (h, w, 3)
  want = serving.serving_render_fn(model, params)(
      rays_lib.pad_rays_to(flat, 2 * CHUNK)[0])
  np.testing.assert_allclose(out['rgb'].reshape(-1, 3),
                             np.asarray(want['rgb'])[:h * w], atol=1e-6,
                             rtol=1e-5)


def test_wrong_chunk_size_is_loud(tmp_path):
  model, params = _model_and_params()
  path = str(tmp_path / 'scene.rnsrv')
  serving.export_serving(model, params, path, chunk=CHUNK,
                         platforms=('cpu',))
  served = serving.load_serving(path)
  with pytest.raises(ValueError, match='exactly'):
    served(_rays(CHUNK + 1))


def test_bad_magic_is_loud(tmp_path):
  path = tmp_path / 'not_an_artifact.rnsrv'
  path.write_bytes(b'GARBAGE!' + b'\x00' * 16)
  with pytest.raises(ValueError, match='bad magic'):
    serving.load_serving(str(path))


def test_extras_export_carries_buffers(tmp_path):
  model, params = _model_and_params()
  path = str(tmp_path / 'scene.rnsrv')
  meta = serving.export_serving(model, params, path, chunk=CHUNK,
                                platforms=('cpu',), compute_extras=True)
  assert 'distance_mean' in meta['buffers']
  served = serving.load_serving(path)
  got = served(_rays(CHUNK))
  assert set(got) == set(meta['buffers'])


def test_metadata_near_far_and_truncation_errors(tmp_path):
  """near/far land in the artifact metadata (serving hosts default ray
  bounds from them), and every malformed-artifact failure is a ValueError."""
  model, params = _model_and_params()
  path = str(tmp_path / 'scene.rnsrv')
  meta = serving.export_serving(model, params, path, chunk=CHUNK,
                                platforms=('cpu',), near=2.0, far=6.0)
  assert meta['near'] == 2.0 and meta['far'] == 6.0
  assert serving.load_serving(path).meta['far'] == 6.0

  data = open(path, 'rb').read()
  hlen = int.from_bytes(data[8:12], 'little')
  cases = {
      'no metadata length': data[:10],
      'metadata:': data[:12 + hlen // 2],
      'corrupt metadata': data[:8] + data[8:12] + b'x' * hlen + data[
          12 + hlen:],
      'no program payload': data[:12 + hlen],
  }
  for msg, blob in cases.items():
    p = tmp_path / 'bad.rnsrv'
    p.write_bytes(blob)
    with pytest.raises(ValueError, match=msg.split(':')[0]):
      serving.load_serving(str(p))
