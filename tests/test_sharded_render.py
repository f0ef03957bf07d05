"""Full-image rendering with chunks sharded across the mesh must match the
single-device path exactly."""

import jax
import numpy as np

from refnerf_tpu import configs as configs_lib
from refnerf_tpu.models import construct, renderer
from refnerf_tpu.parallel import mesh as mesh_lib
from tests.test_model import _TINY_MODEL, _REFNERF_FLAGS
from tests.test_renderer_metrics import _image_rays


def test_sharded_render_matches_single_device():
  config, gin = configs_lib.parse(
      None, [_TINY_MODEL + _REFNERF_FLAGS, 'Config.render_chunk_size = 32',
             'Config.vis_num_rays = 4'])
  model = construct.construct_model(config, gin)
  params = construct.init_params(jax.random.PRNGKey(0), model)
  render_fn = renderer.make_render_fn(model, params)
  rays = _image_rays(8, 8)

  single = renderer.render_image(render_fn, rays, config, mesh=None)
  mesh = mesh_lib.create_mesh()
  sharded = renderer.render_image(render_fn, rays, config, mesh=mesh)

  np.testing.assert_allclose(sharded['rgb'], single['rgb'], atol=1e-5)
  np.testing.assert_allclose(sharded['distance_mean'],
                             single['distance_mean'], atol=1e-5)
  np.testing.assert_allclose(sharded['acc'], single['acc'], atol=1e-5)
