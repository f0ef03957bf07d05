"""HTTP serving host (tools/serve_http.py): endpoints, padding, parity
with a direct artifact call, and error behavior."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from tests.test_serving import CHUNK, _model_and_params, _rays
from refnerf_tpu import serving


@pytest.fixture(scope='module')
def server(tmp_path_factory):
  import sys, os
  sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), 'tools'))
  import serve_http

  path = str(tmp_path_factory.mktemp('srv') / 'scene.rnsrv')
  model, params = _model_and_params()
  serving.export_serving(model, params, path, chunk=CHUNK,
                         platforms=('cpu',))
  srv = serve_http.make_server(path, port=0)
  t = threading.Thread(target=srv.serve_forever, daemon=True)
  t.start()
  yield f'http://127.0.0.1:{srv.server_port}', path
  srv.shutdown()


def _get(url):
  with urllib.request.urlopen(url, timeout=60) as r:
    return json.loads(r.read())


def _post(url, payload):
  req = urllib.request.Request(
      url, data=json.dumps(payload).encode(), method='POST',
      headers={'Content-Type': 'application/json'})
  with urllib.request.urlopen(req, timeout=120) as r:
    return json.loads(r.read())


def test_health_and_meta(server):
  base, _ = server
  assert _get(base + '/health') == {'ok': True}
  meta = _get(base + '/meta')
  assert meta['chunk'] == CHUNK and 'rgb' in meta['buffers']


def test_render_matches_direct_call(server):
  base, path = server
  n = CHUNK + 3  # exercises the pad onto the fixed-chunk program
  rays = _rays(n)
  out = _post(base + '/render', {
      'origins': np.asarray(rays.origins).tolist(),
      'directions': np.asarray(rays.directions).tolist(),
      'viewdirs': np.asarray(rays.viewdirs).tolist(),
      'radii': 0.01, 'near': 0.5, 'far': 3.0,
  })
  rgb = np.asarray(out['rgb'], np.float32)
  assert rgb.shape == (n, 3)

  served = serving.load_serving(path)
  direct = served.serve_image(rays.reshape(n, 1))
  np.testing.assert_allclose(rgb, np.asarray(direct['rgb'])[:, 0],
                             rtol=1e-5, atol=1e-6)


def test_render_defaults_and_buffer_selection(server):
  base, _ = server
  rays = _rays(4, seed=9)
  out = _post(base + '/render', {
      'origins': np.asarray(rays.origins).tolist(),
      'directions': np.asarray(rays.directions).tolist(),
      'buffers': ['acc'],
  })  # viewdirs/radii/near/far all defaulted
  assert set(out) == {'acc'}
  assert np.isfinite(np.asarray(out['acc'], np.float32)).all()


def test_render_errors(server):
  base, _ = server
  with pytest.raises(urllib.error.HTTPError) as e:
    _post(base + '/render', {'origins': [[0, 0]], 'directions': [[0, 0]]})
  assert e.value.code == 400
  assert 'origins' in json.loads(e.value.read())['error']

  with pytest.raises(urllib.error.HTTPError) as e:
    _post(base + '/render', {
        'origins': [[0., 0., 0.]], 'directions': [[1., 0., 0.]],
        'buffers': ['nope']})
  assert e.value.code == 400

  with pytest.raises(urllib.error.HTTPError) as e:
    _get(base + '/nothere')
  assert e.value.code == 404
