"""Golden-value regression pins: fixed seed + fixed rays -> frozen outputs.

These catch unintended numerical drift during refactors (sampling, IPE, IDE,
compositing, init). Values generated on CPU with float32 matmuls; tolerances
leave room for benign cross-version fusion differences, not semantic change.
"""

import numpy as np

from tests.test_model import _MIPNERF_FLAGS, _REFNERF_FLAGS, _build

_GOLDEN = {
    'refnerf': {
        'rgb0': [0.7588196992874146, 0.7735222578048706, 0.7645708322525024],
        'acc_sum': 3.587327003479004,
        'rgb_mean': 0.7656375765800476,
    },
    'mipnerf': {
        'rgb0': [0.5727005004882812, 0.5559054613113403, 0.5268021821975708],
        'acc_sum': 3.587327003479004,
        'rgb_mean': 0.5518026947975159,
    },
}


def _forward(flags):
  model, params, rays = _build(flags)
  renders, _ = model.apply({'params': params}, rays, train_frac=0.5,
                           compute_extras=False, train=True)
  return np.asarray(renders[-1]['rgb']), np.asarray(renders[-1]['acc'])


def test_golden_refnerf():
  rgb, acc = _forward(_REFNERF_FLAGS)
  g = _GOLDEN['refnerf']
  np.testing.assert_allclose(rgb[0], g['rgb0'], atol=1e-3)
  np.testing.assert_allclose(acc.sum(), g['acc_sum'], atol=1e-3)
  np.testing.assert_allclose(rgb.mean(), g['rgb_mean'], atol=1e-3)


def test_golden_mipnerf():
  rgb, acc = _forward(_MIPNERF_FLAGS)
  g = _GOLDEN['mipnerf']
  np.testing.assert_allclose(rgb[0], g['rgb0'], atol=1e-3)
  np.testing.assert_allclose(acc.sum(), g['acc_sum'], atol=1e-3)
  np.testing.assert_allclose(rgb.mean(), g['rgb_mean'], atol=1e-3)
