"""LPIPS harness structural test with synthetic VGG weights (the real
pretrained weights require network access; tools/convert_lpips_weights.py
produces them)."""

import os

import numpy as np

from refnerf_tpu import metrics as metrics_lib


def _fake_weights(path):
  rng = np.random.RandomState(0)
  arrays = {}
  conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
  chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
  in_c = 3
  for cid, out_c in zip(conv_ids, chans):
    arrays[f'features_{cid}_weight'] = (
        rng.randn(out_c, in_c, 3, 3).astype(np.float32) * 0.05)
    arrays[f'features_{cid}_bias'] = np.zeros(out_c, np.float32)
    in_c = out_c
  for k, c in enumerate([64, 128, 256, 512, 512]):
    arrays[f'lin{k}_weight'] = np.abs(
        rng.randn(1, c, 1, 1).astype(np.float32)) * 0.01
  np.savez(path, **arrays)
  return path


def test_lpips_runs_and_orders(tmp_path):
  path = _fake_weights(str(tmp_path / 'w.npz'))
  harness = metrics_lib.MetricHarness(compute_lpips=True, lpips_weights=path)
  assert harness.lpips_fn is not None
  rng = np.random.RandomState(1)
  img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
  noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(
      np.float32)
  m_same = harness(img, img)
  m_noisy = harness(noisy, img)
  assert 'lpips' in m_same
  # Identical images -> zero distance; noise -> positive distance.
  assert abs(m_same['lpips']) < 1e-6
  assert m_noisy['lpips'] > 0


def test_lpips_gracefully_absent():
  harness = metrics_lib.MetricHarness(compute_lpips=True,
                                      lpips_weights='/nonexistent.npz')
  m = harness(np.zeros((16, 16, 3), np.float32),
              np.zeros((16, 16, 3), np.float32))
  assert 'lpips' not in m
