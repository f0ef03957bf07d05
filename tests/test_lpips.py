"""LPIPS evaluator tests.

The real pretrained weights need a one-time provisioning step
(tools/convert_lpips_weights.py; no network in this environment), so these
tests validate everything *around* the weights: the full LPIPS(VGG) compute
pipeline is pinned against a torch reimplementation of the `lpips` package's
math (the implementation the reference evals with, internal/image.py:133-137)
on shared synthetic weights, and the converter's state-dict mapping is
round-tripped. With a correctly converted archive the evaluator therefore
reproduces the reference's LPIPS values.
"""

import warnings

import numpy as np
import pytest

from refnerf_tpu import metrics as metrics_lib

CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
CHANS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
BLOCK_END = {2, 7, 14, 21, 28}
LIN_CHANNELS = [64, 128, 256, 512, 512]


def _fake_params(seed=0):
  rng = np.random.RandomState(seed)
  arrays = {}
  in_c = 3
  for cid, out_c in zip(CONV_IDS, CHANS):
    arrays[f'features_{cid}_weight'] = (
        rng.randn(out_c, in_c, 3, 3).astype(np.float32) * 0.05)
    arrays[f'features_{cid}_bias'] = (
        rng.randn(out_c).astype(np.float32) * 0.02)
    in_c = out_c
  for k, c in enumerate(LIN_CHANNELS):
    arrays[f'lin{k}_weight'] = np.abs(
        rng.randn(1, c, 1, 1).astype(np.float32)) * 0.01
  return arrays


def _fake_weights(path, seed=0):
  np.savez(path, **_fake_params(seed))
  return path


def _torch_lpips(params, img0, img1):
  """The `lpips` package's LPIPS(VGG, spatial=False) pipeline, in torch.

  Mirrors lpips.LPIPS.forward: ScalingLayer with the published shift/scale
  constants, VGG16 features tapped post-relu at block ends with maxpool
  between blocks, normalize_tensor (eps added to the norm), squared diff,
  1x1 linear head, spatial average, sum over taps.
  """
  import torch
  import torch.nn.functional as F

  shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
  scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

  def feats(img):
    x = torch.from_numpy(np.transpose(img, (2, 0, 1))[None]) * 2 - 1
    x = (x - shift) / scale
    fs = []
    for cid in CONV_IDS:
      w = torch.from_numpy(params[f'features_{cid}_weight'])
      b = torch.from_numpy(params[f'features_{cid}_bias'])
      x = F.relu(F.conv2d(x, w, b, padding=1))
      if cid in BLOCK_END:
        norm = torch.sqrt((x ** 2).sum(1, keepdim=True))
        fs.append(x / (norm + 1e-10))
        if len(fs) < 5:
          x = F.max_pool2d(x, 2)
    return fs

  total = 0.0
  for k, (a, b) in enumerate(zip(feats(img0), feats(img1))):
    lin = torch.from_numpy(params[f'lin{k}_weight'])
    total = total + F.conv2d((a - b) ** 2, lin).mean(dim=(2, 3)).sum()
  return float(total)


def test_lpips_matches_torch_pipeline(tmp_path):
  """Same weights, same images -> our jax evaluator == the lpips-math oracle."""
  params = _fake_params(seed=2)
  path = str(tmp_path / 'w.npz')
  np.savez(path, **params)
  harness = metrics_lib.MetricHarness(compute_lpips=True, lpips_weights=path)
  rng = np.random.RandomState(3)
  img0 = rng.uniform(0, 1, (33, 47, 3)).astype(np.float32)  # odd sizes
  img1 = np.clip(img0 + rng.normal(0, 0.15, img0.shape), 0, 1).astype(
      np.float32)
  ours = harness(img0, img1)['lpips']
  oracle = _torch_lpips(params, img0, img1)
  np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-7)


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


def test_lpips_warns_when_weights_missing():
  metrics_lib._LPIPS_WARNED[0] = False
  with pytest.warns(UserWarning, match='LPIPS requested but no weights'):
    harness = metrics_lib.MetricHarness(compute_lpips=True,
                                        lpips_weights='/nonexistent.npz')
  m = harness(np.zeros((16, 16, 3), np.float32),
              np.zeros((16, 16, 3), np.float32))
  assert 'lpips' not in m


def test_lpips_warns_only_once():
  """Repeated MetricHarness constructions must not spam the warning."""
  metrics_lib._LPIPS_WARNED[0] = False
  with pytest.warns(UserWarning, match='LPIPS requested'):
    metrics_lib.MetricHarness(compute_lpips=True,
                              lpips_weights='/nonexistent.npz')
  with warnings.catch_warnings():
    warnings.simplefilter('error')
    metrics_lib.MetricHarness(compute_lpips=True,
                              lpips_weights='/nonexistent.npz')


def test_converter_end_to_end_from_pth_files(tmp_path):
  """The full offline provisioning path on randomly-initialized VGG weights:
  torch-saved .pth state dicts (torchvision vgg16 + lpips v0.1 naming) ->
  convert_lpips_weights CLI (torch.load, weights_only) -> .npz ->
  VGGLPIPS evaluator == the torch lpips-math oracle (VERDICT r3 #8;
  reference consumes the same weights via the lpips package,
  internal/image.py:133-137)."""
  import subprocess
  import sys, os
  import torch

  params = _fake_params(seed=7)
  vgg_sd = {}
  for cid in CONV_IDS:
    vgg_sd[f'features.{cid}.weight'] = torch.from_numpy(
        params[f'features_{cid}_weight'])
    vgg_sd[f'features.{cid}.bias'] = torch.from_numpy(
        params[f'features_{cid}_bias'])
  # torchvision state dicts also carry classifier weights the converter
  # must ignore.
  vgg_sd['classifier.0.weight'] = torch.zeros(8, 8)
  lpips_sd = {f'lin{k}.model.1.weight': torch.from_numpy(
      params[f'lin{k}_weight']) for k in range(5)}
  vgg_path = str(tmp_path / 'vgg16.pth')
  lpips_path = str(tmp_path / 'lpips_vgg.pth')
  torch.save(vgg_sd, vgg_path)
  torch.save(lpips_sd, lpips_path)

  out_npz = str(tmp_path / 'out.npz')
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  env = dict(os.environ, JAX_PLATFORMS='cpu')
  env.pop('PALLAS_AXON_POOL_IPS', None)
  proc = subprocess.run(
      [sys.executable, os.path.join(repo, 'tools', 'convert_lpips_weights.py'),
       out_npz, '--vgg16', vgg_path, '--lpips', lpips_path],
      capture_output=True, text=True, env=env, cwd=repo, timeout=180)
  assert proc.returncode == 0, proc.stdout + proc.stderr
  assert 'wrote' in proc.stdout

  harness = metrics_lib.MetricHarness(compute_lpips=True,
                                      lpips_weights=out_npz)
  assert harness.lpips_fn is not None
  rng = np.random.RandomState(11)
  img0 = rng.uniform(0, 1, (24, 40, 3)).astype(np.float32)
  img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape), 0, 1).astype(
      np.float32)
  ours = harness(img0, img1)['lpips']
  oracle = _torch_lpips(params, img0, img1)
  np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-7)


def test_converter_state_dict_mapping(tmp_path):
  """from_state_dicts maps torchvision/lpips naming to our archive layout."""
  import sys, os
  sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
  import convert_lpips_weights as conv

  params = _fake_params(seed=4)
  vgg_sd = {}
  for cid in CONV_IDS:
    vgg_sd[f'features.{cid}.weight'] = params[f'features_{cid}_weight']
    vgg_sd[f'features.{cid}.bias'] = params[f'features_{cid}_bias']
  lpips_sd = {f'lin{k}.model.1.weight': params[f'lin{k}_weight']
              for k in range(5)}
  arrays = conv.from_state_dicts(vgg_sd, lpips_sd)
  assert set(arrays) == set(params)
  for k in params:
    np.testing.assert_array_equal(arrays[k], params[k])
