import os

import numpy as np
import pytest
from PIL import Image

from refnerf_tpu import configs as configs_lib
from refnerf_tpu.data import datasets


def _save_png(path, res, rng):
  arr = rng.randint(0, 255, (res, res, 3)).astype(np.uint8)
  Image.fromarray(arr).save(path)


def _make_tat_nerfpp_scene(root, n=6, res=16):
  rng = np.random.RandomState(0)
  for split in ['train', 'test']:
    for sub in ['rgb', 'pose', 'intrinsics']:
      os.makedirs(os.path.join(root, split, sub), exist_ok=True)
    for i in range(n):
      _save_png(os.path.join(root, split, 'rgb', f'{i:04d}.png'), res, rng)
      pose = np.eye(4)
      pose[:3, 3] = [0.2 * i, 0.0, 4.0]
      np.savetxt(os.path.join(root, split, 'pose', f'{i:04d}.txt'),
                 pose.reshape(-1)[None])
      k = np.eye(4)
      k[0, 0] = k[1, 1] = float(res)
      k[0, 2] = k[1, 2] = res / 2
      np.savetxt(os.path.join(root, split, 'intrinsics', f'{i:04d}.txt'),
                 k.reshape(-1)[None])
  return root


def _make_tat_fvs_scene(root, n=6, res=16):
  rng = np.random.RandomState(1)
  base = os.path.join(root, 'dense', 'ibr3d_pw_0.25')
  os.makedirs(base, exist_ok=True)
  ks, rs, ts = [], [], []
  for i in range(n):
    _save_png(os.path.join(base, f'im_{i:08d}.png'), res, rng)
    k = np.eye(3) * res
    k[2, 2] = 1
    k[0, 2] = k[1, 2] = res / 2
    ks.append(k)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
      q = -q
    rs.append(q)
    ts.append(rng.randn(3) * 0.1 + [0, 0, 4.0])
  np.save(os.path.join(base, 'Ks.npy'), np.stack(ks))
  np.save(os.path.join(base, 'Rs.npy'), np.stack(rs))
  np.save(os.path.join(base, 'ts.npy'), np.stack(ts))
  return root


def _make_dtu_scene(root, n=4, res=16):
  rng = np.random.RandomState(2)
  scan_dir = os.path.join(root, 'mvs', 'scan1')
  cal_dir = os.path.join(root, 'cal18')
  os.makedirs(scan_dir, exist_ok=True)
  os.makedirs(cal_dir, exist_ok=True)
  for i in range(1, n + 1):
    # 8 files per view (the loader counts files//8).
    _save_png(os.path.join(scan_dir, f'rect_{i:03d}_2_r5000.png'), res, rng)
    for j in range(7):
      with open(os.path.join(scan_dir, f'rect_{i:03d}_aux{j}.txt'), 'w') as f:
        f.write('x')
    # Projection matrix: K [R | -R c].
    k = np.array([[res, 0, res / 2], [0, res, res / 2], [0, 0, 1.0]])
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
      q = -q
    c = rng.randn(3) * 0.2 + [0, 0, 4.0]
    p = k @ np.concatenate([q, (-q @ c)[:, None]], 1)
    np.savetxt(os.path.join(cal_dir, f'pos_{i:03d}.txt'), p)
  return scan_dir


def test_tat_nerfpp_loader(tmp_path):
  root = _make_tat_nerfpp_scene(str(tmp_path / 'tat'))
  cfg = configs_lib.Config()
  cfg.dataset_loader = 'tat_nerfpp'
  cfg.batch_size = 16
  train = datasets.load_dataset('train', root, cfg)
  assert train.size == 6
  assert train.images.shape == (6, 16, 16, 3)
  batch = next(train)
  assert batch.rgb.shape == (16, 1, 1, 3)
  test = datasets.load_dataset('test', root, cfg)
  full = test.generate_ray_batch(0)
  assert full.rays.origins.shape == (16, 16, 3)


def test_tat_fvs_loader(tmp_path):
  root = _make_tat_fvs_scene(str(tmp_path / 'fvs'))
  cfg = configs_lib.Config()
  cfg.dataset_loader = 'tat_fvs'
  cfg.batch_size = 16
  cfg.factor = 0
  cfg.llffhold = 3
  train = datasets.load_dataset('train', root, cfg)
  # 6 images, hold every 3rd -> 4 train / 2 test.
  assert train.size == 4
  test = datasets.load_dataset('test', root, cfg)
  assert test.size == 2
  batch = next(train)
  assert batch.rgb.shape == (16, 1, 1, 3)


def test_dtu_loader(tmp_path):
  scan_dir = _make_dtu_scene(str(tmp_path / 'dtu'))
  cfg = configs_lib.Config()
  cfg.dataset_loader = 'dtu'
  cfg.batch_size = 16
  cfg.factor = 0
  cfg.dtuhold = 2
  cfg.dtu_light_cond = 2
  train = datasets.load_dataset('train', scan_dir, cfg)
  assert train.size == 2  # 4 views, every 2nd held out
  assert train.images.shape[1:] == (16, 16, 3)
  batch = next(train)
  assert batch.rgb.shape == (16, 1, 1, 3)
  # Poses are orthonormal camera-to-world.
  r = train.camtoworlds[:, :3, :3]
  np.testing.assert_allclose(
      np.einsum('nij,nkj->nik', r, r),
      np.broadcast_to(np.eye(3), r.shape), atol=1e-4)
