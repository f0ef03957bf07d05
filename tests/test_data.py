import json
import os

import numpy as np
import pytest
from PIL import Image

from refnerf_tpu import configs as configs_lib
from refnerf_tpu.cameras import camera_utils, rays as rays_lib
from refnerf_tpu.data import colmap, datasets, prefetch


def _make_blender_scene(root, n_frames=3, res=16, split='train'):
  os.makedirs(root, exist_ok=True)
  frames = []
  rng = np.random.RandomState(0)
  for i in range(n_frames):
    theta = 2 * np.pi * i / n_frames
    # Camera on a circle of radius 4 looking at the origin.
    pos = np.array([4 * np.cos(theta), 4 * np.sin(theta), 0.5])
    z = pos / np.linalg.norm(pos)          # backward (OpenGL -z is view dir)
    up = np.array([0.0, 0.0, 1.0])
    x = np.cross(up, z); x /= np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, pos
    name = f'r_{i}'
    img = (rng.uniform(0, 255, (res, res, 4))).astype(np.uint8)
    img[..., 3] = 255
    Image.fromarray(img, 'RGBA').save(os.path.join(root, name + '.png'))
    frames.append({'file_path': name,
                   'transform_matrix': c2w.tolist()})
  meta = {'camera_angle_x': 0.6911, 'frames': frames}
  with open(os.path.join(root, f'transforms_{split}.json'), 'w') as f:
    json.dump(meta, f)


@pytest.fixture
def blender_dir(tmp_path):
  root = str(tmp_path / 'lego')
  _make_blender_scene(root, split='train')
  _make_blender_scene(root, split='test')
  return root


def _blender_config(**kw):
  c = configs_lib.Config()
  c.dataset_loader = 'blender'
  c.batch_size = 64
  c.near, c.far = 2.0, 6.0
  c.batching = 'all_images'
  for k, v in kw.items():
    setattr(c, k, v)
  return c


def test_blender_loads(blender_dir):
  ds = datasets.load_dataset('train', blender_dir, _blender_config())
  assert ds.images.shape == (3, 16, 16, 3)
  assert ds.camtoworlds.shape == (3, 4, 4)
  assert ds.height == ds.width == 16
  assert ds.size == 3
  assert np.all(ds.images >= 0) and np.all(ds.images <= 1)


def test_blender_train_batch_fast_path(blender_dir):
  ds = datasets.load_dataset('train', blender_dir,
                             _blender_config(cast_rays_in_train_step=True))
  batch = next(ds)
  assert isinstance(batch.rays, rays_lib.Pixels)
  assert batch.rays.pix_x_int.shape == (64, 1, 1)
  assert batch.rgb.shape == (64, 1, 1, 3)
  # Pixel ids in range.
  assert batch.rays.pix_x_int.min() >= 0
  assert batch.rays.pix_x_int.max() < 16
  assert batch.rays.cam_idx.max() < 3


def test_blender_train_batch_slow_path_casts_rays(blender_dir):
  ds = datasets.load_dataset('train', blender_dir,
                             _blender_config(cast_rays_in_train_step=False))
  batch = next(ds)
  assert isinstance(batch.rays, rays_lib.Rays)
  assert batch.rays.origins.shape == (64, 1, 1, 3)
  v = np.asarray(batch.rays.viewdirs).reshape(-1, 3)
  np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)


def test_device_cast_matches_host_cast(blender_dir):
  """The Pixels fast path must produce the same rays as eager casting."""
  cfg = _blender_config(cast_rays_in_train_step=True, seed=7)
  ds = datasets.load_dataset('train', blender_dir, cfg)
  batch = next(ds)
  rays_device = camera_utils.cast_ray_batch(ds.cameras, batch.rays,
                                            ds.camtype)
  cfg2 = _blender_config(cast_rays_in_train_step=False, seed=7)
  ds2 = datasets.load_dataset('train', blender_dir, cfg2)
  batch2 = next(ds2)
  np.testing.assert_allclose(np.asarray(rays_device.origins),
                             np.asarray(batch2.rays.origins), atol=1e-5)
  np.testing.assert_allclose(np.asarray(rays_device.directions),
                             np.asarray(batch2.rays.directions), atol=1e-5)
  np.testing.assert_allclose(np.asarray(rays_device.radii),
                             np.asarray(batch2.rays.radii), atol=1e-7)


def test_full_image_batch(blender_dir):
  ds = datasets.load_dataset('test', blender_dir, _blender_config())
  batch = ds.generate_ray_batch(0)
  assert batch.rays.origins.shape == (16, 16, 3)
  assert batch.rgb.shape == (16, 16, 3)
  # Rays all start at the same camera center.
  o = np.asarray(batch.rays.origins).reshape(-1, 3)
  np.testing.assert_allclose(o, np.broadcast_to(o[0], o.shape), atol=1e-5)


def test_debug_mode_deterministic(blender_dir):
  cfg = _blender_config(dataset_debug_mode=True)
  ds = datasets.load_dataset('train', blender_dir, cfg)
  b1, b2 = next(ds), next(ds)
  np.testing.assert_array_equal(b1.rays.pix_x_int, b2.rays.pix_x_int)
  assert np.all(np.asarray(b1.rays.cam_idx) == 0)


def test_patch_sampling(blender_dir):
  cfg = _blender_config(patch_size=4, batch_size=64)
  ds = datasets.load_dataset('train', blender_dir, cfg)
  batch = next(ds)
  assert batch.rays.pix_x_int.shape == (4, 4, 4)  # 4 patches of 4x4
  # Within a patch, x coordinates step by 1 along axis -1.
  px = np.asarray(batch.rays.pix_x_int)
  np.testing.assert_array_equal(np.diff(px, axis=-1), 1)


def test_single_image_batching(blender_dir):
  cfg = _blender_config(batching='single_image')
  ds = datasets.load_dataset('train', blender_dir, cfg)
  batch = next(ds)
  assert np.unique(np.asarray(batch.rays.cam_idx)).size == 1


def test_few_shot_truncation(blender_dir):
  cfg = _blender_config(n_input_views=2)
  ds = datasets.load_dataset('train', blender_dir, cfg)
  assert ds.size == 2


def test_prefetch_pipeline(blender_dir):
  ds = datasets.load_dataset('train', blender_dir, _blender_config())
  it = prefetch.training_batches(ds, mesh=None, threaded=True)
  batches = [next(it) for _ in range(3)]
  for b in batches:
    assert b.rgb.shape == (64, 1, 1, 3)


def test_colmap_roundtrip(tmp_path):
  model_dir = str(tmp_path / 'sparse' / '0')
  rng = np.random.RandomState(1)
  cams = {1: colmap.Camera(1, 'OPENCV', 64, 48,
                           np.array([50.0, 52.0, 32.0, 24.0,
                                     0.01, -0.002, 0.0005, 0.0003]))}
  images = {}
  for i in range(1, 4):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    images[i] = colmap.ImagePose(i, q, rng.randn(3), 1, f'img_{i}.png')
  colmap.write_test_model(model_dir, cams, images)

  names, poses, pixtocam, params, camtype = colmap.load_scene(model_dir)
  assert names == ['img_1.png', 'img_2.png', 'img_3.png']
  assert poses.shape == (3, 3, 4)
  assert camtype == 'perspective'
  assert np.isclose(params['k1'], 0.01)
  assert np.isclose(params['p2'], 0.0003)
  # pixtocam inverts the intrinsics.
  k = np.array([[50.0, 0, 32.0], [0, 52.0, 24.0], [0, 0, 1]])
  np.testing.assert_allclose(pixtocam, np.linalg.inv(k), atol=1e-8)
  # Rotations orthonormal after axis flip.
  for p in poses:
    r = p[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)


def test_colmap_text_format(tmp_path):
  d = str(tmp_path)
  with open(os.path.join(d, 'cameras.txt'), 'w') as f:
    f.write('# comment\n1 PINHOLE 64 48 50.0 52.0 32.0 24.0\n')
  with open(os.path.join(d, 'images.txt'), 'w') as f:
    f.write('# comment\n1 1 0 0 0 0.5 0.2 1.0 1 a.png\n\n')
  cams = colmap.read_cameras_txt(os.path.join(d, 'cameras.txt'))
  assert cams[1].fx == 50.0 and cams[1].fy == 52.0
  ims = colmap.read_images_txt(os.path.join(d, 'images.txt'))
  assert ims[1].name == 'a.png'
  np.testing.assert_allclose(ims[1].tvec, [0.5, 0.2, 1.0])


def test_dtu_projection_decomposition():
  # K @ [R | -R c] must reproduce the projection (up to scale).
  rng = np.random.RandomState(2)
  k = np.array([[100.0, 0, 32], [0, 110.0, 24], [0, 0, 1.0]])
  # Random rotation via QR.
  q, _ = np.linalg.qr(rng.randn(3, 3))
  if np.linalg.det(q) < 0:
    q = -q
  c = rng.randn(3)
  p = (k @ np.concatenate([q, (-q @ c)[:, None]], 1)).astype(np.float32)
  k2, r2, c2h = datasets._decompose_projection_matrix(p)
  k2 = k2 / k2[2, 2]
  np.testing.assert_allclose(k2, k, rtol=1e-4, atol=1e-3)
  np.testing.assert_allclose(np.abs(np.diag(r2 @ q.T)), 1.0, atol=1e-4)
  c2 = (c2h[:3] / c2h[3])[:, 0]
  np.testing.assert_allclose(c2, c, rtol=1e-3, atol=1e-3)


def test_parallel_map_orders_and_degrades():
  """parallel_map preserves item order with >1 worker and equals the serial
  loop's output; max_workers<=1 (the single-CPU degradation) matches too."""
  from refnerf_tpu.data.datasets import parallel_map
  items = list(range(23))
  fn = lambda x: x * x
  assert parallel_map(fn, items, max_workers=8) == [fn(x) for x in items]
  assert parallel_map(fn, items, max_workers=1) == [fn(x) for x in items]
  assert parallel_map(fn, iter(items), max_workers=4) == [
      fn(x) for x in items]


def test_threaded_sampler_relays_errors_and_exhaustion():
  """A producer exception must re-raise in the consumer (not deadlock it),
  and a finite source must end with StopIteration after draining."""
  import time as time_lib

  from refnerf_tpu.data import prefetch as prefetch_lib

  class Boom:
    def __init__(self):
      self.n = 0
    def __next__(self):
      self.n += 1
      if self.n > 2:
        raise RuntimeError('sampler exploded')
      return self.n

  s = prefetch_lib.ThreadedSampler(Boom(), capacity=1)
  got = [next(s), next(s)]
  assert got == [1, 2]
  with pytest.raises(RuntimeError, match='sampler exploded'):
    next(s)

  s2 = prefetch_lib.ThreadedSampler(iter([10, 20]), capacity=4)
  assert list(s2) == [10, 20]

  # Closing the training_batches generator stops the sampler thread.
  class Endless:
    def __init__(self):
      self.alive = True
    def __next__(self):
      return np.zeros((2, 3), np.float32)

  import threading as threading_lib
  before = threading_lib.active_count()
  batches = prefetch_lib.training_batches(Endless(), threaded=True)
  next(batches)
  batches.close()
  for _ in range(50):  # thread exits within ~its 0.1s put timeout
    if threading_lib.active_count() <= before:
      break
    time_lib.sleep(0.05)
  assert threading_lib.active_count() <= before


def test_colmap_images_txt_empty_points_lines(tmp_path):
  """An image with zero registered 2D points writes an EMPTY second line;
  the two-line pairing must survive (dropping blanks silently skipped or
  mis-parsed every other image)."""
  d = str(tmp_path)
  with open(os.path.join(d, 'images.txt'), 'w') as f:
    f.write('# header\n'
            '1 1 0 0 0 0.5 0.2 1.0 1 a.png\n'
            '\n'                                  # zero points
            '2 0 1 0 0 0.1 0.0 2.0 1 b.png\n'
            '10.5 20.5 7 30.5 40.5 9\n'           # two points
            '3 0 0 1 0 0.0 0.3 3.0 1 c.png\n'
            '\n')
  ims = colmap.read_images_txt(os.path.join(d, 'images.txt'))
  assert sorted(ims) == [1, 2, 3]
  assert [ims[i].name for i in (1, 2, 3)] == ['a.png', 'b.png', 'c.png']
  np.testing.assert_allclose(ims[3].tvec, [0.0, 0.3, 3.0])


def test_blender_posedata_focal_only_json(tmp_path):
  """instant-NGP style transforms.json with fl_x/fl_y but NO camera_angle
  must load (the focal fallback must stay lazy)."""
  import json as json_lib
  meta = {
      'w': 64, 'h': 48, 'fl_x': 50.0, 'fl_y': 52.0,
      'frames': [{'file_path': 'images/r_0',
                  'transform_matrix': np.eye(4).tolist()}],
  }
  os.makedirs(os.path.join(str(tmp_path), 'images'), exist_ok=True)
  open(os.path.join(str(tmp_path), 'images', 'r_0'), 'wb').close()
  with open(os.path.join(str(tmp_path), 'transforms.json'), 'w') as f:
    json_lib.dump(meta, f)
  names, poses, pixtocam, params, camtype = (
      datasets.load_blender_posedata(str(tmp_path)))
  assert names == ['r_0']
  np.testing.assert_allclose(1.0 / pixtocam[0, 0], 50.0)


def test_debug_mode_patch_shapes(blender_dir):
  """Debug mode with patch_size > 1 must produce full-size patch batches
  (the reference forgets the offsets and returns 1/p^2 of the batch)."""
  cfg = _blender_config(dataset_debug_mode=True, patch_size=2,
                        batch_size=16)
  ds = datasets.load_dataset('train', blender_dir, cfg)
  b = next(ds)
  assert np.asarray(b.rays.pix_x_int).shape == (4, 2, 2)
  # Each patch spans its 2x2 offsets.
  px = np.asarray(b.rays.pix_x_int)
  np.testing.assert_array_equal(px[:, :, 1], px[:, :, 0] + 1)
