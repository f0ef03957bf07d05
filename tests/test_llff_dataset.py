import os

import numpy as np
import pytest
from PIL import Image

from refnerf_tpu import configs as configs_lib
from refnerf_tpu.cameras import rays as rays_lib
from refnerf_tpu.data import colmap, datasets


def _quat_from_rotmat(r):
  """Rotation matrix -> [w, x, y, z] quaternion."""
  w = np.sqrt(max(0, 1 + r[0, 0] + r[1, 1] + r[2, 2])) / 2
  x = (r[2, 1] - r[1, 2]) / (4 * w)
  y = (r[0, 2] - r[2, 0]) / (4 * w)
  z = (r[1, 0] - r[0, 1]) / (4 * w)
  return np.array([w, x, y, z])


def _make_llff_scene(root, n_images=10, res=16):
  """A synthetic forward-facing COLMAP capture."""
  rng = np.random.RandomState(0)
  img_dir = os.path.join(root, 'images')
  os.makedirs(img_dir, exist_ok=True)

  cams = {1: colmap.Camera(
      1, 'SIMPLE_RADIAL', res, res,
      np.array([float(res), res / 2, res / 2, 0.001]))}
  images = {}
  for i in range(n_images):
    # Cameras along x, looking down +z (COLMAP convention: z forward).
    c2w_r = np.eye(3)
    c2w_t = np.array([0.1 * i, 0.02 * rng.randn(), 4.0])
    # world-to-cam = inverse.
    w2c_r = c2w_r.T
    w2c_t = -w2c_r @ c2w_t
    name = f'img_{i:02d}.png'
    images[i + 1] = colmap.ImagePose(
        i + 1, _quat_from_rotmat(w2c_r), w2c_t, 1, name)
    arr = rng.randint(0, 255, (res, res, 3)).astype(np.uint8)
    Image.fromarray(arr).save(os.path.join(img_dir, name))
  colmap.write_test_model(os.path.join(root, 'sparse', '0'), cams, images)

  # poses_bounds.npy: only the last two columns (bounds) are consumed.
  poses_bounds = np.concatenate(
      [rng.randn(n_images, 15), np.tile([1.0, 10.0], (n_images, 1))], -1)
  np.save(os.path.join(root, 'poses_bounds.npy'), poses_bounds)
  return root


@pytest.fixture(scope='module')
def llff_dir(tmp_path_factory):
  return _make_llff_scene(str(tmp_path_factory.mktemp('llff') / 'fern'))


def _llff_config(**kw):
  c = configs_lib.Config()
  c.dataset_loader = 'llff'
  c.forward_facing = True
  c.near, c.far = 0.0, 1.0
  c.factor = 0
  c.batch_size = 32
  c.llffhold = 4
  for k, v in kw.items():
    setattr(c, k, v)
  return c


def test_llff_split_sizes(llff_dir):
  train = datasets.load_dataset('train', llff_dir, _llff_config())
  test = datasets.load_dataset('test', llff_dir, _llff_config())
  # 10 images, llffhold=4 -> test gets indices 0,4,8 (3), train the other 7.
  assert test.size == 3
  assert train.size == 7


def test_llff_ndc_configured(llff_dir):
  ds = datasets.load_dataset('train', llff_dir, _llff_config())
  assert ds.pixtocam_ndc is not None
  assert ds.distortion_params is not None and 'k1' in ds.distortion_params
  # Render path was generated (spiral for forward-facing).
  assert ds.render_poses.shape[0] == ds.config.render_path_frames


def test_llff_train_batch_with_ndc_rays(llff_dir):
  cfg = _llff_config(cast_rays_in_train_step=False)
  ds = datasets.load_dataset('train', llff_dir, cfg)
  batch = next(ds)
  assert isinstance(batch.rays, rays_lib.Rays)
  o = np.asarray(batch.rays.origins)
  d = np.asarray(batch.rays.directions)
  assert np.all(np.isfinite(o)) and np.all(np.isfinite(d))
  # NDC origins live near the z=-1 plane.
  np.testing.assert_allclose(o[..., 2], -1.0, atol=1e-4)


def test_llff_few_shot(llff_dir):
  ds = datasets.load_dataset('train', llff_dir, _llff_config(n_input_views=3))
  assert ds.size == 3


def test_llff_use_all_images(llff_dir):
  ds = datasets.load_dataset(
      'train', llff_dir, _llff_config(llff_use_all_images_for_training=True))
  assert ds.size == 10


def test_rffr_loader_shares_llff_logic(llff_dir):
  cfg = _llff_config()
  cfg.dataset_loader = 'rffr'
  ds = datasets.load_dataset('train', llff_dir, cfg)
  assert ds.size == 7
  batch = next(ds)
  assert batch.rgb.shape[-1] == 3
