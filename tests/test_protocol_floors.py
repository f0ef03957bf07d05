"""CI-pinned quality floors for the full published-protocol run.

tools/run_full_protocol.sh trains blender_refnerf.gin >= 25k steps on the
800x800 benchmark scene, runs the real eval.py, and records metrics +
wall-clock to PROTOCOL_r03.json. This test pins the recorded metrics as
regression floors so a quality regression in the shipped pipeline fails CI
the next time the protocol is run. Skips when no protocol artifact exists
(the run needs a TPU and ~2h; the artifact is committed with the repo).
"""

import json
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ARTIFACT = os.environ.get('REFNERF_TPU_PROTOCOL_JSON',
                           os.path.join(_REPO, 'PROTOCOL_r03.json'))

# Floors: the weakest values the shipped pipeline is allowed to produce at
# protocol scale, set ~0.5 dB / ~0.01 SSIM under the recorded r3 run
# (PROTOCOL_r03.json: psnr 25.60 / ssim 0.9417 at 25k steps, 800x800,
# 100 train / 200 test views).
PSNR_FLOOR = 25.1
SSIM_FLOOR = 0.93
TRAIN_RAYS_PER_SEC_FLOOR = 25_000.0


@pytest.fixture(scope='module')
def protocol():
  if not os.path.exists(_ARTIFACT):
    pytest.skip(f'no protocol artifact at {_ARTIFACT} '
                '(run tools/run_full_protocol.sh on a TPU)')
  with open(_ARTIFACT) as f:
    return json.load(f)


def test_protocol_scale(protocol):
  assert protocol['steps'] >= 25000
  assert protocol['resolution'] == 800


def test_quality_floors(protocol):
  m = protocol['metrics']
  assert m['psnr'] >= PSNR_FLOOR, m
  assert m['ssim'] >= SSIM_FLOOR, m
  # Color-corrected metrics exist (the reference's cc pipeline ran).
  assert 'cc_psnr' in m and 'cc_ssim' in m


def test_throughput_floor(protocol):
  # End-to-end system throughput (includes val/ckpt pauses), not bench.py's
  # bare step: a generous floor that still catches pipeline regressions.
  assert protocol['train_rays_per_sec'] >= TRAIN_RAYS_PER_SEC_FLOOR
