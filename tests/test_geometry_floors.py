"""CI-pinned floors for the geometry-loss flagship A/Bs.

tools/run_geometry_ab.sh measures the consistency/opacity regularizer
suite end-to-end in both radiance regimes (GEOMETRY_r04.json: Lambertian;
GEOMETRY_SHINY_r05.json: specular — the regime the reference's losses
target, reference README.md:50-62 / internal/train_utils.py:207-325).
These tests pin the measured behavior so a regression in the loss suite
(or its schedule) fails CI the next time the A/Bs are re-run. Skips when
an artifact is absent (each run needs ~1.6 h of TPU; artifacts are
committed with the repo).
"""

import json
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
  path = os.path.join(_REPO, name)
  if not os.path.exists(path):
    pytest.skip(f'no artifact at {path} (run tools/run_geometry_ab.sh)')
  with open(path) as f:
    return json.load(f)


def test_specular_scene_regularizers_do_no_harm():
  """On the glossy scene the suite must stay neutral-or-better.

  Recorded r5: geo_on 17.126 dB / 0.9386 SSIM vs geo_off 17.187 / 0.9355
  (delta PSNR -0.06 inside noise, delta SSIM +0.0031). Floors allow noise
  but fail on any Lambertian-style collapse (r4 measured -3.18 dB there)
  or on losing the SSIM advantage entirely.
  """
  art = _load('GEOMETRY_SHINY_r05.json')
  assert art.get('specular_scene') is True
  d_psnr = art['geo_on']['psnr'] - art['geo_off']['psnr']
  d_ssim = art['geo_on']['ssim'] - art['geo_off']['ssim']
  assert d_psnr >= -0.5, art  # no collapse in the target regime
  assert d_ssim >= -0.005, art
  # Both arms must be a real fit of the scene, not a degenerate run.
  assert art['geo_on']['psnr'] >= 16.0, art
  assert art['geo_off']['psnr'] >= 16.0, art


def test_lambertian_scene_off_arm_quality():
  """The Lambertian A/B's off-arm pins the plain-pipeline few-shot floor
  (18.01 dB recorded in r4); the on-arm number stays recorded as the
  documented wrong-regime cost, not a floor."""
  art = _load('GEOMETRY_r04.json')
  assert art['geo_off']['psnr'] >= 17.5, art
  assert art['geo_off']['ssim'] >= 0.93, art


def test_schedule_mitigation_decay_arm():
  """Pins the round-5 schedule-mitigation verdict (GEOMETRY_SCHEDULE_r05):
  the earliest-legal decay arm (decay 0.6 = warmup end; ref
  nerf_system.py:108-114 semantics) trains to a real fit but does NOT
  rescue the Lambertian regime — recorded 14.64 dB vs geo_on 14.83 /
  geo_off 18.01. The floor catches a degenerate run (loss/schedule code
  regression); the ceiling-vs-geo_off gap is the documented negative
  result, re-asserted here so a silently-changed artifact can't flip the
  DESIGN.md verdict without failing CI.
  """
  art = _load('GEOMETRY_SCHEDULE_r05.json')
  arm = art['arms'].get('geo_decay06')
  if arm is None or 'failed' in arm.get('metrics', {}):
    pytest.skip('decay arm not recorded in the artifact')
  m = arm['metrics']
  assert m['psnr'] >= 14.0, m          # real fit, not degenerate
  assert m['ssim'] >= 0.92, m
  # The verdict: no rescue — the arm stays well below the off-arm floor.
  geo_off = art['baselines_from_GEOMETRY_r04']['geo_off_psnr']
  assert m['psnr'] <= geo_off - 2.0, (
      'decay arm now within 2 dB of geo_off: the round-5 negative result '
      'no longer holds — re-run the A/B and update DESIGN.md')
