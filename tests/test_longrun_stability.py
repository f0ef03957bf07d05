"""CI-pinned stability checks for the compressed long-schedule run.

tools/run_long_schedule.sh trains the flagship geometry-loss stack
(llff_refnerf_geometry_losses.gin: noisy-view consistency, entropy/acc
regularizers) for >= 50k steps with the 250k reference config's
warmup/decay consistency windows proportionally scaled (reference
nerf_system.py:97-114) and records the loss / train-PSNR / val-PSNR
trajectories to LONGRUN_r03.json. This test pins "stable through the
consistency decay window and the LR tail": all losses finite, training
PSNR does not collapse after the decay window opens, and the final state
is at least as good as the early-training state. Skips when no artifact
exists (the run needs a TPU and ~1h; the artifact is committed).
"""

import json
import math
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ARTIFACT = os.environ.get('REFNERF_TPU_LONGRUN_JSON',
                           os.path.join(_REPO, 'LONGRUN_r03.json'))


@pytest.fixture(scope='module')
def longrun():
  if not os.path.exists(_ARTIFACT):
    pytest.skip(f'no long-run artifact at {_ARTIFACT} '
                '(run tools/run_long_schedule.sh on a TPU)')
  with open(_ARTIFACT) as f:
    return json.load(f)


def test_schedule_scale(longrun):
  assert longrun['steps'] >= 50000
  sched = longrun['consistency_schedule']
  assert sched['warmup_frac'] == 0.6 and sched['decay_frac'] == 0.8


def test_losses_finite_throughout(longrun):
  for step, loss in longrun['loss_trajectory']:
    assert math.isfinite(loss), (step, loss)
  assert math.isfinite(longrun['final_loss'])


def test_no_psnr_collapse_through_decay(longrun):
  traj = longrun['train_psnr_trajectory']
  steps = longrun['steps']
  # Peak PSNR before the decay window opens vs the minimum after it:
  # a collapse (> 3 dB drop below the pre-decay peak, sustained at the
  # end) means the consistency decay destabilized training.
  pre = [p for s, p in traj if s <= 0.8 * steps]
  post = [p for s, p in traj if s > 0.8 * steps]
  assert pre and post, 'trajectory does not span the decay window'
  assert longrun['final_train_psnr'] >= max(pre) - 3.0, (
      max(pre), longrun['final_train_psnr'])
  # And training made progress overall: final beats the first logged
  # window by a wide margin.
  assert longrun['final_train_psnr'] >= traj[0][1] + 3.0


def test_val_psnr_monotone_envelope(longrun):
  # Validation PSNR on cadence: no end-of-schedule divergence. The val is a
  # single held-out view (val_sample_num=1), so individual snapshots carry
  # ~+-1.3 dB of view-sampling noise around the series median (the r3 run:
  # 29.97..32.50 with no trend); compare the end of the series against the
  # median, not the noise peak.
  vals = longrun['val_psnrs']
  assert len(vals) >= 3, 'expected val cadence past 10k steps'
  series = [p for _, p in vals]
  med = sorted(series)[len(series) // 2]
  assert series[-1] >= med - 2.0, vals
  # And the tail as a whole holds the level: mean of the last 3 snapshots
  # within 1.5 dB of the series mean.
  tail = sum(series[-3:]) / 3
  assert tail >= sum(series) / len(series) - 1.5, vals
