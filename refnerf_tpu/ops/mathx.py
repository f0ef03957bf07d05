"""Scalar/array math helpers.

Behavioral parity with the reference's internal/math.py (safe trig, log-lerp
LR decay, sorted interpolation); formulated for XLA/TPU: static shapes,
masked reductions instead of gathers, no data-dependent control flow.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Tiny constant used to keep denominators away from zero.
EPS = float(np.finfo(np.float32).eps)


def safe_trig_helper(x, fn, t=100 * jnp.pi):
  """Mod `x` into [-t, t) before the trig op so large args don't NaN on TPU."""
  return fn(jnp.where(jnp.abs(x) < t, x, x % t))


def safe_cos(x):
  """cos(x) that stays finite for very large x (ref: internal/math.py:27)."""
  return safe_trig_helper(x, jnp.cos)


def safe_sin(x):
  """sin(x) that stays finite for very large x (ref: internal/math.py:32)."""
  return safe_trig_helper(x, jnp.sin)


def safe_div(num, denom):
  """num/denom with a double-where so 0-denominators don't poison gradients."""
  guarded = jnp.where(denom != 0, denom, 1.0)
  return jnp.where(denom != 0, num / guarded, 0.0)


def log_lerp(t, v0, v1):
  """Interpolate log-linearly from v0 (t=0) to v1 (t=1). Host-side (numpy)."""
  if v0 <= 0 or v1 <= 0:
    raise ValueError(f'Interpolants {v0} and {v1} must be positive.')
  lv0, lv1 = np.log(v0), np.log(v1)
  return np.exp(np.clip(t, 0, 1) * (lv1 - lv0) + lv0)


def learning_rate_decay(step, lr_init, lr_final, max_steps, lr_delay_steps=0,
                        lr_delay_mult=1.0):
  """Continuous log-linear LR decay with a reverse-cosine warmup window.

  Returns the absolute learning rate for `step` (unlike the reference's
  LambdaLR multiplier, which divides by lr_init; ref: internal/math.py:46-78).
  Works with numpy scalars and traced jnp values (used as an optax schedule).
  """
  xnp = jnp if isinstance(step, jnp.ndarray) else np
  if lr_delay_steps > 0:
    delay_rate = lr_delay_mult + (1 - lr_delay_mult) * xnp.sin(
        0.5 * xnp.pi * xnp.clip(step / lr_delay_steps, 0, 1))
  else:
    delay_rate = 1.0
  t = xnp.clip(step / max_steps, 0, 1)
  log_lerped = xnp.exp(t * (xnp.log(lr_final) - xnp.log(lr_init))
                       + xnp.log(lr_init))
  return delay_rate * log_lerped


def sorted_interp(x, xp, fp):
  """Batched linear interp where `xp`/`fp` are sorted along the last axis.

  TPU-friendly: a dense [..., n, m] masked max/min reduction instead of a
  gather (ref: internal/math.py:88-111; the formulation multinerf annotates
  as fast-on-TPU). O(n*m) memory per batch row - acceptable at the 128x128
  sizes this framework runs, and fully fusable by XLA.
  """
  # mask[..., i, j] == True iff x[..., j] >= xp[..., i].
  mask = x[..., None, :] >= xp[..., :, None]

  def find_interval(y):
    # Largest y whose xp <= x, and smallest y whose xp > x.
    y0 = jnp.max(jnp.where(mask, y[..., None], y[..., :1, None]), axis=-2)
    y1 = jnp.min(jnp.where(~mask, y[..., None], y[..., -1:, None]), axis=-2)
    return y0, y1

  fp0, fp1 = find_interval(fp)
  xp0, xp1 = find_interval(xp)

  offset = jnp.clip(jnp.nan_to_num((x - xp0) / (xp1 - xp0)), 0, 1)
  return fp0 + offset * (fp1 - fp0)


def interp(x, xp, fp):
  """np.interp broadcast over leading batch dims (monotonic xp).

  Equivalent to the reference's gather-based math.interp but expressed with
  the same masked-reduction primitive, so there is a single code path on TPU.
  """
  return sorted_interp(x, xp, fp)
