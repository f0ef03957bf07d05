"""Step-function (piecewise-constant 1D) tools: the hierarchical-sampling engine.

Conventions (shared with the reference, internal/stepfun.py):
  `t` - x-coordinates of step-function *endpoints*, sorted, shape [..., n+1]
  `y` - unconstrained bin values, shape [..., n]
  `w` - bin weights summing to <= 1
  `p` - non-negative bin values integrating to <= 1

Everything is static-shape jnp with masked reductions (no gathers on the hot
path) so the whole resampling cascade fuses into one XLA program. The
brute-force searchsorted/interp formulation is the one multinerf flags as
TPU-fast (ref: internal/stepfun.py:187-190 `use_gpu_resampling=False`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from refnerf_tpu.ops import mathx

_EPS = float(np.finfo(np.float32).eps)


def searchsorted(a, v):
  """For each v, indices (lo, hi) in `a` with a[lo] <= v < a[hi].

  Out-of-range queries clamp both indices to the first/last index of `a`.
  Dense masked-reduction form (ref: internal/stepfun.py:31-56).
  a: [..., n] sorted. v: [..., m]. Returns int32 [..., m] pair.
  """
  i = jnp.arange(a.shape[-1], dtype=jnp.int32)
  v_ge_a = v[..., None, :] >= a[..., :, None]
  idx_lo = jnp.max(
      jnp.where(v_ge_a, i[:, None], i[:1, None]), axis=-2)
  idx_hi = jnp.min(
      jnp.where(~v_ge_a, i[:, None], i[-1:, None]), axis=-2)
  return idx_lo, idx_hi


def query(tq, t, y, outside_value=0):
  """Look up the step function (t, y) at locations tq (0 outside support)."""
  idx_lo, idx_hi = searchsorted(t, tq)
  yq = jnp.where(idx_lo == idx_hi, outside_value,
                 jnp.take_along_axis(y, idx_lo, axis=-1))
  return yq


def inner_outer(t0, t1, y1):
  """Inner and outer measures of the step fn (t1, y1) over intervals t0."""
  cy1 = jnp.concatenate(
      [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1)
  idx_lo, idx_hi = searchsorted(t1, t0)

  cy1_lo = jnp.take_along_axis(cy1, idx_lo, axis=-1)
  cy1_hi = jnp.take_along_axis(cy1, idx_hi, axis=-1)

  y0_outer = cy1_hi[..., 1:] - cy1_lo[..., :-1]
  y0_inner = jnp.where(idx_hi[..., :-1] <= idx_lo[..., 1:],
                       cy1_lo[..., 1:] - cy1_hi[..., :-1], 0)
  return y0_inner, y0_outer


def lossfun_outer(t, w, t_env, w_env, eps=_EPS):
  """Proposal-supervision loss: penalize w exceeding its envelope upper bound.

  (ref: internal/stepfun.py:83-89) Half-quadratic; constant gradient at
  w_outer = 0.
  """
  _, w_outer = inner_outer(t, t_env, w_env)
  return jnp.maximum(0, w - w_outer) ** 2 / (w + eps)


def weight_to_pdf(t, w, eps=_EPS**2):
  """Turn weights summing to 1 into a PDF integrating to 1."""
  return w / jnp.maximum(eps, t[..., 1:] - t[..., :-1])


def pdf_to_weight(t, p):
  """Turn a PDF integrating to 1 into weights summing to 1."""
  return p * (t[..., 1:] - t[..., :-1])


def max_dilate(t, w, dilation, domain=(-jnp.inf, jnp.inf)):
  """Dilate (max-pool) a non-negative step function by +-dilation."""
  t0 = t[..., :-1] - dilation
  t1 = t[..., 1:] + dilation
  t_dilate = jnp.sort(jnp.concatenate([t, t0, t1], axis=-1), axis=-1)
  t_dilate = jnp.clip(t_dilate, *domain)
  w_dilate = jnp.max(
      jnp.where(
          (t0[..., None, :] <= t_dilate[..., None])
          & (t1[..., None, :] > t_dilate[..., None]),
          w[..., None, :], 0), axis=-1)[..., :-1]
  return t_dilate, w_dilate


def max_dilate_weights(t, w, dilation, domain=(-jnp.inf, jnp.inf),
                       renormalize=False, eps=_EPS**2):
  """Dilate a weight vector via its PDF (ref: internal/stepfun.py:117-131)."""
  p = weight_to_pdf(t, w)
  t_dilate, p_dilate = max_dilate(t, p, dilation, domain=domain)
  w_dilate = pdf_to_weight(t_dilate, p_dilate)
  if renormalize:
    w_dilate /= jnp.maximum(eps, jnp.sum(w_dilate, axis=-1, keepdims=True))
  return t_dilate, w_dilate


def integrate_weights(w):
  """CDF endpoints of weights assumed to sum to 1; starts at 0, ends at 1."""
  cw = jnp.minimum(1, jnp.cumsum(w[..., :-1], axis=-1))
  shape = cw.shape[:-1] + (1,)
  cw0 = jnp.concatenate(
      [jnp.zeros(shape, w.dtype), cw, jnp.ones(shape, w.dtype)], axis=-1)
  return cw0


def invert_cdf(u, t, w_logits):
  """Invert the CDF defined by (t, softmax(w_logits)) at points u in [0,1)."""
  w = jax.nn.softmax(w_logits, axis=-1)
  cw = integrate_weights(w)
  return mathx.sorted_interp(u, cw, t)


def sample(rng, t, w_logits, num_samples, single_jitter=False,
           deterministic_center=False):
  """Piecewise-constant PDF sampling from a step function.

  With rng=None this matches the reference's shipped deterministic-linspace
  behavior exactly (ref: internal/stepfun.py:195-206). With an rng key it
  restores multinerf's stratified sampling (a capability the torch port
  dropped), with `single_jitter` jittering whole rays rather than samples.

  Args:
    rng: PRNGKey or None for deterministic linspace sampling.
    t: [..., n+1] sorted bin endpoints.
    w_logits: [..., n] logits of bin weights.
    num_samples: number of samples per ray.
    single_jitter: one jitter value per ray instead of per sample.
    deterministic_center: with rng=None, return PDF-interval centers rather
      than a full-span linspace.

  Returns:
    t_samples: [..., num_samples].
  """
  eps = _EPS
  if rng is None:
    if deterministic_center:
      pad = 1 / (2 * num_samples)
      u = jnp.linspace(pad, 1.0 - pad - eps, num_samples)
    else:
      u = jnp.linspace(0, 1.0 - eps, num_samples)
    u = jnp.broadcast_to(u, t.shape[:-1] + (num_samples,))
  else:
    # Stratified samples: evenly spaced bins, jittered within each bin but
    # never crossing into the neighboring bin (matches jax multinerf).
    u_max = eps + (1 - eps) / num_samples
    # max(1, .): a single stratified sample jitters within its whole bin
    # instead of dividing by zero.
    max_jitter = (1 - u_max) / max(1, num_samples - 1) - eps
    d = 1 if single_jitter else num_samples
    u = (jnp.linspace(0, 1 - u_max, num_samples) +
         jax.random.uniform(rng, t.shape[:-1] + (d,), maxval=max_jitter))
  return invert_cdf(u, t, w_logits)


def sample_intervals(rng, t, w_logits, num_samples, single_jitter=False,
                     domain=(-jnp.inf, jnp.inf)):
  """Sample *intervals* (fenceposts) from a step function.

  Returns num_samples+1 endpoints spanning the midpoints of adjacent sampled
  centers, with reflected+clamped first/last posts
  (ref: internal/stepfun.py:209-258).
  """
  if num_samples <= 1:
    raise ValueError(f'num_samples must be > 1, is {num_samples}.')

  centers = sample(rng, t, w_logits, num_samples, single_jitter,
                   deterministic_center=True)

  mid = (centers[..., 1:] + centers[..., :-1]) / 2

  minval, maxval = domain
  first = jnp.maximum(minval, 2 * centers[..., :1] - mid[..., :1])
  last = jnp.minimum(maxval, 2 * centers[..., -1:] - mid[..., -1:])
  return jnp.concatenate([first, mid, last], axis=-1)


def lossfun_distortion(t, w):
  """mip-NeRF 360 distortion: iint w_i w_j |t_i - t_j| di dj."""
  ut = (t[..., 1:] + t[..., :-1]) / 2
  dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
  loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
  loss_intra = jnp.sum(w**2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3
  return loss_inter + loss_intra


def interval_distortion(t0_lo, t0_hi, t1_lo, t1_hi):
  """mean(|x-y|) for x ~ U[t0_lo,t0_hi], y ~ U[t1_lo,t1_hi]."""
  d_disjoint = jnp.abs((t1_lo + t1_hi) / 2 - (t0_lo + t0_hi) / 2)
  d_overlap = (
      2 * (jnp.minimum(t0_hi, t1_hi)**3 - jnp.maximum(t0_lo, t1_lo)**3) +
      3 * (t1_hi * t0_hi * jnp.abs(t1_hi - t0_hi) +
           t1_lo * t0_lo * jnp.abs(t1_lo - t0_lo) + t1_hi * t0_lo *
           (t0_lo - t1_hi) + t1_lo * t0_hi *
           (t1_lo - t0_hi))) / (6 * (t0_hi - t0_lo) * (t1_hi - t1_lo))
  are_disjoint = (t0_lo > t1_hi) | (t1_lo > t0_hi)
  return jnp.where(are_disjoint, d_disjoint, d_overlap)


def weighted_percentile(t, w, ps):
  """Percentiles `ps` (in [0,100]) of the step fn (t, w); w sums to 1."""
  cw = integrate_weights(w)
  # Interpolate into the CDF; broadcast ps over the batch.
  ps_arr = jnp.asarray(ps, dtype=t.dtype) / 100
  ps_b = jnp.broadcast_to(ps_arr, t.shape[:-1] + (len(ps),))
  return mathx.sorted_interp(ps_b, cw, t)


def resample(t, tp, vp, use_avg=False, eps=_EPS):
  """Resample a step function (tp, vp) onto new endpoints t by summation.

  (ref: internal/stepfun.py:310-348) If use_avg, return width-weighted
  averages instead of sums.
  """
  if use_avg:
    wp = jnp.diff(tp, axis=-1)
    v_numer = resample(t, tp, vp * wp, use_avg=False)
    v_denom = resample(t, tp, wp, use_avg=False)
    return v_numer / jnp.maximum(eps, v_denom)

  acc = jnp.cumsum(vp, axis=-1)
  acc0 = jnp.concatenate([jnp.zeros(acc.shape[:-1] + (1,), acc.dtype), acc],
                         axis=-1)
  acc0_resampled = mathx.sorted_interp(t, tp, acc0)
  return jnp.diff(acc0_resampled, axis=-1)
