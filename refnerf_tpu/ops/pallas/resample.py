"""Fused hierarchical-resampling kernel (Pallas/TPU).

`sample_intervals` is the per-level resampling op: softmax the weight logits,
integrate them into a CDF, invert the CDF at linspaced positions via a
brute-force sorted interp, and convert sampled centers to interval fenceposts
(ops/stepfun.py). The jnp formulation materializes [B, n+1, m] broadcast
intermediates in HBM (several GB per step at production sizes). This kernel
keeps the whole chain in VMEM per ray-block: HBM traffic drops to the inputs
and outputs (~B*(n+m) floats).

Sampling is wrapped in stop_gradient by the model (models/model.py), so the
kernel is forward-only - no custom VJP needed.

Layout notes (see the TPU tiling constraints): the bin axis n and sample axis
m live on the 128-wide lane dimension; rays ride the 8-sublane dimension in
blocks of BLOCK_RAYS. All reductions over bins are in-register VPU work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = float(np.finfo(np.float32).eps)
# Ray block sized so the [BLOCK, m, n+1] masks fit comfortably in ~16MB VMEM
# at production sizes (m = n = 128).
BLOCK_RAYS = 16


def _prefix_sum(x):
  """Inclusive prefix sum along the last axis via log2(n) shift-adds.

  Pallas TPU has no cumsum lowering; the Hillis-Steele scan is pure VPU work
  (exact f32, unlike a bf16 MXU triangular matmul).
  """
  n = x.shape[-1]
  shift = 1
  while shift < n:
    shifted = jnp.concatenate(
        [jnp.zeros_like(x[..., :shift]), x[..., :-shift]], axis=-1)
    x = x + shifted
    shift *= 2
  return x


def _sample_intervals_kernel(t_ref, logits_ref, out_ref, *, num_samples,
                             domain):
  """One block of rays: logits -> CDF -> inverse-CDF samples -> fenceposts.

  Mosaic-shaped: every intermediate is lane-aligned width n (the bin count);
  the exclusive/inclusive CDF pair is built with roll + iota selects instead
  of unaligned concatenates, and the n+1-wide output is written with sliced
  stores (both concat-of-unaligned-lanes and [B,1,1]->3D broadcasts crash or
  mis-lower in the TPU backend).
  """
  t = t_ref[:, :]                  # [B, n+1]
  logits = logits_ref[:, :]        # [B, n]
  b, n = logits.shape

  # Stable softmax over bins; -inf logits (zero-width bins) contribute 0.
  mx = jnp.max(logits, axis=-1, keepdims=True)
  e = jnp.where(jnp.isfinite(logits), jnp.exp(logits - mx), 0.0)
  w = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), _EPS)

  # Exclusive/inclusive CDF bounds per bin, both width n:
  #   e_lo[i] = sum_{j<i} w_j (exactly 0 at i=0)
  #   e_hi[i] = sum_{j<=i} w_j (exactly 1 at i=n-1)
  c = jnp.minimum(1.0, _prefix_sum(w))                  # [B, n] inclusive
  lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
  c_roll = pltpu.roll(c, 1, 1)
  e_lo = jnp.where(lane == 0, 0.0, c_roll)
  e_hi = jnp.where(lane == n - 1, 1.0, c)

  t_lo = t[:, :-1]                                      # [B, n]
  t_hi = t[:, 1:]                                       # [B, n]

  # Deterministic-center positions in [0, 1) from a 2D iota.
  pad = 1.0 / (2 * num_samples)
  step = (1.0 - 2 * pad - _EPS) / max(1, num_samples - 1)
  idx = jax.lax.broadcasted_iota(
      jnp.int32, (b, num_samples), 1).astype(t.dtype)
  u = pad + step * idx                                   # [B, m]

  # Bracketing bin of each u via masked max/min reductions over the lane
  # (bin) axis; fills pre-broadcast to full lane width.
  mask_lo = u[:, :, None] >= e_lo[:, None, :]            # [B, m, n]
  mask_hi = u[:, :, None] < e_hi[:, None, :]

  fill_tlo = jnp.broadcast_to(t_lo[:, :1], t_lo.shape)
  fill_thi = jnp.broadcast_to(t_hi[:, -1:], t_hi.shape)
  zeros_n = jnp.zeros_like(e_lo)
  ones_n = jnp.ones_like(e_hi)

  fp0 = jnp.max(
      jnp.where(mask_lo, t_lo[:, None, :], fill_tlo[:, None, :]), axis=-1)
  xp0 = jnp.max(
      jnp.where(mask_lo, e_lo[:, None, :], zeros_n[:, None, :]), axis=-1)
  fp1 = jnp.min(
      jnp.where(mask_hi, t_hi[:, None, :], fill_thi[:, None, :]), axis=-1)
  xp1 = jnp.min(
      jnp.where(mask_hi, e_hi[:, None, :], ones_n[:, None, :]), axis=-1)

  denom = xp1 - xp0
  offset = jnp.clip(
      jnp.where(denom > 0, (u - xp0) / jnp.where(denom > 0, denom, 1.0), 0.0),
      0.0, 1.0)
  centers = fp0 + offset * (fp1 - fp0)                   # [B, m]

  # Centers -> fenceposts via sliced stores (out is m+1 wide).
  mid = 0.5 * (centers[:, 1:] + centers[:, :-1])         # [B, m-1]
  minval, maxval = domain
  first = jnp.maximum(minval, 2 * centers[:, :1] - mid[:, :1])
  last = jnp.minimum(maxval, 2 * centers[:, -1:] - mid[:, -1:])
  out_ref[:, 0:1] = first
  out_ref[:, 1:num_samples] = mid
  out_ref[:, num_samples:num_samples + 1] = last


@functools.partial(jax.jit, static_argnames=('num_samples', 'domain'))
def sample_intervals_pallas(t, logits, num_samples, domain=(0.0, 1.0)):
  """Drop-in for stepfun.sample_intervals(None, t, logits, m, domain=...).

  t: [B, n+1] sorted endpoints; logits: [B, n]; returns [B, m+1].
  Deterministic-center path only (the reference's shipped sampler).
  """
  if t.ndim != 2:
    raise ValueError(f'expected [B, n+1] endpoints, got {t.shape}')
  b = t.shape[0]
  padded_b = ((b + BLOCK_RAYS - 1) // BLOCK_RAYS) * BLOCK_RAYS
  if padded_b != b:
    pad = padded_b - b
    t = jnp.concatenate([t, jnp.repeat(t[-1:], pad, axis=0)], axis=0)
    logits = jnp.concatenate(
        [logits, jnp.repeat(logits[-1:], pad, axis=0)], axis=0)

  grid = (padded_b // BLOCK_RAYS,)
  out = pl.pallas_call(
      functools.partial(_sample_intervals_kernel, num_samples=num_samples,
                        domain=domain),
      out_shape=jax.ShapeDtypeStruct((padded_b, num_samples + 1), t.dtype),
      grid=grid,
      in_specs=[
          pl.BlockSpec((BLOCK_RAYS, t.shape[-1]), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((BLOCK_RAYS, logits.shape[-1]), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((BLOCK_RAYS, num_samples + 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
  )(t, logits)
  return out[:b]
