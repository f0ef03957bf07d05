"""Layer-fused trunk MLP (Pallas/TPU): forward + hand-derived backward.

The flagship train step is activation-traffic bound: the profiler shows ~200
XLA fusions per step, each re-reading [B*S, 256]-sized activations from HBM
(~270 MB each at batch 4096 x 128 samples). This kernel runs an entire dense
trunk (depth-N stack + periodic input-skip concat, reference
internal/models.py:569-584), optionally the density head and the
density-gradient chain (the inner reverse pass that yields Ref-NeRF's
analytic normals, reference internal/models.py:601-611), per sample block
with every activation resident in VMEM. The custom VJP recomputes
activations in VMEM (flash-attention style) and emits all first- AND
second-order parameter cotangents in one pass, so HBM traffic is just x, y,
u, the cotangents, and the (small) weights.

Second-order math. With masks-as-constant (exactly what AD of relu yields,
since relu'' = 0 a.e.):

    u  =  grad_x sigma  =  Wa_0^T D_0 Wa_1^T D_1 ... Wa_L^T w_d  (+ skip terms)

where D_i = diag(relu'(z_i)). Given a cotangent u_bar on u, define the
forward tangent chain p (a JVP of the trunk at tangent u_bar):

    p_in_0 = u_bar;   p_out_i = D_i (Wa_i p_in_i  [+ Wb_i u_bar at skips])

and let q_i be the inner-chain gradient at layer i's output (s_i = D_i q_i).
Then the only non-zero second-order cotangents are

    dWa_i += p_in_i^T s_i,    dWb_k += u_bar^T s_k,    dw_d += sum(p_out_L)

with no contribution to biases or x. tests/test_fused_mlp.py asserts
equality against jax.grad-of-jax.grad of the plain jnp formulation.

Canonical layout: all matmuls are (block, 128k) x (128k, width). The skip
concat is split into two matmuls (Wa over the running activation, Wb over
the trunk input) so every contraction dim stays a multiple of 128.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
  return ((x + m - 1) // m) * m


class TrunkCfg(NamedTuple):
  """Static kernel configuration (hashable; used as a cache key)."""
  depth: int
  width: int
  fin: int          # true input feature dim
  fpad: int         # padded input feature dim (lane-aligned)
  skip_inputs: Tuple[int, ...]  # layer indices whose input is [act, x]
  density: bool     # compute sigma = y . w_d (f32 head)
  density_grad: bool  # also compute u = d sigma / d x (inner reverse chain)
  needs_dx: bool    # backward emits d loss / d x
  cdt: str          # 'float32' | 'bfloat16' trunk compute dtype
  block: int
  interpret: bool


def skip_input_layers(depth: int, skip_period: int) -> Tuple[int, ...]:
  """Layers whose input is concat([activation, trunk_input]).

  Mirrors the trunk loop: after layer i (i % skip_period == 0, i > 0) the
  running activation is concatenated with the input, feeding layer i+1.
  """
  return tuple(i + 1 for i in range(depth)
               if i % skip_period == 0 and 0 < i and i + 1 < depth)


def _dot(a, b, dims):
  return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                             preferred_element_type=jnp.float32)


def _mask(a):
  """relu' mask as a {0,1} float of a's dtype.

  `a` is a post-relu activation (>= 0), so sign(a) is exactly the relu'
  mask. Mosaic on v5e supports neither bf16 vector compares nor some i1
  relayouts, so arithmetic masking (multiply by 0/1) replaces jnp.where.
  """
  return jnp.sign(a.astype(jnp.float32)).astype(a.dtype)


def _fwd_kernel(cfg: TrunkCfg, *refs):
  """Forward: x, was[L], wbs[S], bs, (wdT) -> y, (sig), (u)."""
  L, S = cfg.depth, len(cfg.skip_inputs)
  cdt = jnp.dtype(cfg.cdt)
  i = 0
  x_ref = refs[i]; i += 1
  was = refs[i:i + L]; i += L
  wbs = refs[i:i + S]; i += S
  bs_ref = refs[i]; i += 1
  wd_ref = None
  if cfg.density:
    wd_ref = refs[i]; i += 1
  y_ref = refs[i]; i += 1
  sig_ref = refs[i] if cfg.density else None
  i += int(cfg.density)
  u_ref = refs[i] if cfg.density_grad else None

  x = x_ref[:].astype(cdt)
  skip_ix = {l: k for k, l in enumerate(cfg.skip_inputs)}
  acts = []
  h = x
  for l in range(L):
    hb = _dot(h, was[l][:], ((1,), (0,)))
    if l in skip_ix:
      hb = hb + _dot(x, wbs[skip_ix[l]][:], ((1,), (0,)))
    z = hb.astype(cdt) + bs_ref[l:l + 1, :].astype(cdt)
    h = jnp.maximum(z, jnp.zeros_like(z))
    acts.append(h)
  y_ref[:] = h

  if cfg.density:
    wd = wd_ref[:]  # (1, width) f32
    y32 = h.astype(jnp.float32)
    sig_ref[:] = jnp.sum(y32 * wd, axis=-1, keepdims=True)

  if cfg.density_grad:
    blk = x.shape[0]
    u32 = jnp.zeros((blk, cfg.fpad), jnp.float32)
    q = jnp.broadcast_to(wd_ref[:], (blk, cfg.width)).astype(cdt)
    for l in reversed(range(L)):
      s = _mask(acts[l]) * q
      back = _dot(s, was[l][:], ((1,), (1,)))  # f32 (blk, in_dim)
      if l in skip_ix:
        u32 = u32 + _dot(s, wbs[skip_ix[l]][:], ((1,), (1,)))
        q = back.astype(cdt)
      elif l == 0:
        u32 = u32 + back
      else:
        q = back.astype(cdt)
    u_ref[:] = u32


def _bwd_kernel(cfg: TrunkCfg, *refs):
  """Backward: x, was, wbs, bs, (wdT), ybar, (sbar), (ubar)
  -> dwas[L], dwbs[S], dbs, (dwdT), (dx)."""
  L, S = cfg.depth, len(cfg.skip_inputs)
  cdt = jnp.dtype(cfg.cdt)
  i = 0
  x_ref = refs[i]; i += 1
  was = refs[i:i + L]; i += L
  wbs = refs[i:i + S]; i += S
  bs_ref = refs[i]; i += 1
  wd_ref = None
  if cfg.density:
    wd_ref = refs[i]; i += 1
  ybar_ref = refs[i]; i += 1
  sbar_ref = refs[i] if cfg.density else None
  i += int(cfg.density)
  ubar_ref = refs[i] if cfg.density_grad else None
  i += int(cfg.density_grad)
  dwas = refs[i:i + L]; i += L
  dwbs = refs[i:i + S]; i += S
  dbs_ref = refs[i]; i += 1
  dwd_ref = None
  if cfg.density:
    dwd_ref = refs[i]; i += 1
  dx_ref = refs[i] if cfg.needs_dx else None

  @pl.when(pl.program_id(0) == 0)
  def _init():
    for r in (*dwas, *dwbs, dbs_ref) + ((dwd_ref,) if cfg.density else ()):
      r[:] = jnp.zeros_like(r)

  skip_ix = {l: k for k, l in enumerate(cfg.skip_inputs)}
  x = x_ref[:].astype(cdt)
  blk = x.shape[0]

  # 1. Recompute the forward activations (VMEM-resident).
  acts = []
  h = x
  for l in range(L):
    hb = _dot(h, was[l][:], ((1,), (0,)))
    if l in skip_ix:
      hb = hb + _dot(x, wbs[skip_ix[l]][:], ((1,), (0,)))
    z = hb.astype(cdt) + bs_ref[l:l + 1, :].astype(cdt)
    h = jnp.maximum(z, jnp.zeros_like(z))
    acts.append(h)

  # 2. Recompute the inner chain s_i = D_i q_i (second-order needs them).
  ss = [None] * L
  if cfg.density_grad:
    q = jnp.broadcast_to(wd_ref[:], (blk, cfg.width)).astype(cdt)
    for l in reversed(range(L)):
      s = _mask(acts[l]) * q
      ss[l] = s
      if l > 0:
        q = _dot(s, was[l][:], ((1,), (1,))).astype(cdt)

  # 3. First-order reverse pass from (ybar, sbar).
  g = ybar_ref[:].astype(cdt)
  if cfg.density:
    sbar = sbar_ref[:]  # (blk, 1) f32
    g = g + (sbar * wd_ref[:]).astype(cdt)
    # dw_d (first-order): sum_n sbar_n * y_n.
    y32 = acts[-1].astype(jnp.float32)
    dwd_ref[:] += _dot(sbar, y32, ((0,), (0,)))
  dx32 = jnp.zeros((blk, cfg.fpad), jnp.float32) if cfg.needs_dx else None
  for l in reversed(range(L)):
    zeta = _mask(acts[l]) * g
    inp = x if l == 0 else acts[l - 1]
    dwas[l][:] += _dot(inp, zeta, ((0,), (0,)))
    if l in skip_ix:
      dwbs[skip_ix[l]][:] += _dot(x, zeta, ((0,), (0,)))
    dbs_ref[l:l + 1, :] += jnp.sum(
        zeta, axis=0, keepdims=True).astype(jnp.float32)
    back = _dot(zeta, was[l][:], ((1,), (1,)))
    if l in skip_ix and cfg.needs_dx:
      dx32 = dx32 + _dot(zeta, wbs[skip_ix[l]][:], ((1,), (1,)))
    if l == 0:
      if cfg.needs_dx:
        dx32 = dx32 + back
    else:
      g = back.astype(cdt)
  if cfg.needs_dx:
    dx_ref[:] = dx32

  # 4. Second-order pass from ubar: forward tangent chain p.
  if cfg.density_grad:
    ubar = ubar_ref[:].astype(cdt)
    p = ubar
    for l in range(L):
      t = _dot(p, was[l][:], ((1,), (0,)))
      dwas[l][:] += _dot(p, ss[l], ((0,), (0,)))
      if l in skip_ix:
        t = t + _dot(ubar, wbs[skip_ix[l]][:], ((1,), (0,)))
        dwbs[skip_ix[l]][:] += _dot(ubar, ss[l], ((0,), (0,)))
      p = _mask(acts[l]) * t.astype(cdt)
    dwd_ref[:] += jnp.sum(p, axis=0, keepdims=True).astype(jnp.float32)


def _full_spec(shape):
  return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                      memory_space=pltpu.VMEM)


def _row_spec(blk, ncol):
  return pl.BlockSpec((blk, ncol), lambda i: (i, 0), memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _make_op(cfg: TrunkCfg):
  """Builds the custom-VJP fused trunk for one static configuration.

  Canonical signature (all f32, shapes pre-padded):
    op(x [B, fpad], was tuple, wbs tuple, bs [L, width], wdT [1, width]|None)
  -> (y [B, width] in cdt, sig [B, 1] f32?, u [B, fpad] f32?)
  """
  L, S, W = cfg.depth, len(cfg.skip_inputs), cfg.width
  cdt = jnp.dtype(cfg.cdt)

  wa_shapes = [(cfg.fpad if l == 0 else W, W) for l in range(L)]
  wb_shapes = [(cfg.fpad, W)] * S

  def _cast(t):
    return jax.tree.map(lambda a: a.astype(cdt), t)

  def _fwd(x, was, wbs, bs, wdT):
    b = x.shape[0]
    grid = (b // cfg.block,)
    out_shape = [jax.ShapeDtypeStruct((b, W), cdt)]
    out_specs = [_row_spec(cfg.block, W)]
    if cfg.density:
      out_shape.append(jax.ShapeDtypeStruct((b, 1), jnp.float32))
      out_specs.append(_row_spec(cfg.block, 1))
    if cfg.density_grad:
      out_shape.append(jax.ShapeDtypeStruct((b, cfg.fpad), jnp.float32))
      out_specs.append(_row_spec(cfg.block, cfg.fpad))
    in_specs = ([_row_spec(cfg.block, cfg.fpad)]
                + [_full_spec(s) for s in wa_shapes]
                + [_full_spec(s) for s in wb_shapes]
                + [_full_spec((L, W))]
                + ([_full_spec((1, W))] if cfg.density else []))
    args = (x, *_cast(was), *_cast(wbs), _cast(bs)) + (
        (wdT,) if cfg.density else ())
    flops_pass = 2 * b * sum(np.prod(s) for s in wa_shapes + wb_shapes)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=cfg.interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(flops_pass * (2 if cfg.density_grad else 1)),
            bytes_accessed=int(x.size * 4 * 3), transcendentals=0),
    )(*args)
    return tuple(outs)

  def _bwd(x, was, wbs, bs, wdT, ybar, sbar, ubar):
    b = x.shape[0]
    grid = (b // cfg.block,)
    out_shape = ([jax.ShapeDtypeStruct(s, jnp.float32) for s in wa_shapes]
                 + [jax.ShapeDtypeStruct(s, jnp.float32) for s in wb_shapes]
                 + [jax.ShapeDtypeStruct((L, W), jnp.float32)])
    out_specs = ([_full_spec(s) for s in wa_shapes]
                 + [_full_spec(s) for s in wb_shapes]
                 + [_full_spec((L, W))])
    if cfg.density:
      out_shape.append(jax.ShapeDtypeStruct((1, W), jnp.float32))
      out_specs.append(_full_spec((1, W)))
    if cfg.needs_dx:
      out_shape.append(jax.ShapeDtypeStruct((b, cfg.fpad), jnp.float32))
      out_specs.append(_row_spec(cfg.block, cfg.fpad))
    in_specs = ([_row_spec(cfg.block, cfg.fpad)]
                + [_full_spec(s) for s in wa_shapes]
                + [_full_spec(s) for s in wb_shapes]
                + [_full_spec((L, W))]
                + ([_full_spec((1, W))] if cfg.density else [])
                + [_row_spec(cfg.block, W)]
                + ([_row_spec(cfg.block, 1)] if cfg.density else [])
                + ([_row_spec(cfg.block, cfg.fpad)]
                   if cfg.density_grad else []))
    args = ((x, *_cast(was), *_cast(wbs), _cast(bs))
            + ((wdT,) if cfg.density else ())
            + (ybar,)
            + ((sbar,) if cfg.density else ())
            + ((ubar,) if cfg.density_grad else ()))
    flops_pass = 2 * b * sum(np.prod(s) for s in wa_shapes + wb_shapes)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=cfg.interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(flops_pass * (6 if cfg.density_grad else 4)),
            bytes_accessed=int(x.size * 4 * 4), transcendentals=0),
    )(*args)
    i = 0
    dwas = tuple(outs[i:i + L]); i += L
    dwbs = tuple(outs[i:i + S]); i += S
    dbs = outs[i]; i += 1
    dwdT = None
    if cfg.density:
      dwdT = outs[i]; i += 1
    dx = outs[i] if cfg.needs_dx else jnp.zeros_like(x)
    return dx, dwas, dwbs, dbs, dwdT

  @jax.custom_vjp
  def op(x, was, wbs, bs, wdT):
    return _fwd(x, was, wbs, bs, wdT)

  def op_fwd(x, was, wbs, bs, wdT):
    return _fwd(x, was, wbs, bs, wdT), (x, was, wbs, bs, wdT)

  def op_bwd(res, cots):
    x, was, wbs, bs, wdT = res
    cots = list(cots)
    ybar = cots.pop(0)
    sbar = cots.pop(0) if cfg.density else None
    ubar = cots.pop(0) if cfg.density_grad else None
    dx, dwas, dwbs, dbs, dwdT = _bwd(x, was, wbs, bs, wdT,
                                     ybar, sbar, ubar)
    return dx, dwas, dwbs, dbs, dwdT

  op.defvjp(op_fwd, op_bwd)
  return op


def reference_trunk(x, kernels, biases, wd=None, bd=None, *,
                    skip_period=4, density_grad=False,
                    compute_dtype='float32'):
  """Pure-jnp mirror of the fused op, flax-Dense numerics (for tests).

  kernels[i]: (in_dim, width) with the skip layer's in_dim = width + fin.
  Returns (y, sigma, u) / (y, sigma) / y depending on heads requested.
  """
  cdt = jnp.dtype(compute_dtype)
  skips = skip_input_layers(len(kernels), skip_period)

  def trunk_sigma(x0):
    h = x0.astype(cdt)
    for l, (w, b) in enumerate(zip(kernels, biases)):
      if l in skips:
        h = jnp.concatenate([h, x0.astype(cdt)], axis=-1)
      h = (jnp.dot(h, w.astype(cdt)) + b.astype(cdt))
      h = jnp.maximum(h, 0)
    y = h
    if wd is None:
      return None, y
    sig = jnp.dot(y.astype(jnp.float32), wd)[..., 0] + (
        0.0 if bd is None else bd[0])
    return sig, y

  sig, y = trunk_sigma(x)
  if wd is None:
    return y
  if not density_grad:
    return y, sig
  def ssum(x0):
    s, y0 = trunk_sigma(x0)
    return s.sum(), y0
  u, _ = jax.grad(ssum, has_aux=True)(x)
  return y, sig, u


def fused_trunk(x, kernels, biases, wd=None, bd=None, *,
                skip_period=4, density_grad=False, needs_dx=False,
                compute_dtype='float32', block=512, interpret=None):
  """Fused trunk entry point on flax-shaped parameters.

  Args:
    x: [..., fin] f32 input encoding.
    kernels: list of layer kernels; the skip layer's shape is
      (width + fin, width) with the activation rows first (concat order).
    biases: list of (width,) biases.
    wd, bd: optional density head (width, 1) kernel and (1,) bias; enables
      the sigma output, and (with density_grad) the u = d sigma/d x output.
    density_grad: compute the inner gradient chain (Ref-NeRF normals).
    needs_dx: emit d loss / d x in the backward pass.
    compute_dtype: trunk matmul dtype ('float32' | 'bfloat16').
    block: samples per VMEM block.
    interpret: force Pallas interpreter mode (defaults to CPU backend).

  Returns:
    y [..., width], and with a head (sigma [...], u [..., fin]).
  """
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  depth = len(kernels)
  width = kernels[-1].shape[-1]
  fin = x.shape[-1]
  fpad = _round_up(fin, 128)
  skips = skip_input_layers(depth, skip_period)
  cfg = TrunkCfg(depth=depth, width=width, fin=fin, fpad=fpad,
                 skip_inputs=skips, density=wd is not None,
                 density_grad=density_grad and wd is not None,
                 needs_dx=needs_dx, cdt=compute_dtype, block=block,
                 interpret=bool(interpret))

  lead = x.shape[:-1]
  n = int(np.prod(lead)) if lead else 1
  npad = _round_up(max(n, 1), block)
  xf = x.reshape(n, fin).astype(jnp.float32)
  xf = jnp.pad(xf, ((0, npad - n), (0, fpad - fin)))

  was, wbs = [], []
  for l, w in enumerate(kernels):
    w = w.astype(jnp.float32)
    if l in skips:
      was.append(w[:width])
      wbs.append(jnp.pad(w[width:], ((0, fpad - fin), (0, 0))))
    elif l == 0:
      was.append(jnp.pad(w, ((0, fpad - fin), (0, 0))))
    else:
      was.append(w)
  bs = jnp.stack([b.astype(jnp.float32) for b in biases])
  wdT = None if wd is None else wd.astype(jnp.float32).reshape(1, width)

  outs = _make_op(cfg)(xf, tuple(was), tuple(wbs), bs, wdT)
  y = outs[0][:n].reshape(*lead, width)
  if wd is None:
    return y
  sig = outs[1][:n, 0].reshape(lead) + (
      0.0 if bd is None else bd.astype(jnp.float32)[0])
  if not cfg.density_grad:
    return y, sig
  u = outs[2][:n, :fin].reshape(*lead, fin)
  return y, sig, u
