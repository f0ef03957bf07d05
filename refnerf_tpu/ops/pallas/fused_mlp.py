"""Layer-fused trunk MLPs (Pallas/TPU): forward + hand-derived backward.

The flagship train step is activation-traffic bound: each XLA fusion
re-reads [B*S, 256]-sized activations from HBM (~270 MB at batch 4096 x 128
samples). These kernels run an entire dense trunk (depth-N stack + periodic
input-skip concat, reference internal/models.py:569-584) per sample block
with every intermediate resident in VMEM:

- **Segmented input**: the trunk input arrives as separate tensors
  (bottleneck / directional encoding / n.v, or the sin/cos halves of the
  IPE); the first layer's and each skip layer's weights are row-split per
  segment, so the XLA-side concatenate (and its pad+maximum transpose) never
  materializes.
- **Compact IPE** (`encode` + `uproj`): the IPE trunk reads only the lifted
  means/vars ([block, n_basis] f32 - 16x less HBM than the encoding at
  deg 16). The per-degree scale expansion is an in-kernel matmul against
  the scale-fold operand S (m_scaled = lm @ S^T; S[d*nb+j, j] = scale_d),
  the trig encoding xs = exp(-v/2)sin(m), xc = exp(-v/2)cos(m) runs on the
  VPU (reference internal/coord.py integrated_pos_enc), and the density
  gradient folds the chain rule d sigma/d m = e(cos*u_xs - sin*u_xc) plus
  the scales back through S, leaving as d sigma/d lifted-means
  ([block, n_basis]); the second-order cotangent arrives equally compact.
  XLA-side this kills both the deg-major reshape (lane-unaligned -> full
  relayout copies) and the f32 scaled-stats materialization. Sample
  positions are stop-gradient in the model (resampling detaches sdist), so
  lm/lv carry no cotangents.
- **In-kernel heads**: the density head, an f32 head block (grad_pred /
  roughness / diffuse / tint / specular-density, or the dir trunk's rgb
  head), and a compute-dtype head block (the bottleneck) are evaluated on
  the final feature vector inside the kernel, so the 256-wide features
  never hit HBM at all.
- **Density-gradient chain** (`density_grad`): the inner reverse pass that
  yields Ref-NeRF's analytic normals (reference internal/models.py:601-611)
  runs in the same kernel.
- **Compositing epilogue** (`weights`): sigma -> transmittance weights via
  a block-diagonal strictly-lower-triangular MXU matmul (rows are
  ray-major); sigma never leaves VMEM and the epilogue tensors move as
  [rays, samples] tiles (reference internal/render.py:132-149).
- **In-kernel IDE** (`ide`, optionally `ide_geo`): the integrated
  directional encoding - and with geo, the normalize/reflect/n.v geometry
  feeding it - computes in VMEM from refdirs/kappa_inv (or raw
  grad_pred/viewdirs), with a closed-form complex-power backward
  (reference internal/ref_utils.py:96-151).
- **Color epilogue** (`rgbe`): the Ref-NeRF diffuse/tint/srgb chain after
  the rgb head, backed by jax.vjp in-kernel for exact AD tie semantics
  (reference internal/models.py:715-745).

The custom VJP recomputes activations in VMEM (flash-attention style) and
emits all first- AND second-order parameter cotangents in one pass.

Second-order math. With relu masks constant (exactly what AD yields, since
relu'' = 0 a.e.):

    u = grad_m sigma = E' . (W0^T D_0 ... WL^T w_d  (+ skip terms))

where D_i = diag(relu'(z_i)) and E' is the (diagonal, m-independent for
parameter purposes) encoding Jacobian. Given a cotangent u_bar, inject the
tangent t = E'^T u_bar at every input-consuming layer and run the forward
tangent chain p (p_out_i = D_i (Wa_i p_in_i + Wb_i t at skips)); with s_i
the inner-chain cotangents (s_i = D_i q_i), the only non-zero second-order
cotangents are

    dWa_i += p_in_i^T s_i,   dWb_k += t^T s_k,   dw_d += sum(p_out_L)

with no contribution to biases. tests/test_fused_mlp.py asserts equality
against jax.grad-of-jax.grad of the plain jnp formulation.

v5e Mosaic quirks worked around here: no bf16 vector compares and broken i1
relayouts (relu' masks are sign() products); explicit lane padding is
avoided (Mosaic masks partial lane tiles internally).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

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
  seg_dims: Tuple[int, ...]  # input segment widths (IPE mode: (F, F))
  skip_inputs: Tuple[int, ...]  # layer indices whose input is [act, segs]
  encode: bool      # inputs are compact (lm, lv); expand + trig in-kernel
  uproj: int        # >0: segments are IPE (xs, xc); emit the projected
                    # density gradient d sigma/d lifted-means, this wide
  density: bool     # compute sigma = y . w_d (f32 head)
  density_grad: bool  # also emit the density gradient
  h_f32: int        # f32 head block output width (0 = none)
  h_cdt: int        # compute-dtype head block output width (0 = none)
  out_y: bool       # emit the final feature vector
  needs_dx: bool    # backward emits per-segment d loss / d segment
  cdt: str          # 'float32' | 'bfloat16' trunk compute dtype
  block: int
  interpret: bool
  weights: int = 0  # >0: samples per ray; fuse the alpha-compositing
                    # epilogue (sigma -> transmittance weights) in-kernel.
                    # Requires density and block % weights == 0 so every
                    # VMEM block holds whole rays (rows are ray-major).
  rgbe: bool = False  # fuse the Ref-NeRF rgb epilogue (sigmoid specular x
                    # sigmoid tint + sigmoid diffuse, max-normalize,
                    # linear_to_srgb, clip, padding - mlp.py:491-518,
                    # reference internal/models.py:715-745) after the f32
                    # rgb head. Adds raw-diffuse/raw-tint inputs and a
                    # final-rgb output; the backward uses jax.vjp on the
                    # same chain in-kernel, so clip/max tie semantics match
                    # XLA AD exactly.
  rgbe_premult: float = 1.0
  rgbe_bias: float = 0.0
  rgbe_pad: float = 0.0
  ide: int = 0      # >0: deg_view of an in-kernel integrated directional
                    # encoding. The segment pair at (ide_at, ide_at + 1)
                    # (the re/im IDE halves, P wide each) is computed in
                    # VMEM from two inputs that replace it positionally:
                    # refdirs [blk, 3] and kappa_inv [blk, 1]
                    # (ref_utils.generate_ide_fn semantics). needs_dx emits
                    # d/d refdirs and d/d kappa_inv via the closed-form
                    # complex-power derivative d(x+iy)^m = m (x+iy)^(m-1).
  ide_at: int = -1  # index of the first IDE segment in seg_dims
  ide_geo: bool = False  # with `ide`: the directional geometry also moves
                    # in-kernel. Inputs at (ide_at, ide_at+1, ide_at+2)
                    # are grad [blk,3] (the unnormalized normal vector,
                    # e.g. grad_pred), viewdirs [blk,3], kappa_inv
                    # [blk,1]; the kernel computes n = -l2_normalize(grad),
                    # refdirs = reflect(-viewdirs, n), and fills the
                    # trailing width-1 n.v segment. Backward via jax.vjp
                    # on the same chain (exact XLA-AD semantics).
  h_t: bool = False  # f32 head output leaves feature-major [h_f32, N]: a
                    # narrow [N, h] row-major output tiles T(8,128) at
                    # 128/h x physical padding in HBM and its consumers
                    # relayout to feature planes anyway (~0.4 ms/copy at
                    # batch 4096x128 on v5e); [h, N] is dense and the
                    # plane reshape is free. Incompatible with rgbe (which
                    # consumes the row-major head in-kernel).


def skip_input_layers(depth: int, skip_period: int) -> Tuple[int, ...]:
  """Layers whose input is concat([activation, trunk_input]).

  Mirrors the trunk loop: after layer i (i % skip_period == 0, i > 0) the
  running activation is concatenated with the input, feeding layer i+1.
  """
  return tuple(i + 1 for i in range(depth)
               if i % skip_period == 0 and 0 < i and i + 1 < depth)


def _dot(a, b, dims, precision=None):
  return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=precision)


def _dot_exact(a, b, dims):
  """f32-exact dot for the epilogue's mask/regroup matmuls.

  Default MXU precision truncates f32 operands to bf16 per pass; the
  compositing prefix/suffix sums and the one-hot regroup claim bitwise
  f32 exactness, so they must run at HIGHEST (full f32 multi-pass).
  """
  return _dot(a, b, dims, precision=jax.lax.Precision.HIGHEST)


def _mask(a):
  """relu' mask as a {0,1} float of a's dtype.

  `a` is a post-relu activation (>= 0), so sign(a) is exactly the relu'
  mask. Mosaic on v5e supports neither bf16 vector compares nor some i1
  relayouts, so arithmetic masking (multiply by 0/1) replaces jnp.where.
  """
  return jnp.sign(a.astype(jnp.float32)).astype(a.dtype)


def _f32(a):
  return a.astype(jnp.float32)


_TRIG_T = float(100 * np.pi)


def _safe_trig_arg(x, t=_TRIG_T):
  """Mod large args into [-t, t) before sin/cos (mathx.safe_trig_helper).

  At max_deg_point=16 the scaled means reach ~2^15·|mean| >> 100pi; TPU
  sin/cos can NaN out there, and the plain path (coord.integrated_pos_enc
  -> mathx.safe_sin) range-reduces, so the fused path must match. The
  reduction is gradient-transparent (d(x mod t)/dx = 1 a.e.), so the
  manual cos/sin chain rule in the kernels stays exact.
  """
  return jnp.where(jnp.abs(x) < t, x, x % t)


# Width-1 segments (the n.v scalar) are outer products, not matmuls; route
# them through the VPU in f32 (numerically identical to an f32-accumulated
# single-product dot).

def _seg_dot(a, w):
  """(blk, d) @ (d, W) -> f32 (blk, W)."""
  if w.shape[0] == 1:
    return _f32(a) * _f32(w[0:1, :])
  return _dot(a, w, ((1,), (0,)))


def _seg_dot_t(s, w):
  """(blk, W) @ (d, W)^T -> f32 (blk, d)."""
  if w.shape[0] == 1:
    return jnp.sum(_f32(s) * _f32(w[0:1, :]), axis=-1, keepdims=True)
  return _dot(s, w, ((1,), (1,)))


def _seg_outer(seg, zeta):
  """(blk, d)^T @ (blk, W) -> f32 (d, W)."""
  if seg.shape[-1] == 1:
    return jnp.sum(_f32(seg) * _f32(zeta), axis=0, keepdims=True)
  return _dot(seg, zeta, ((0,), (0,)))


class _Refs:
  """Positional-ref parser shared by the fwd and bwd kernels."""

  def __init__(self, cfg: TrunkCfg, refs):
    self.cfg = cfg
    self._refs = refs
    self._i = 0

  def take(self, n=None):
    if n is None:
      r = self._refs[self._i]
      self._i += 1
      return r
    r = self._refs[self._i:self._i + n]
    self._i += n
    return r


def _parse_inputs(cfg: TrunkCfg, rr: _Refs):
  """Input refs in canonical order; returns a dict of refs."""
  L, S, G = cfg.depth, len(cfg.skip_inputs), len(cfg.seg_dims)
  d = {}
  if cfg.encode:
    d['lm'] = rr.take()
    d['lv'] = rr.take()
  else:
    d['segs'] = rr.take(G)
  d['w0s'] = rr.take(G)        # layer-0 weights, one per segment
  d['was'] = rr.take(L - 1)    # layers 1..L-1, activation part
  d['wbs'] = rr.take(S * G)    # skip layers x segments
  d['bs'] = rr.take()          # (L, width)
  if cfg.density:
    d['wd'] = rr.take()        # (1, width) f32
  if cfg.h_f32:
    d['wh'] = rr.take()        # (width, h_f32) f32
    d['bh'] = rr.take()        # (1, h_f32) f32; (h_f32, 1) when cfg.h_t
  if cfg.h_cdt:
    d['wc'] = rr.take()        # (width, h_cdt) cdt
    d['bc'] = rr.take()        # (1, h_cdt) cdt
  if cfg.uproj:
    d['su'] = rr.take()        # (F, uproj) f32 scale-fold projection
  if cfg.ide:
    d['mat'] = rr.take()       # (l_max+1, P) f32 SH z-coefficients
    d['sg'] = rr.take()        # (1, P) f32 vMF attenuation sigmas
    d['gm'] = rr.take()        # (l_max+1, P) {0,1} power-gather matrix
  if cfg.weights:
    d['delta'] = rr.take()     # (block, 1) f32 per-sample t-interval * |dir|
                               # column (ray-major, samples-minor)
    d['bsig'] = rr.take()      # (1, 1) f32 density-head + activation bias
  if cfg.rgbe:
    d['rawd'] = rr.take()      # (blk, 3) f32 raw diffuse color
    d['rawt'] = rr.take()      # (blk, 3) f32 raw specular tint
  return d


def _rgb_epilogue(cfg: TrunkCfg, raw, rawd, rawt):
  """The Ref-NeRF color epilogue, f32, mirroring mlp.py:491-518 exactly
  (reference internal/models.py:715-745): sigmoid specular x sigmoid tint
  + sigmoid diffuse, max-normalize into gamut, linear_to_srgb, clip,
  rgb_padding. Used by the fwd kernel directly and by the bwd kernel via
  jax.vjp (exact XLA-AD tie semantics for the max/clip subgradients, which
  ARE hit at every gamut-normalized sample)."""
  rgb = jax.nn.sigmoid(cfg.rgbe_premult * raw + cfg.rgbe_bias)
  diffuse_linear = jax.nn.sigmoid(rawd - np.float32(np.log(3.0)))
  tint = jax.nn.sigmoid(rawt)
  specular_linear = tint * rgb
  rgb = specular_linear + diffuse_linear
  rgb_norm = jnp.maximum(rgb.max(axis=-1, keepdims=True),
                         jnp.ones_like(rgb[..., :1]))
  rgb = rgb / rgb_norm
  rgb = jnp.clip(_linear_to_srgb(rgb), 0.0, 1.0)
  return rgb * (1 + 2 * cfg.rgbe_pad) - cfg.rgbe_pad


_SRGB_EPS = float(np.finfo(np.float32).eps)


def _linear_to_srgb(linear):
  """ops/image.py:37 linear_to_srgb, inlined (identical ops/constants)."""
  srgb0 = 323 / 25 * linear
  srgb1 = (211 * jnp.maximum(_SRGB_EPS, linear)**(5 / 12) - 11) / 200
  return jnp.where(linear <= 0.0031308, srgb0, srgb1)


def _in_dims(cfg: TrunkCfg) -> Tuple[int, ...]:
  """Per-input trailing dims: seg widths, with the IDE segment pair
  positionally replaced by its raw inputs (refdirs 3, kappa_inv 1; geo
  mode: grad 3, viewdirs 3, kappa_inv 1 over three slots)."""
  if not cfg.ide:
    return cfg.seg_dims
  dims = list(cfg.seg_dims)
  if cfg.ide_geo:
    dims[cfg.ide_at] = 3
    dims[cfg.ide_at + 1] = 3
    dims[cfg.ide_at + 2] = 1
  else:
    dims[cfg.ide_at] = 3
    dims[cfg.ide_at + 1] = 1
  return tuple(dims)


def _onehot_row(i, k):
  """[1, k] f32 one-hot at column i, generated in-kernel (pallas kernels
  may not capture array constants; iota + where is the Mosaic-safe idiom,
  cf. _scan_mask)."""
  lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
  return jnp.where(lane == i, jnp.float32(1), jnp.float32(0))


def _cols_to_stack(cols):
  """Stack [blk, 1] columns into [blk, K] by a one-hot FMA chain.

  Mosaic-friendly alternative to a minor-axis concatenate: each step is a
  [blk, 1] x [1, K] broadcast multiply-add (K <= 17 here - trivial VPU
  work), with no lane relayouts.
  """
  k = len(cols)
  out = None
  for i, c in enumerate(cols):
    t = c * _onehot_row(i, k)
    out = t if out is None else out + t
  return out


_L2N_EPS = float(np.finfo(np.float32).eps)


def _dir_geometry(grad, v):
  """(refdirs, n.v) from the unnormalized normal vector and viewdirs.

  Mirrors the model exactly (mlp.py: normals = -ref_utils.l2_normalize(g),
  refdirs = ref_utils.reflect(-viewdirs, normals), dotprod = sum(n * v)).
  """
  n = -grad / jnp.sqrt(
      jnp.maximum(jnp.sum(grad * grad, axis=-1, keepdims=True), _L2N_EPS))
  mv = -v
  r = 2.0 * jnp.sum(n * mv, axis=-1, keepdims=True) * n - mv
  nd = jnp.sum(n * v, axis=-1, keepdims=True)
  return r, nd


def _ide_raw_inputs(cfg: TrunkCfg, d):
  """(refdirs, kappa_inv, geo_primals) from the raw input refs."""
  if cfg.ide_geo:
    gp = _f32(d['segs'][cfg.ide_at][:])
    v = _f32(d['segs'][cfg.ide_at + 1][:])
    ki = _f32(d['segs'][cfg.ide_at + 2][:])
    rd, _ = _dir_geometry(gp, v)
    return rd, ki, (gp, v)
  rd = _f32(d['segs'][cfg.ide_at][:])       # [blk, 3] refdirs
  ki = _f32(d['segs'][cfg.ide_at + 1][:])   # [blk, 1] kappa_inv
  return rd, ki, None


def _ide_powers(cfg: TrunkCfg, rd, ki):
  """Running-product power columns for the in-kernel IDE.

  Returns (z, ki, vmz_cols, re_cols, im_cols): vmz_cols[k] = z^k and
  (re+i im)_cols[m] = (x+iy)^m as [blk, 1] f32 columns, k,m in
  [0, l_max]. Mirrors ref_utils.generate_ide_fn's recurrences.
  """
  x, y, z = rd[:, 0:1], rd[:, 1:2], rd[:, 2:3]
  l_max = 2 ** (cfg.ide - 1)
  vmz_cols = [jnp.ones_like(z)]
  re_cols = [jnp.ones_like(x)]
  im_cols = [jnp.zeros_like(x)]
  for _ in range(l_max):
    vmz_cols.append(vmz_cols[-1] * z)
    re_p, im_p = re_cols[-1], im_cols[-1]
    re_cols.append(re_p * x - im_p * y)
    im_cols.append(re_p * y + im_p * x)
  return z, ki, vmz_cols, re_cols, im_cols


def _ide_fwd(cfg: TrunkCfg, d, rd, ki):
  """In-kernel IDE: (re_ide, im_ide) [blk, P] f32 + backward residuals.

  re_ide + i im_ide = (x+iy)^m * (sum_k c_k z^k) * exp(-sigma kappa_inv)
  per (m, l) harmonic (ref_utils.py generate_ide_fn, reference
  internal/ref_utils.py:96-151). The power gathers and the z-polynomial
  contraction run as [blk, l_max+1] @ [l_max+1, P] MXU dots.
  """
  z, ki, vmz_cols, re_cols, im_cols = _ide_powers(cfg, rd, ki)
  vmz = _cols_to_stack(vmz_cols)
  re_st = _cols_to_stack(re_cols)
  im_st = _cols_to_stack(im_cols)
  zp = _dot(vmz, d['mat'][:], ((1,), (0,)))
  rev = _dot(re_st, d['gm'][:], ((1,), (0,)))
  imv = _dot(im_st, d['gm'][:], ((1,), (0,)))
  at = jnp.exp(-ki * d['sg'][:])            # [blk,1] x [1,P] broadcast
  zpat = zp * at
  aux = (rev, imv, zp, at, vmz_cols, re_cols, im_cols)
  return rev * zpat, imv * zpat, aux


def _ide_bwd(cfg: TrunkCfg, d, aux, g_re, g_im):
  """Closed-form IDE input cotangents: (d_refdirs [blk,3], d_ki [blk,1]).

  d Re((x+iy)^m)/dx = m Re^(m-1), /dy = -m Im^(m-1);
  d Im((x+iy)^m)/dx = m Im^(m-1), /dy = m Re^(m-1);
  d z^k/dz = k z^(k-1); d atten/d kappa_inv = -sigma * atten.
  Oracle: tests/test_fused_mlp.py IDE cases vs jax.grad of
  ref_utils.generate_ide_fn.
  """
  rev, imv, zp, at, vmz_cols, re_cols, im_cols = aux
  lm1 = 2 ** (cfg.ide - 1) + 1
  zpat = zp * at
  gmix = g_re * rev + g_im * imv
  # kappa_inv: -(sum over P of (g.ide) * sigma).
  d_ki = -_dot(gmix * zpat, d['sg'][:], ((1,), (1,)))
  # z-polynomial chain back to the power stacks.
  d_zp = gmix * at
  d_vmz = _dot(d_zp, d['mat'][:], ((1,), (1,)))
  d_re_st = _dot(g_re * zpat, d['gm'][:], ((1,), (1,)))
  d_im_st = _dot(g_im * zpat, d['gm'][:], ((1,), (1,)))
  # Shifted stacks (col m holds power m-1; col 0 is zero) x the power index.
  # Mosaic's tpu.iota is integer-only, and its canonicalizer folds
  # convert(int-iota) straight back into an (illegal) f32 tpu.iota - so the
  # f32 ramp [0, 1, ..., lm1-1] is built convert-free from scalar-constant
  # FMAs over one-hot rows (the _cols_to_stack idiom; lm1 <= 17).
  mar = jnp.zeros((1, lm1), jnp.float32)
  for m in range(1, lm1):
    mar = mar + jnp.float32(m) * _onehot_row(m, lm1)
  zero = jnp.zeros_like(vmz_cols[0])
  vmz_s = _cols_to_stack([zero] + vmz_cols[:-1])
  re_s = _cols_to_stack([zero] + re_cols[:-1])
  im_s = _cols_to_stack([zero] + im_cols[:-1])
  d_x = jnp.sum((d_re_st * re_s + d_im_st * im_s) * mar, -1, keepdims=True)
  d_y = jnp.sum((d_im_st * re_s - d_re_st * im_s) * mar, -1, keepdims=True)
  d_z = jnp.sum(d_vmz * vmz_s * mar, -1, keepdims=True)
  d_rd = (d_x * _onehot_row(0, 3) + d_y * _onehot_row(1, 3)
          + d_z * _onehot_row(2, 3))
  return d_rd, d_ki


def _scan_mask(cfg: TrunkCfg):
  """[S, S] strictly-lower sample mask for the transmittance scan.

  The epilogue math runs ray-major [rays, S] (S = samples on the lane
  axis: full VPU lanes), so the per-ray exclusive prefix sum over samples
  is the MXU matmul dd @ L^T with L[i, j] = 1 iff j < i, and the
  backward's suffix sum is x @ L (reference compositing:
  internal/render.py:132-149; oracle: tests/test_epilogue_design.py).
  """
  s = cfg.weights
  row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
  col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
  return jnp.where(col < row, jnp.float32(1), jnp.float32(0))


def _tile_to_col(cfg: TrunkCfg, t):
  """[block/S, S] ray-major tile -> the row-major [block, 1] column.

  Mosaic's shape cast can't flatten lanes into sublanes, so the regroup
  runs as a ray-selection matmul ([block, R] one-hot @ tile -> each row
  holds its ray's S samples) followed by a lane pick (iota mask + lane
  reduction). Exact: the f32 MXU pass multiplies by exact 1.0/0.0 one-hot
  entries (the bf16 3-way f32 split is lossless).
  """
  s = cfg.weights
  r = cfg.block // s
  rows = jax.lax.broadcasted_iota(jnp.int32, (cfg.block, r), 0)
  ray = jax.lax.broadcasted_iota(jnp.int32, (cfg.block, r), 1)
  pick = jnp.where(rows // s == ray, jnp.float32(1), jnp.float32(0))
  exp = _dot_exact(pick, t, ((1,), (0,)))  # [block, S]
  lane = jax.lax.broadcasted_iota(jnp.int32, (cfg.block, s), 1)
  rpos = jax.lax.broadcasted_iota(jnp.int32, (cfg.block, s), 0) % s
  return jnp.sum(jnp.where(lane == rpos, exp, 0.0), axis=-1, keepdims=True)


def _epilogue_fwd(cfg: TrunkCfg, d, sig_raw):
  """In-kernel compositing weights from the raw density column.

  sigma = softplus(raw + bsig); dd = sigma * delta; w = alpha * trans.
  Everything runs f32 in [rays, S] layout (rows are ray-major, so the
  regroup from the [blk, 1] head column is a free in-VMEM reshape), with
  one [rays, S] @ [S, S] triangular MXU matmul for the scan.
  Returns (w, trans, dd, sigma, raw_t) - all [rays, S].
  """
  s = cfg.weights
  raw_t = sig_raw.reshape(cfg.block // s, s) + d['bsig'][:]
  sigma = jax.nn.softplus(raw_t)
  # delta moves as a [block, 1] column (any block is a legal tiling);
  # the column->tile regroup is the Mosaic-supported reshape direction.
  dd = sigma * d['delta'][:].reshape(cfg.block // s, s)
  excl = _dot_exact(dd, _scan_mask(cfg), ((1,), (1,)))
  trans = jnp.exp(-excl)
  alpha = 1.0 - jnp.exp(-dd)
  return alpha * trans, trans, dd, sigma, raw_t


def _segments(cfg: TrunkCfg, d, cdt):
  """Segment values in compute dtype (+ f32 trig intermediates in encode
  mode: scale-expand via the S operand on the MXU, then VPU trig).

  The expansion dots run at HIGHEST precision: the scales are powers of two
  (exact binary multipliers), but a default bf16 MXU pass would truncate
  lm's mantissa before scaling - at scale 2^15 that is a catastrophic phase
  error in sin/cos. The 3-pass f32 decomposition keeps the products exact.

  IDE mode (`cfg.ide`): the second return value is the IDE backward
  residuals instead of trig intermediates.
  """
  if cfg.ide:
    rd, ki, geo = _ide_raw_inputs(cfg, d)
    re_ide, im_ide, aux = _ide_fwd(cfg, d, rd, ki)
    nd = None
    if cfg.ide_geo:
      _, nd = _dir_geometry(*geo)
    segs = []
    for j in range(len(cfg.seg_dims)):
      if j == cfg.ide_at:
        segs.append(re_ide.astype(cdt))
      elif j == cfg.ide_at + 1:
        segs.append(im_ide.astype(cdt))
      elif cfg.ide_geo and j == cfg.ide_at + 2:
        segs.append(nd.astype(cdt))
      else:
        segs.append(d['segs'][j][:].astype(cdt))
    return segs, (aux, geo)
  if not cfg.encode:
    return [s[:].astype(cdt) for s in d['segs']], None
  hi = jax.lax.Precision.HIGHEST
  su = d['su'][:]
  m_se = jax.lax.dot_general(
      d['lm'][:], su, dimension_numbers=(((1,), (1,)), ((), ())),
      precision=hi, preferred_element_type=jnp.float32)
  v_se = jax.lax.dot_general(
      d['lv'][:], su * su, dimension_numbers=(((1,), (1,)), ((), ())),
      precision=hi, preferred_element_type=jnp.float32)
  e = jnp.exp(-0.5 * v_se)
  m_se = _safe_trig_arg(m_se)
  sinm, cosm = jnp.sin(m_se), jnp.cos(m_se)
  xs = (e * sinm).astype(cdt)
  xc = (e * cosm).astype(cdt)
  return [xs, xc], (e, sinm, cosm)


def _forward_trunk(cfg: TrunkCfg, d, segs, cdt):
  """Run the trunk; returns the per-layer activation list."""
  L = cfg.depth
  skip_ix = {l: k for k, l in enumerate(cfg.skip_inputs)}
  G = len(cfg.seg_dims)
  acts = []
  h = None
  for l in range(L):
    if l == 0:
      hb = _seg_dot(segs[0], d['w0s'][0][:])
      for j in range(1, G):
        hb = hb + _seg_dot(segs[j], d['w0s'][j][:])
    else:
      hb = _dot(h, d['was'][l - 1][:], ((1,), (0,)))
      if l in skip_ix:
        for j in range(G):
          hb = hb + _seg_dot(segs[j], d['wbs'][skip_ix[l] * G + j][:])
    z = hb.astype(cdt) + d['bs'][l:l + 1, :].astype(cdt)
    h = jnp.maximum(z, jnp.zeros_like(z))
    acts.append(h)
  return acts


def _inner_chain(cfg: TrunkCfg, d, acts, cdt, keep=False):
  """The density-gradient reverse chain; returns (u_segments, s_list)."""
  L, G = cfg.depth, len(cfg.seg_dims)
  skip_ix = {l: k for k, l in enumerate(cfg.skip_inputs)}
  blk = acts[0].shape[0]
  us = [jnp.zeros((blk, sd), jnp.float32) for sd in cfg.seg_dims]
  ss = [None] * L
  q = jnp.broadcast_to(d['wd'][:], (blk, cfg.width)).astype(cdt)
  for l in reversed(range(L)):
    s = _mask(acts[l]) * q
    if keep:
      ss[l] = s
    if l == 0:
      for j in range(G):
        us[j] = us[j] + _seg_dot_t(s, d['w0s'][j][:])
    else:
      if l in skip_ix:
        for j in range(G):
          us[j] = us[j] + _seg_dot_t(s, d['wbs'][skip_ix[l] * G + j][:])
      q = _dot(s, d['was'][l - 1][:], ((1,), (1,))).astype(cdt)
  return us, ss


def _fwd_kernel(cfg: TrunkCfg, *refs):
  cdt = jnp.dtype(cfg.cdt)
  rr = _Refs(cfg, refs)
  d = _parse_inputs(cfg, rr)
  # Outputs, canonical order.
  y_ref = rr.take() if cfg.out_y else None
  sig_ref = rr.take() if cfg.density else None
  h_ref = rr.take() if cfg.h_f32 else None
  c_ref = rr.take() if cfg.h_cdt else None
  u_refs = rr.take(1 if cfg.uproj else len(cfg.seg_dims)) \
      if cfg.density_grad else ()
  w_ref = rr.take() if cfg.weights else None
  rgb_ref = rr.take() if cfg.rgbe else None

  segs, trig = _segments(cfg, d, cdt)
  acts = _forward_trunk(cfg, d, segs, cdt)
  y = acts[-1]
  if cfg.out_y:
    y_ref[:] = y
  y32 = y.astype(jnp.float32)
  if cfg.density:
    sig_raw = jnp.sum(y32 * d['wd'][:], axis=-1, keepdims=True)
    sig_ref[:] = sig_raw.reshape(sig_ref.shape)
    if cfg.weights:
      # w_ref is a [block, 1] column; the tile->column flatten has no
      # Mosaic shape cast, so it runs through _tile_to_col.
      w_ref[:] = _tile_to_col(cfg, _epilogue_fwd(cfg, d, sig_raw)[0])
  if cfg.h_f32:
    if cfg.h_t:
      # Feature-major store: [h, block] tile of the dense [h, N] output.
      h_ref[:] = _dot(d['wh'][:], y32, ((0,), (1,))) + d['bh'][:]
    else:
      hval = _dot(y32, d['wh'][:], ((1,), (0,))) + d['bh'][:]
      h_ref[:] = hval
      if cfg.rgbe:
        rgb_ref[:] = _rgb_epilogue(cfg, hval, d['rawd'][:], d['rawt'][:])
  if cfg.h_cdt:
    c_ref[:] = (_dot(y, d['wc'][:], ((1,), (0,))).astype(cdt)
                + d['bc'][:].astype(cdt))
  if cfg.density_grad:
    us, _ = _inner_chain(cfg, d, acts, cdt)
    if cfg.uproj:
      # Chain rule through xs = e sin(m), xc = e cos(m), then fold the
      # per-degree scales: d sigma/d lifted-means = e(cos*u_xs - sin*u_xc)@S.
      # Without in-kernel trig, xc/xs themselves are e*cos/e*sin.
      if trig is not None:
        e, sinm, cosm = trig
        u_m = e * (cosm * us[0] - sinm * us[1])
      else:
        u_m = _f32(segs[1]) * us[0] - _f32(segs[0]) * us[1]
      u_refs[0][:] = _dot(u_m, d['su'][:], ((1,), (0,)))
    else:
      for j, u in enumerate(us):
        u_refs[j][:] = u


def _bwd_kernel(cfg: TrunkCfg, *refs):
  L, S, G = cfg.depth, len(cfg.skip_inputs), len(cfg.seg_dims)
  cdt = jnp.dtype(cfg.cdt)
  skip_ix = {l: k for k, l in enumerate(cfg.skip_inputs)}
  rr = _Refs(cfg, refs)
  d = _parse_inputs(cfg, rr)
  # Cotangent inputs (canonical fwd-output order).
  ybar_ref = rr.take() if cfg.out_y else None
  sbar_ref = rr.take() if cfg.density else None
  hbar_ref = rr.take() if cfg.h_f32 else None
  cbar_ref = rr.take() if cfg.h_cdt else None
  ubar_refs = rr.take(1 if cfg.uproj else G) if cfg.density_grad else ()
  wbar_ref = rr.take() if cfg.weights else None
  rgbbar_ref = rr.take() if cfg.rgbe else None
  # Gradient outputs.
  dw0s = rr.take(G)
  dwas = rr.take(L - 1)
  dwbs = rr.take(S * G)
  dbs_ref = rr.take()
  dwd_ref = rr.take() if cfg.density else None
  dwh_ref = rr.take() if cfg.h_f32 else None
  dbh_ref = rr.take() if cfg.h_f32 else None
  dwc_ref = rr.take() if cfg.h_cdt else None
  dbc_ref = rr.take() if cfg.h_cdt else None
  dx_refs = rr.take(G) if cfg.needs_dx else ()
  dbsig_ref = rr.take() if cfg.weights else None
  drawd_ref = rr.take() if cfg.rgbe else None
  drawt_ref = rr.take() if cfg.rgbe else None

  @pl.when(pl.program_id(0) == 0)
  def _init():
    accs = (*dw0s, *dwas, *dwbs, dbs_ref)
    for r in accs + tuple(
        r for r in (dwd_ref, dwh_ref, dbh_ref, dwc_ref, dbc_ref, dbsig_ref)
        if r is not None):
      r[:] = jnp.zeros_like(r)

  # 1. Recompute forward (VMEM-resident), incl. the inner chain's s_i.
  segs, trig = _segments(cfg, d, cdt)
  acts = _forward_trunk(cfg, d, segs, cdt)
  y = acts[-1]
  y32 = y.astype(jnp.float32)
  ss = None
  if cfg.density_grad:
    _, ss = _inner_chain(cfg, d, acts, cdt, keep=True)

  # 2. Head backward: cotangent on y, head weight grads.
  g32 = None  # f32 contributions to y's cotangent
  g = jnp.zeros_like(y)
  if cfg.out_y:
    g = g + ybar_ref[:].astype(cdt)
  if cfg.density:
    sbar = sbar_ref[:].reshape(cfg.block, 1)
    if cfg.weights:
      # Fold the weights cotangent into raw-density's before the trunk
      # reverse: with dd_i = sigma_i delta_i, T_i = exp(-excl_i),
      # w_i = (1 - exp(-dd_i)) T_i,
      #   d w_i / d dd_i = T_i - w_i,  d w_i / d dd_k = -w_i (k < i)
      # so ct_dd = wbar*(T - w) - suffix_sum(wbar*w) (suffix = x @ L in
      # the [rays, S] layout), ct_raw = ct_dd * delta * sigmoid(raw +
      # bsig) (softplus').
      # Exactness vs jax.grad: tests/test_epilogue_design.py.
      s = cfg.weights
      sig_raw = jnp.sum(y32 * d['wd'][:], axis=-1, keepdims=True)
      w, trans, _, _, raw_t = _epilogue_fwd(cfg, d, sig_raw)
      # Cotangents arrive as [block, 1] columns; column->tile is the
      # supported reshape direction, tile->column goes via _tile_to_col.
      wbar = wbar_ref[:].reshape(cfg.block // s, s)
      suffix = _dot_exact(wbar * w, _scan_mask(cfg), ((1,), (0,)))
      ct_raw = ((wbar * (trans - w) - suffix)
                * d['delta'][:].reshape(cfg.block // s, s)
                * jax.nn.sigmoid(raw_t))
      sbar = sbar + _tile_to_col(cfg, ct_raw)
      dbsig_ref[:] += jnp.sum(ct_raw, keepdims=True)
    g32 = sbar * d['wd'][:]
    dwd_ref[:] += _dot(sbar, y32, ((0,), (0,)))
  if cfg.h_f32 and cfg.h_t:
    hbar_t = hbar_ref[:]  # [h, block] tile of the feature-major cotangent
    back = _dot(hbar_t, d['wh'][:], ((0,), (1,)))
    g32 = back if g32 is None else g32 + back
    dwh_ref[:] += _dot(y32, hbar_t, ((0,), (1,)))
    dbh_ref[:] += jnp.sum(hbar_t, axis=1, keepdims=True)
  elif cfg.h_f32:
    hbar = hbar_ref[:]
    if cfg.rgbe:
      # Pull the final-rgb cotangent back through the color epilogue onto
      # the raw head output and the raw diffuse/tint inputs. jax.vjp on
      # the in-kernel chain reproduces XLA AD exactly (incl. the 0.5
      # tie subgradients of max/clip at gamut-normalized samples).
      hval = _dot(y32, d['wh'][:], ((1,), (0,))) + d['bh'][:]
      rawd, rawt = d['rawd'][:], d['rawt'][:]
      _, rgb_vjp = jax.vjp(
          lambda a, b, c: _rgb_epilogue(cfg, a, b, c), hval, rawd, rawt)
      d_raw, d_rawd, d_rawt = rgb_vjp(rgbbar_ref[:])
      hbar = hbar + d_raw
      drawd_ref[:] = d_rawd
      drawt_ref[:] = d_rawt
    back = _dot(hbar, d['wh'][:], ((1,), (1,)))
    g32 = back if g32 is None else g32 + back
    dwh_ref[:] += _dot(y32, hbar, ((0,), (0,)))
    dbh_ref[:] += jnp.sum(hbar, axis=0, keepdims=True)
  if cfg.h_cdt:
    cbar = cbar_ref[:].astype(cdt)
    g = g + _dot(cbar, d['wc'][:], ((1,), (1,))).astype(cdt)
    dwc_ref[:] += _dot(y, cbar, ((0,), (0,)))
    dbc_ref[:] += jnp.sum(cbar.astype(jnp.float32), axis=0, keepdims=True)
  if g32 is not None:
    g = g + g32.astype(cdt)

  # 3. First-order reverse through the trunk.
  dxs = [jnp.zeros((y.shape[0], sd), jnp.float32) for sd in cfg.seg_dims] \
      if cfg.needs_dx else None
  for l in reversed(range(L)):
    zeta = _mask(acts[l]) * g
    inp = acts[l - 1] if l > 0 else None
    if l == 0:
      for j in range(G):
        dw0s[j][:] += _seg_outer(segs[j], zeta)
    else:
      dwas[l - 1][:] += _dot(inp, zeta, ((0,), (0,)))
      if l in skip_ix:
        for j in range(G):
          dwbs[skip_ix[l] * G + j][:] += _seg_outer(segs[j], zeta)
    dbs_ref[l:l + 1, :] += jnp.sum(
        zeta, axis=0, keepdims=True).astype(jnp.float32)
    if l == 0:
      if cfg.needs_dx:
        for j in range(G):
          dxs[j] = dxs[j] + _seg_dot_t(zeta, d['w0s'][j][:])
    else:
      if l in skip_ix and cfg.needs_dx:
        for j in range(G):
          dxs[j] = dxs[j] + _seg_dot_t(zeta, d['wbs'][skip_ix[l] * G + j][:])
      g = _dot(zeta, d['was'][l - 1][:], ((1,), (1,))).astype(cdt)
  if cfg.needs_dx:
    if cfg.ide:
      # Pull the encoding cotangents back through the in-kernel IDE to the
      # raw refdirs / kappa_inv inputs (geo mode: further through
      # reflect/normalize/n.v to grad and viewdirs, via jax.vjp).
      ide_aux, geo = trig
      d_rd, d_ki = _ide_bwd(cfg, d, ide_aux, dxs[cfg.ide_at],
                            dxs[cfg.ide_at + 1])
      if cfg.ide_geo:
        d_nd = dxs[cfg.ide_at + 2]
        _, geo_vjp = jax.vjp(_dir_geometry, *geo)
        d_gp, d_v = geo_vjp((d_rd, d_nd))
        dxs[cfg.ide_at] = d_gp
        dxs[cfg.ide_at + 1] = d_v
        dxs[cfg.ide_at + 2] = d_ki
      else:
        dxs[cfg.ide_at] = d_rd
        dxs[cfg.ide_at + 1] = d_ki
    for j in range(G):
      dx_refs[j][:] = dxs[j].astype(dx_refs[j].dtype)

  # 4. Second-order pass from u_bar: forward tangent chain p.
  if cfg.density_grad:
    if cfg.uproj:
      # Expand the compact cotangent back through the projection and the
      # trig chain: t_xs = (ub @ S^T) * e cos(m), t_xc = -(ub @ S^T) e sin.
      tp = _dot(ubar_refs[0][:], d['su'][:], ((1,), (1,)))
      if trig is not None:
        e, sinm, cosm = trig
        ts = [(tp * e * cosm).astype(cdt), (-(tp * e * sinm)).astype(cdt)]
      else:
        ts = [(tp * _f32(segs[1])).astype(cdt),
              (-(tp * _f32(segs[0]))).astype(cdt)]
    else:
      ts = [ubar_refs[j][:].astype(cdt) for j in range(G)]
    p = None
    for l in range(L):
      if l == 0:
        t = _seg_dot(ts[0], d['w0s'][0][:])
        for j in range(1, G):
          t = t + _seg_dot(ts[j], d['w0s'][j][:])
        for j in range(G):
          dw0s[j][:] += _seg_outer(ts[j], ss[l])
      else:
        t = _dot(p, d['was'][l - 1][:], ((1,), (0,)))
        dwas[l - 1][:] += _dot(p, ss[l], ((0,), (0,)))
        if l in skip_ix:
          for j in range(G):
            t = t + _seg_dot(ts[j], d['wbs'][skip_ix[l] * G + j][:])
            dwbs[skip_ix[l] * G + j][:] += _seg_outer(ts[j], ss[l])
      p = _mask(acts[l]) * t.astype(cdt)
    dwd_ref[:] += jnp.sum(p, axis=0, keepdims=True).astype(jnp.float32)


def _row_spec(blk, ncol):
  return pl.BlockSpec((blk, ncol), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _lane_spec(nrow, blk):
  """Feature-major [nrow, N] arrays blocked along the lane (N) axis."""
  return pl.BlockSpec((nrow, blk), lambda i: (0, i), memory_space=pltpu.VMEM)


def _full_spec(shape):
  return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                      memory_space=pltpu.VMEM)


def _canon_shapes(cfg: TrunkCfg):
  """(wa-shapes incl. layer 0 splits, wb-shapes) of the canonical params."""
  W = cfg.width
  w0 = [(sd, W) for sd in cfg.seg_dims]
  wa = [(W, W)] * (cfg.depth - 1)
  wb = [(sd, W) for _ in cfg.skip_inputs for sd in cfg.seg_dims]
  return w0, wa, wb


@functools.lru_cache(maxsize=None)
def _make_op(cfg: TrunkCfg):
  """Builds the custom-VJP fused trunk for one static configuration.

  Canonical signature (all f32 params, pre-split; x as segment tuple):
    op(xs, w0s, was, wbs, bs, wd, wh, bh, wc, bc, su) -> tuple of outputs
  """
  L, S, G, W = (cfg.depth, len(cfg.skip_inputs), len(cfg.seg_dims),
                cfg.width)
  cdt = jnp.dtype(cfg.cdt)
  w0_sh, wa_sh, wb_sh = _canon_shapes(cfg)
  n_u = (1 if cfg.uproj else G) if cfg.density_grad else 0
  u_dims = ((cfg.uproj,) if cfg.uproj else cfg.seg_dims) \
      if cfg.density_grad else ()

  def _cast(t):
    return jax.tree.map(lambda a: a.astype(cdt), t)

  def _wrefs(d_args):
    """Weight arg values + specs, canonical order, cast appropriately."""
    w0s, was, wbs, bs, wd, wh, bh, wc, bc, su, idec = d_args
    args = [*_cast(w0s), *_cast(was), *_cast(wbs), _cast(bs)]
    specs = ([_full_spec(s) for s in w0_sh] + [_full_spec(s) for s in wa_sh]
             + [_full_spec(s) for s in wb_sh] + [_full_spec((L, W))])
    if cfg.density:
      args.append(wd); specs.append(_full_spec((1, W)))
    if cfg.h_f32:
      args += [wh, bh]
      specs += [_full_spec((W, cfg.h_f32)),
                _full_spec((cfg.h_f32, 1) if cfg.h_t else (1, cfg.h_f32))]
    if cfg.h_cdt:
      args += [_cast(wc), _cast(bc)]
      specs += [_full_spec((W, cfg.h_cdt)), _full_spec((1, cfg.h_cdt))]
    if cfg.uproj:
      args.append(su)
      specs.append(_full_spec((cfg.seg_dims[0], cfg.uproj)))
    if cfg.ide:
      args += list(idec)
      specs += [_full_spec(a.shape) for a in idec]
    return args, specs

  def _xspecs(b):
    if cfg.encode:
      return [_row_spec(cfg.block, cfg.uproj)] * 2
    return [_row_spec(cfg.block, sd) for sd in _in_dims(cfg)]

  def _flops(b, passes):
    per = 2 * b * (sum(np.prod(s) for s in w0_sh + wa_sh + wb_sh)
                   + W * (cfg.h_f32 + cfg.h_cdt + int(cfg.density)))
    return int(per * passes)

  # Sigma / weights / delta move as [N, 1] columns: a [block/S, S] tile
  # block would need block/S to be a multiple of 8 sublanes (1024 at
  # S=128), and the spatial backward overflows the 16 MB scoped-VMEM
  # stack at that block (measured 21.2 MB on v5e). Columns are legal at
  # any block; the in-kernel epilogue regroups column->tile with the
  # supported reshape and returns tile->column via _tile_to_col.
  col_rows, col_cols = cfg.block, 1

  def _col_shape(b):
    return (b, 1)

  def _fwd(xs, wargs, delta, bsig, rgbx):
    b = xs[0].shape[0]
    grid = (b // cfg.block,)
    out_shape, out_specs = [], []
    if cfg.out_y:
      out_shape.append(jax.ShapeDtypeStruct((b, W), cdt))
      out_specs.append(_row_spec(cfg.block, W))
    if cfg.density:
      out_shape.append(jax.ShapeDtypeStruct(_col_shape(b), jnp.float32))
      out_specs.append(_row_spec(col_rows, col_cols))
    if cfg.h_f32:
      hs = (cfg.h_f32, b) if cfg.h_t else (b, cfg.h_f32)
      out_shape.append(jax.ShapeDtypeStruct(hs, jnp.float32))
      out_specs.append(_lane_spec(cfg.h_f32, cfg.block) if cfg.h_t
                       else _row_spec(cfg.block, cfg.h_f32))
    if cfg.h_cdt:
      out_shape.append(jax.ShapeDtypeStruct((b, cfg.h_cdt), cdt))
      out_specs.append(_row_spec(cfg.block, cfg.h_cdt))
    for ud in u_dims:
      out_shape.append(jax.ShapeDtypeStruct((b, ud), jnp.float32))
      out_specs.append(_row_spec(cfg.block, ud))
    wvals, wspecs = _wrefs(wargs)
    evals, especs = [], []
    if cfg.weights:
      out_shape.append(jax.ShapeDtypeStruct(_col_shape(b), jnp.float32))
      out_specs.append(_row_spec(col_rows, col_cols))
      evals = [delta, bsig]
      especs = [_row_spec(col_rows, col_cols), _full_spec((1, 1))]
    if cfg.rgbe:
      out_shape.append(jax.ShapeDtypeStruct((b, cfg.h_f32), jnp.float32))
      out_specs.append(_row_spec(cfg.block, cfg.h_f32))
      evals += list(rgbx)
      especs += [_row_spec(cfg.block, cfg.h_f32)] * 2
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=grid,
        in_specs=_xspecs(b) + wspecs + especs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=cfg.interpret,
        cost_estimate=pl.CostEstimate(
            flops=_flops(b, 2 if cfg.density_grad else 1),
            bytes_accessed=int(sum(x.size * 4 for x in xs) * 2),
            transcendentals=int(3 * b * cfg.seg_dims[0]) if cfg.encode
            else 0),
    )(*xs, *wvals, *evals)
    return tuple(outs)

  def _bwd(xs, wargs, delta, bsig, rgbx, cots):
    b = xs[0].shape[0]
    grid = (b // cfg.block,)
    out_shape = ([jax.ShapeDtypeStruct(s, jnp.float32)
                  for s in w0_sh + wa_sh + wb_sh]
                 + [jax.ShapeDtypeStruct((L, W), jnp.float32)])
    out_specs = ([_full_spec(s) for s in w0_sh + wa_sh + wb_sh]
                 + [_full_spec((L, W))])
    if cfg.density:
      out_shape.append(jax.ShapeDtypeStruct((1, W), jnp.float32))
      out_specs.append(_full_spec((1, W)))
    if cfg.h_f32:
      dbh_sh = (cfg.h_f32, 1) if cfg.h_t else (1, cfg.h_f32)
      out_shape += [jax.ShapeDtypeStruct((W, cfg.h_f32), jnp.float32),
                    jax.ShapeDtypeStruct(dbh_sh, jnp.float32)]
      out_specs += [_full_spec((W, cfg.h_f32)), _full_spec(dbh_sh)]
    if cfg.h_cdt:
      out_shape += [jax.ShapeDtypeStruct((W, cfg.h_cdt), jnp.float32),
                    jax.ShapeDtypeStruct((1, cfg.h_cdt), jnp.float32)]
      out_specs += [_full_spec((W, cfg.h_cdt)), _full_spec((1, cfg.h_cdt))]
    if cfg.needs_dx:
      # dx in the primal input dtype: the in-kernel cast replaces an XLA
      # convert roundtrip of the [N, width] bottleneck cotangent
      # (~0.6 ms/level at batch 4096 bf16 on v5e).
      for x, sd in zip(xs, _in_dims(cfg)):
        out_shape.append(jax.ShapeDtypeStruct((b, sd), x.dtype))
        out_specs.append(_row_spec(cfg.block, sd))
    wvals, wspecs = _wrefs(wargs)
    evals, especs = [], []
    if cfg.weights:
      out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
      out_specs.append(_full_spec((1, 1)))
      evals = [delta, bsig]
      especs = [_row_spec(col_rows, col_cols), _full_spec((1, 1))]
    if cfg.rgbe:
      out_shape += [jax.ShapeDtypeStruct((b, cfg.h_f32), jnp.float32)] * 2
      out_specs += [_row_spec(cfg.block, cfg.h_f32)] * 2
      evals += list(rgbx)
      especs += [_row_spec(cfg.block, cfg.h_f32)] * 2
    cot_specs = []
    if cfg.out_y:
      cot_specs.append(_row_spec(cfg.block, W))
    if cfg.density:
      cot_specs.append(_row_spec(col_rows, col_cols))
    if cfg.h_f32:
      cot_specs.append(_lane_spec(cfg.h_f32, cfg.block) if cfg.h_t
                       else _row_spec(cfg.block, cfg.h_f32))
    if cfg.h_cdt:
      cot_specs.append(_row_spec(cfg.block, cfg.h_cdt))
    for ud in u_dims:
      cot_specs.append(_row_spec(cfg.block, ud))
    if cfg.weights:
      cot_specs.append(_row_spec(col_rows, col_cols))
    if cfg.rgbe:
      cot_specs.append(_row_spec(cfg.block, cfg.h_f32))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid=grid,
        in_specs=_xspecs(b) + wspecs + especs + cot_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=cfg.interpret,
        cost_estimate=pl.CostEstimate(
            flops=_flops(b, 6 if cfg.density_grad else 4),
            bytes_accessed=int(sum(x.size * 4 for x in xs) * 3),
            transcendentals=int(3 * b * cfg.seg_dims[0]) if cfg.encode
            else 0),
    )(*xs, *wvals, *evals, *cots)
    i = 0
    dw0s = tuple(outs[i:i + G]); i += G
    dwas = tuple(outs[i:i + L - 1]); i += L - 1
    dwbs = tuple(outs[i:i + S * G]); i += S * G
    dbs = outs[i]; i += 1
    dwd = dwh = dbh = dwc = dbc = None
    if cfg.density:
      dwd = outs[i]; i += 1
    if cfg.h_f32:
      dwh = outs[i]; dbh = outs[i + 1]; i += 2
    if cfg.h_cdt:
      dwc = outs[i]; dbc = outs[i + 1]; i += 2
    if cfg.needs_dx:
      dxs = tuple(outs[i:i + G]); i += G
    else:
      dxs = tuple(jnp.zeros_like(x) for x in xs)
    dbsig = None
    if cfg.weights:
      dbsig = outs[i]; i += 1
    drgbx = None
    if cfg.rgbe:
      drgbx = (outs[i], outs[i + 1]); i += 2
    return (dxs, (dw0s, dwas, dwbs, dbs, dwd, dwh, dbh, dwc, dbc), dbsig,
            drgbx)

  @jax.custom_vjp
  def op(xs, w0s, was, wbs, bs, wd, wh, bh, wc, bc, su, delta, bsig, idec,
         rgbx):
    return _fwd(xs, (w0s, was, wbs, bs, wd, wh, bh, wc, bc, su, idec),
                delta, bsig, rgbx)

  def op_fwd(xs, w0s, was, wbs, bs, wd, wh, bh, wc, bc, su, delta, bsig,
             idec, rgbx):
    args = (xs, w0s, was, wbs, bs, wd, wh, bh, wc, bc, su, delta, bsig,
            idec, rgbx)
    return _fwd(xs, args[1:11] + (idec,), delta, bsig, rgbx), args

  def op_bwd(res, cots):
    xs = res[0]
    wargs = tuple(res[1:11]) + (res[13],)
    delta, bsig, rgbx = res[11], res[12], res[14]
    dxs, (dw0s, dwas, dwbs, dbs, dwd, dwh, dbh, dwc, dbc), dbsig, drgbx = \
        _bwd(xs, wargs, delta, bsig, rgbx, cots)
    # Segment cotangents already leave the kernel in the primal dtypes.
    dxs = tuple(dxs)
    zero = lambda prim, g: jax.tree.map(jnp.zeros_like, prim) \
        if g is None else g
    return (dxs, dw0s, dwas, dwbs, dbs,
            zero(res[5], dwd), zero(res[6], dwh), zero(res[7], dbh),
            zero(res[8], dwc), zero(res[9], dbc),
            zero(res[10], None),
            # delta carries no cotangent (tdist is stop-gradient at every
            # level: resampling detaches sdist; ray dirs are data).
            zero(delta, None), zero(bsig, dbsig),
            # IDE constants are trace-time tables.
            zero(res[13], None),
            zero(rgbx, drgbx))

  op.defvjp(op_fwd, op_bwd)
  return op


def _canonicalize(cfg: TrunkCfg, kernels, biases):
  """Split flax-shaped trunk kernels into canonical per-segment blocks."""
  W = cfg.width
  bounds = np.cumsum((0,) + cfg.seg_dims)
  fin = int(bounds[-1])
  w0s, was, wbs = [], [], []
  for l, w in enumerate(kernels):
    w = w.astype(jnp.float32)
    if l == 0:
      for j in range(len(cfg.seg_dims)):
        w0s.append(w[bounds[j]:bounds[j + 1]])
    elif l in cfg.skip_inputs:
      was.append(w[:W])
      for j in range(len(cfg.seg_dims)):
        wbs.append(w[W + bounds[j]:W + bounds[j + 1]])
    else:
      if w.shape[0] != W:
        raise ValueError(f'layer {l} expects in-dim {W}, got {w.shape}')
      was.append(w)
  bs = jnp.stack([b.astype(jnp.float32) for b in biases])
  return tuple(w0s), tuple(was), tuple(wbs), bs


def _prep_rows(arrs, n, block):
  """Flatten to rows, pad to a block multiple. Dtype-preserving: compute-
  dtype segments (the IPE encoding, the bottleneck) stay compact in HBM."""
  npad = _round_up(max(n, 1), block)
  return tuple(
      jnp.pad(a.reshape(n, a.shape[-1]), ((0, npad - n), (0, 0)))
      for a in arrs), npad


def _head(w, b=None):
  """(kernel, bias) -> canonical ((1|in, out) f32) pair."""
  if w is None:
    return None, None
  w = w.astype(jnp.float32)
  b = jnp.zeros((1, w.shape[-1]), jnp.float32) if b is None \
      else b.astype(jnp.float32).reshape(1, -1)
  return w, b


def ide_tables(deg_view: int):
  """(mat, sigma_row, gather) trace-time tables for the in-kernel IDE.

  mat [l_max+1, P] are the SH z-polynomial coefficients, sigma_row [1, P]
  the vMF attenuation exponents, gather [l_max+1, P] the {0,1} matrix
  selecting power m_i of (x+iy) for harmonic i (so the power stack gathers
  are MXU dots).
  """
  from refnerf_tpu.ops import ref_utils  # local: avoid import cycles
  ml_array, mat, sigma = ref_utils._ide_constants(deg_view)
  l_max = 2 ** (deg_view - 1)
  gm = np.zeros((l_max + 1, ml_array.shape[1]), np.float32)
  for i, m in enumerate(ml_array[0]):
    gm[int(m), i] = 1.0
  return mat, sigma.reshape(1, -1), gm


def fused_trunk(x, kernels, biases, wd=None, bd=None, *,
                skip_period=4, density_grad=False, needs_dx=False,
                head_f32=None, head_cdt=None, out_y=None,
                compute_dtype='float32', block=512, interpret=None,
                ide_deg=0, ide_at=0, ide_geo=False, rgb_epilogue=None):
  """Fused trunk on flax-shaped parameters, segmented input.

  Args:
    x: [..., fin] input, or a sequence of per-segment [..., d_j] inputs
      whose concatenation is the trunk input (no XLA concat happens).
    kernels: per-layer kernels; skip layers have shape (width + fin, width)
      with the activation rows first (concat order).
    biases: per-layer (width,) biases.
    wd, bd: optional density head (width, 1) kernel / (1,) bias; enables
      the sigma output and (with density_grad) u = d sigma/d x.
    density_grad: compute the inner gradient chain (Ref-NeRF normals);
      returns one u per input segment.
    needs_dx: backward emits d loss/d segment for each segment.
    head_f32: optional (wh, bh) evaluated as dot(y_f32, wh) + bh in-kernel.
    head_cdt: optional (wc, bc) evaluated in compute dtype in-kernel.
    out_y: emit the feature vector itself (default: True unless any head
      or density output makes it redundant is requested explicitly).
    compute_dtype: trunk matmul dtype ('float32' | 'bfloat16').
    block: samples per VMEM block.
    interpret: force Pallas interpreter mode (defaults to CPU backend).
    ide_deg: >0 computes the integrated directional encoding in-kernel:
      x[ide_at] is then a (refdirs [..., 3], kappa_inv [..., 1]) pair whose
      IDE (2P wide, P = harmonics of deg_view=ide_deg) forms two trunk
      segments in place, re half then im half - exactly
      ref_utils.generate_ide_fn(ide_deg)(refdirs, kappa_inv)'s layout. The
      XLA-side encoding, its [.., 2P] relayout copies, and its backward
      never materialize; needs_dx emits d/d refdirs and d/d kappa_inv.
    ide_at: segment position of the IDE pair within x.
    ide_geo: with ide_deg: x[ide_at] is (grad [..., 3], viewdirs [..., 3],
      kappa_inv [..., 1]) and the kernel also computes
      n = -l2_normalize(grad), refdirs = reflect(-viewdirs, n), and the
      trailing width-1 n.v segment (which must directly follow the IDE
      pair in the trunk input layout).
    rgb_epilogue: optional (raw_diffuse [..., 3], raw_tint [..., 3],
      rgb_premultiplier, rgb_bias, rgb_padding): fuse the Ref-NeRF color
      epilogue (mlp.py:491-518) after the f32 rgb head and append the
      final rgb to the outputs. Requires head_f32 = the rgb head.

  Returns a tuple in order [y][, sigma][, h_f32][, h_cdt][, u per segment]
  [, rgb], or the single y array when only y is produced.
  """
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  segs = list(x) if isinstance(x, (list, tuple)) else [x]
  idec = None
  if ide_deg:
    if density_grad:
      raise ValueError('in-kernel IDE supports first-order trunks only')
    mat, sg, gm = ide_tables(ide_deg)
    p = mat.shape[1]
    idec = (jnp.asarray(mat), jnp.asarray(sg), jnp.asarray(gm))
    if ide_geo:
      # Inputs at the IDE slot are (grad, viewdirs, kappa_inv); the
      # trunk-visible segments are re/im (P each) + the n.v scalar.
      gp, v, ki = segs[ide_at]
      segs[ide_at:ide_at + 1] = [gp, v, ki]
      seg_dims = tuple(
          {ide_at: p, ide_at + 1: p, ide_at + 2: 1}.get(j, int(s.shape[-1]))
          for j, s in enumerate(segs))
    else:
      # Inputs at the IDE slot are (refdirs, kappa_inv); the trunk-visible
      # segments there are the re/im halves, P wide each.
      rd, ki = segs[ide_at]
      segs[ide_at:ide_at + 1] = [rd, ki]
      seg_dims = tuple(
          p if j in (ide_at, ide_at + 1) else int(s.shape[-1])
          for j, s in enumerate(segs))
  else:
    seg_dims = tuple(int(s.shape[-1]) for s in segs)
  depth = len(kernels)
  width = kernels[-1].shape[-1]
  wh, bh = _head(*head_f32) if head_f32 else (None, None)
  wc, bc = _head(*head_cdt) if head_cdt else (None, None)
  if out_y is None:
    out_y = True
  rgbe_kw = {}
  if rgb_epilogue is not None:
    if wh is None:
      raise ValueError('rgb_epilogue needs head_f32 (the rgb head)')
    rgbe_kw = dict(rgbe=True,
                   rgbe_premult=float(rgb_epilogue[2]),
                   rgbe_bias=float(rgb_epilogue[3]),
                   rgbe_pad=float(rgb_epilogue[4]))
  h_t = wh is not None and rgb_epilogue is None
  if h_t:
    bh = bh.reshape(-1, 1)
  cfg = TrunkCfg(
      depth=depth, width=width, seg_dims=seg_dims,
      skip_inputs=skip_input_layers(depth, skip_period),
      encode=False, uproj=0, density=wd is not None,
      density_grad=density_grad and wd is not None, needs_dx=needs_dx,
      h_f32=0 if wh is None else wh.shape[-1], h_t=h_t,
      h_cdt=0 if wc is None else wc.shape[-1],
      out_y=out_y, cdt=compute_dtype, block=block,
      interpret=bool(interpret),
      ide=int(ide_deg), ide_at=ide_at if ide_deg else -1,
      ide_geo=bool(ide_deg) and bool(ide_geo), **rgbe_kw)

  lead = segs[0].shape[:-1]
  n = int(np.prod(lead)) if lead else 1
  xs, npad = _prep_rows(segs, n, block)
  w0s, was, wbs, bs = _canonicalize(cfg, kernels, biases)
  wdT = None if wd is None else wd.astype(jnp.float32).reshape(1, width)
  rgbx = None
  if cfg.rgbe:
    rgbx, _ = _prep_rows((rgb_epilogue[0].astype(jnp.float32),
                          rgb_epilogue[1].astype(jnp.float32)), n, block)

  outs = list(_make_op(cfg)(
      xs, w0s, was, wbs, bs, wdT, wh, bh, wc, bc, None, None, None, idec,
      rgbx))
  res = []
  if cfg.out_y:
    res.append(outs.pop(0)[:n].reshape(*lead, width))
  if cfg.density:
    sig = outs.pop(0)[:n, 0].reshape(lead)
    res.append(sig + (0.0 if bd is None else bd.astype(jnp.float32)[0]))
  if cfg.h_f32:
    # h_t: the dense [h, N] output transposes back at this boundary; XLA's
    # layout assignment folds the transpose into the consumers' preferred
    # feature-plane layout instead of materializing the padded [N, h].
    res.append(jnp.moveaxis(
        outs.pop(0)[:, :n].reshape((cfg.h_f32,) + lead), 0, -1) if cfg.h_t
        else outs.pop(0)[:n].reshape(*lead, cfg.h_f32))
  if cfg.h_cdt:
    res.append(outs.pop(0)[:n].reshape(*lead, cfg.h_cdt))
  if cfg.density_grad:
    for sd in seg_dims:
      res.append(outs.pop(0)[:n].reshape(*lead, sd))
  if cfg.rgbe:
    res.append(outs.pop(0)[:n].reshape(*lead, cfg.h_f32))
  return res[0] if len(res) == 1 else tuple(res)


def ipe_scale_fold(scales, n_basis) -> np.ndarray:
  """The (deg*n_basis, n_basis) projection that folds the per-degree scales.

  S[d*n_basis + j, j] = scales[d]; u_lifted = (d sigma/d m_scaled) @ S.
  """
  scales = np.asarray(scales, np.float32)
  return np.kron(scales[:, None], np.eye(n_basis, dtype=np.float32))


def fused_encoded_trunk(lm, lv, scales, kernels, biases, wd, bd=None, *,
                        skip_period=4, density_grad=False,
                        head_f32=None, head_cdt=None, out_y=False,
                        compute_dtype='float32', block=512,
                        in_kernel_trig=False, interpret=None,
                        delta=None, act_bias=0.0):
  """Fused IPE trunk: x = [e*sin(m) | e*cos(m)], m/v the scale-lifted stats.

  `lm`/`lv` are the lifted means/vars, [..., n_basis] each; `scales` the
  static per-degree frequency scales (len deg; the trunk input is
  2*deg*n_basis wide). With density_grad the kernel emits
  u = d sigma/d lm ([..., n_basis]): the xs/xc chain rule and the scale
  fold run in-kernel (`TrunkCfg.uproj`), so the gradient tensor (and its
  backward cotangent) is deg-times smaller than the encoding. Positions
  are stop-gradient (resampling detaches sdist).

  Two encoding placements (measured on v5e, batch 4096, deg 16):
  - in_kernel_trig=False (default): trig runs in XLA *in the 3D
    [deg, n_basis] shape* and only the compute-dtype xs/xc are reshaped to
    the kernel's 2D row layout - the lane-unaligned collapse costs one
    bf16 relayout copy, but the f32 scaled stats never materialize.
  - in_kernel_trig=True: the kernel reads lm/lv directly and does the
    scale expansion (HIGHEST-precision MXU dots against S) + trig on the
    VPU (`TrunkCfg.encode`). Least HBM, but the fwd+bwd trig recompute
    costs more than the copies it saves at these shapes (-4%).

  Compositing epilogue (`delta` is not None): `delta` is the per-sample
  [..., S] t-interval length * |ray dir| (the model clamps the
  opaque-background interval to a large finite value instead of inf);
  `act_bias` is the density activation bias (Config/MLP density_bias).
  The kernel then also emits the transmittance compositing weights
  w = alpha * trans of sigma = softplus(raw + bd + act_bias)
  (reference internal/render.py:132-149) without sigma ever leaving
  VMEM; requires wd, samples-contiguous rows, and block % S == 0.
  Oracle for both directions: tests/test_epilogue_design.py.

  Returns a tuple in order [y][, sigma][, h_f32][, h_cdt][, u][, weights].
  """
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  cdt = jnp.dtype(compute_dtype)
  nb = int(lm.shape[-1])
  scales = np.asarray(scales, np.float32)
  F = nb * len(scales)
  depth = len(kernels)
  width = kernels[-1].shape[-1]
  wh, bh = _head(*head_f32) if head_f32 else (None, None)
  wc, bc = _head(*head_cdt) if head_cdt else (None, None)
  samples = 0
  if delta is not None:
    if wd is None:
      raise ValueError('the compositing epilogue needs the density head')
    samples = int(delta.shape[-1])
    if block % samples:
      raise ValueError(
          f'fused compositing needs block % samples == 0, got '
          f'{block} % {samples}')
  h_t = wh is not None
  if h_t:
    bh = bh.reshape(-1, 1)
  cfg = TrunkCfg(
      depth=depth, width=width, seg_dims=(F, F),
      skip_inputs=skip_input_layers(depth, skip_period),
      encode=in_kernel_trig, uproj=nb, density=wd is not None,
      density_grad=density_grad and wd is not None, needs_dx=False,
      h_f32=0 if wh is None else wh.shape[-1], h_t=h_t,
      h_cdt=0 if wc is None else wc.shape[-1],
      out_y=out_y, cdt=compute_dtype, block=block,
      interpret=bool(interpret), weights=samples)

  lm = jax.lax.stop_gradient(lm).astype(jnp.float32)
  lv = jax.lax.stop_gradient(lv).astype(jnp.float32)
  lead = lm.shape[:-1]
  n = int(np.prod(lead)) if lead else 1
  if in_kernel_trig:
    xs, _ = _prep_rows((lm, lv), n, block)
  else:
    # Scale expansion as an MXU matmul against the scale-fold matrix: the
    # [.., F] scaled stats come out directly in the kernel's 2D layout, so
    # the trig producer never pays the lane-unaligned [deg, nb] -> [F]
    # collapse relayout (~0.7 ms/copy at this size on v5e). The products
    # are exact: one power-of-two entry per S column, HIGHEST precision.
    # The stats collapse to 2D rows FIRST (a free bitcast on the row-major
    # elementwise producer): a [lead..., nb] dot comes out feature-major
    # tiled and the bf16 xs/xc then pay a relayout copy per segment per
    # level re-collapsing for the kernel.
    su_t = jnp.asarray(ipe_scale_fold(scales, nb)).T
    hi = jax.lax.Precision.HIGHEST
    lm2 = lm.reshape(n, nb)
    lv2 = lv.reshape(n, nb)
    m_s = jax.lax.dot_general(lm2, su_t, (((1,), (0,)), ((), ())),
                              precision=hi,
                              preferred_element_type=jnp.float32)
    v_s = jax.lax.dot_general(lv2, su_t * su_t,
                              (((1,), (0,)), ((), ())),
                              precision=hi,
                              preferred_element_type=jnp.float32)
    # The trig block is transcendental-throughput bound, and [n, F] rows
    # with F=48 run the VPU at 48/128 lanes (~2.2 ms/level at batch 4096,
    # deg 16, v5e). Row-major [n, F] -> [n*F/128, 128] is a free bitcast,
    # so when it divides, the sin/cos/exp fusion runs at full lanes.
    flat = (n * F) % 128 == 0
    shp = (n * F // 128, 128) if flat else (n, F)
    ms2 = _safe_trig_arg(m_s.reshape(shp))
    vs2 = v_s.reshape(shp)
    e = jnp.exp(-0.5 * vs2)
    xseg = (e * jnp.sin(ms2)).astype(cdt).reshape(n, F)
    cseg = (e * jnp.cos(ms2)).astype(cdt).reshape(n, F)
    xs, _ = _prep_rows((xseg, cseg), n, block)
  w0s, was, wbs, bs = _canonicalize(cfg, kernels, biases)
  wdT = None if wd is None else wd.astype(jnp.float32).reshape(1, width)
  su = jnp.asarray(ipe_scale_fold(scales, nb))

  dcol = bsig = None
  if cfg.weights:
    # delta rides as an [N, 1] column, same row order as the sigma and
    # weights outputs (rows are ray-major, samples-minor).
    npad = _round_up(max(n, 1), block)
    dcol = jnp.pad(delta.astype(jnp.float32).reshape(n, 1),
                   ((0, npad - n), (0, 0)))
    bsig = ((0.0 if bd is None else bd.astype(jnp.float32)[0])
            + jnp.float32(act_bias)).reshape(1, 1)

  def _col_out(o):
    return o[:n, 0].reshape(lead)

  outs = list(_make_op(cfg)(
      xs, w0s, was, wbs, bs, wdT, wh, bh, wc, bc, su, dcol, bsig, None,
      None))
  res = []
  if cfg.out_y:
    res.append(outs.pop(0)[:n].reshape(*lead, width))
  if cfg.density:
    sig = _col_out(outs.pop(0))
    res.append(sig + (0.0 if bd is None else bd.astype(jnp.float32)[0]))
  if cfg.h_f32:
    # See fused_trunk: dense [h, N] store, transposed back at the boundary.
    res.append(jnp.moveaxis(
        outs.pop(0)[:, :n].reshape((cfg.h_f32,) + lead), 0, -1) if cfg.h_t
        else outs.pop(0)[:n].reshape(*lead, cfg.h_f32))
  if cfg.h_cdt:
    res.append(outs.pop(0)[:n].reshape(*lead, cfg.h_cdt))
  if cfg.density_grad:
    res.append(outs.pop(0)[:n].reshape(*lead, nb))
  if cfg.weights:
    res.append(_col_out(outs.pop(0)))
  return res[0] if len(res) == 1 else tuple(res)


def reference_trunk(x, kernels, biases, wd=None, bd=None, *,
                    skip_period=4, density_grad=False,
                    head_f32=None, head_cdt=None,
                    compute_dtype='float32'):
  """Pure-jnp mirror of fused_trunk, flax-Dense numerics (for tests).

  Accepts the same segmented input; returns outputs in fused_trunk's order
  (with out_y always on and u per segment when density_grad).
  """
  cdt = jnp.dtype(compute_dtype)
  segs = list(x) if isinstance(x, (list, tuple)) else [x]
  skips = skip_input_layers(len(kernels), skip_period)

  def trunk(x0):
    h = x0.astype(cdt)
    for l, (w, b) in enumerate(zip(kernels, biases)):
      if l in skips:
        h = jnp.concatenate([h, x0.astype(cdt)], axis=-1)
      h = jnp.maximum(jnp.dot(h, w.astype(cdt)) + b.astype(cdt), 0)
    return h

  def sigma(x0):
    y = trunk(x0)
    s = jnp.dot(y.astype(jnp.float32), wd)[..., 0] + (
        0.0 if bd is None else bd[0])
    return s, y

  x0 = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=-1)
  res = []
  if wd is None:
    y = trunk(x0)
    res.append(y)
  else:
    sig, y = sigma(x0)
    res += [y, sig]
  if head_f32 is not None:
    wh, bh = head_f32
    bh = 0.0 if bh is None else bh
    res.append(jnp.dot(y.astype(jnp.float32), wh) + bh)
  if head_cdt is not None:
    wc, bc = head_cdt
    bc = jnp.zeros((wc.shape[-1],)) if bc is None else bc
    res.append(jnp.dot(y, wc.astype(cdt)) + bc.astype(cdt))
  if density_grad and wd is not None:
    def ssum(x0):
      return sigma(x0)[0].sum()
    u = jax.grad(ssum)(x0)
    off = 0
    for s in segs:
      res.append(u[..., off:off + s.shape[-1]])
      off += s.shape[-1]
  return res[0] if len(res) == 1 else tuple(res)


def reference_encoded_trunk(lm, lv, scales, kernels, biases, wd, bd=None, *,
                            skip_period=4, density_grad=False,
                            head_f32=None, head_cdt=None, out_y=False,
                            compute_dtype='float32'):
  """Pure-jnp mirror of fused_encoded_trunk (for tests).

  Matches the fused semantics exactly: the encoding is computed in f32 and
  cast to compute dtype once; u = d sigma/d lm differentiates through the
  cast encoding (the kernel's xs/xc chain-rule + scale fold).
  """
  cdt = jnp.dtype(compute_dtype)
  lm = jax.lax.stop_gradient(lm)
  lv = jax.lax.stop_gradient(lv)
  scales = jnp.asarray(np.asarray(scales, np.float32))
  F = lm.shape[-1] * scales.shape[0]
  shp = lm.shape[:-1] + (F,)

  def enc(lm0):
    m_s = _safe_trig_arg(jnp.reshape(lm0[..., None, :] * scales[:, None], shp))
    v_s = jnp.reshape(lv[..., None, :] * scales[:, None] ** 2, shp)
    e = jnp.exp(-0.5 * v_s)
    return [(e * jnp.sin(m_s)).astype(cdt), (e * jnp.cos(m_s)).astype(cdt)]

  def run(lm0):
    return reference_trunk(enc(lm0), kernels, biases, wd, bd,
                           skip_period=skip_period, density_grad=False,
                           head_f32=head_f32, head_cdt=head_cdt,
                           compute_dtype=compute_dtype)

  outs = run(lm)
  outs = list(outs if isinstance(outs, tuple) else (outs,))
  if not out_y:
    outs = outs[1:]
  if density_grad and wd is not None:
    def ssum(lm0):
      o = run(lm0)
      return (o[1] if isinstance(o, tuple) else o).sum()
    outs.append(jax.grad(ssum)(lm))
  return outs[0] if len(outs) == 1 else tuple(outs)
