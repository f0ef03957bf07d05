"""Fused Pallas trunk vs pure-jnp AD: forward, first- and second-order grads.

The fused op's custom VJP hand-implements the backward including the
second-order terms of the density-gradient chain (d/dparams of d sigma/dx);
these tests pin it against jax.grad of the plain jnp formulation, which is
the same math the unfused model path uses (reference internal/models.py
:569-611 defines the trunk/skip/density-grad semantics being fused).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refnerf_tpu.ops.pallas import fused_mlp


def _params(key, depth, width, fin, skip_period=4, head=True):
  skips = fused_mlp.skip_input_layers(depth, skip_period)
  keys = jax.random.split(key, 2 * depth + 2)
  kernels, biases = [], []
  for l in range(depth):
    ind = fin if l == 0 else (width + fin if l in skips else width)
    kernels.append(jax.random.normal(keys[2 * l], (ind, width)) *
                   (1.0 / np.sqrt(ind)))
    biases.append(jax.random.normal(keys[2 * l + 1], (width,)) * 0.01)
  wd = jax.random.normal(keys[-2], (width, 1)) / np.sqrt(width)
  bd = jax.random.normal(keys[-1], (1,)) * 0.1
  if not head:
    wd = bd = None
  return kernels, biases, wd, bd


def _loss_terms(y, sig=None, u=None):
  t = jnp.sum(jnp.sin(y * 0.7))
  if sig is not None:
    t = t + jnp.sum(jnp.tanh(sig))
  if u is not None:
    # Nonlinear in u so the second-order cotangent ubar is non-trivial.
    t = t + jnp.sum(jnp.sqrt(jnp.sum(u * u, axis=-1) + 1e-4))
  return t


CASES = [
    # depth, width, fin, density_grad, cdt
    (8, 256, 96, True, 'float32'),     # flagship spatial trunk
    (8, 256, 201, False, 'float32'),   # flagship directional trunk
    (8, 256, 96, True, 'bfloat16'),
    (2, 256, 40, True, 'float32'),     # no skip layer at all
    (6, 128, 130, True, 'float32'),    # fin > 128 (two input lanes-tiles)
]


@pytest.mark.parametrize('depth,width,fin,dgrad,cdt', CASES)
def test_forward_matches_reference(depth, width, fin, dgrad, cdt):
  kernels, biases, wd, bd = _params(
      jax.random.PRNGKey(0), depth, width, fin)
  x = jax.random.normal(jax.random.PRNGKey(1), (67, fin))

  ref = fused_mlp.reference_trunk(
      x, kernels, biases, wd, bd, density_grad=dgrad, compute_dtype=cdt)
  out = fused_mlp.fused_trunk(
      x, kernels, biases, wd, bd, density_grad=dgrad, compute_dtype=cdt,
      block=32)
  tol = 1e-5 if cdt == 'float32' else 5e-2
  if dgrad:
    for a, b, name in zip(ref, out, ('y', 'sig', 'u')):
      np.testing.assert_allclose(a, b, atol=tol, rtol=tol, err_msg=name)
  else:
    np.testing.assert_allclose(ref[0], out[0], atol=tol, rtol=tol)
    np.testing.assert_allclose(ref[1], out[1], atol=tol, rtol=tol)


@pytest.mark.parametrize('depth,width,fin,dgrad,cdt', CASES)
def test_gradients_match_jax_ad(depth, width, fin, dgrad, cdt):
  kernels, biases, wd, bd = _params(
      jax.random.PRNGKey(2), depth, width, fin)
  x = jax.random.normal(jax.random.PRNGKey(3), (53, fin))

  def loss_ref(params, x):
    k, b, w, bb = params
    out = fused_mlp.reference_trunk(
        x, k, b, w, bb, density_grad=dgrad, compute_dtype=cdt)
    return _loss_terms(*out) if dgrad else _loss_terms(out[0], out[1])

  def loss_fused(params, x):
    k, b, w, bb = params
    out = fused_mlp.fused_trunk(
        x, k, b, w, bb, density_grad=dgrad, compute_dtype=cdt, block=32,
        needs_dx=True)
    return _loss_terms(*out) if dgrad else _loss_terms(out[0], out[1])

  params = (kernels, biases, wd, bd)
  gr = jax.grad(loss_ref, argnums=(0, 1))(params, x)
  gf = jax.grad(loss_fused, argnums=(0, 1))(params, x)
  tol = 2e-4 if cdt == 'float32' else 1e-1
  flat_r, _ = jax.tree.flatten(gr)
  flat_f, _ = jax.tree.flatten(gf)
  for a, b in zip(flat_r, flat_f):
    scale = max(1.0, float(jnp.max(jnp.abs(a))))
    np.testing.assert_allclose(a, b, atol=tol * scale, rtol=tol)


def test_plain_trunk_no_head():
  """Directional-trunk mode: no density head, first-order only."""
  kernels, biases, _, _ = _params(
      jax.random.PRNGKey(4), 4, 128, 72, head=False)
  x = jax.random.normal(jax.random.PRNGKey(5), (33, 72))

  y_ref = fused_mlp.reference_trunk(x, kernels, biases)
  y = fused_mlp.fused_trunk(x, kernels, biases, block=16)
  np.testing.assert_allclose(y_ref, y, atol=1e-5, rtol=1e-5)

  def loss(params, x):
    k, b = params
    return jnp.sum(jnp.cos(fused_mlp.fused_trunk(x, k, b, block=16,
                                                 needs_dx=True)))
  def loss_ref(params, x):
    k, b = params
    return jnp.sum(jnp.cos(fused_mlp.reference_trunk(x, k, b)))
  gr = jax.grad(loss_ref, argnums=(0, 1))((kernels, biases), x)
  gf = jax.grad(loss, argnums=(0, 1))((kernels, biases), x)
  for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_leading_dims_and_padding():
  """Ragged batch (padding) and [rays, samples] leading dims."""
  kernels, biases, wd, bd = _params(jax.random.PRNGKey(6), 3, 128, 50)
  x = jax.random.normal(jax.random.PRNGKey(7), (7, 11, 50))
  y, sig, u = fused_mlp.fused_trunk(
      x, kernels, biases, wd, bd, density_grad=True, block=64)
  yr, sr, ur = fused_mlp.reference_trunk(
      x, kernels, biases, wd, bd, density_grad=True)
  assert y.shape == (7, 11, 128) and sig.shape == (7, 11)
  assert u.shape == (7, 11, 50)
  np.testing.assert_allclose(yr, y, atol=1e-5, rtol=1e-5)
  np.testing.assert_allclose(sr, sig, atol=1e-5, rtol=1e-5)
  np.testing.assert_allclose(ur, u, atol=1e-5, rtol=1e-5)


def _heads(key, width, h1=5, h2=16):
  k1, k2, k3, k4 = jax.random.split(key, 4)
  wh = jax.random.normal(k1, (width, h1)) / np.sqrt(width)
  bh = jax.random.normal(k2, (h1,)) * 0.01
  wc = jax.random.normal(k3, (width, h2)) / np.sqrt(width)
  bc = jax.random.normal(k4, (h2,)) * 0.01
  return (wh, bh), (wc, bc)


@pytest.mark.parametrize('cdt', ['float32', 'bfloat16'])
def test_encoded_trunk_matches(cdt):
  """IPE segments + heads + projected density gradient vs the jnp mirror."""
  depth, width, nb, scales = 4, 128, 16, (1.0, 2.0, 4.0)
  F = nb * len(scales)
  kernels, biases, wd, bd = _params(jax.random.PRNGKey(8), depth, width,
                                    2 * F)
  hf, hc = _heads(jax.random.PRNGKey(9), width)
  m = jax.random.normal(jax.random.PRNGKey(10), (7, 9, nb)) * 3.0
  v = jax.nn.softplus(jax.random.normal(jax.random.PRNGKey(11), (7, 9, nb)))

  kw = dict(density_grad=True, head_f32=hf, head_cdt=hc, out_y=True,
            compute_dtype=cdt)
  ref = fused_mlp.reference_encoded_trunk(m, v, scales, kernels, biases,
                                          wd, bd, **kw)
  out = fused_mlp.fused_encoded_trunk(m, v, scales, kernels, biases,
                                      wd, bd, block=32, **kw)
  tol = 2e-5 if cdt == 'float32' else 5e-2
  for a, b, name in zip(ref, out, ('y', 'sig', 'h32', 'hcdt', 'u')):
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32),
                               atol=tol, rtol=tol, err_msg=name)


def test_encoded_trunk_high_frequency_scales():
  """Phase exactness at production scales (2^0..2^15): the in-kernel MXU
  scale expansion must not truncate lm before multiplying (HIGHEST
  precision dots), or sin/cos at deg 16 would be garbage."""
  depth, width, nb = 2, 64, 8
  scales = tuple(float(2 ** d) for d in range(16))
  F = nb * len(scales)
  kernels, biases, wd, bd = _params(jax.random.PRNGKey(20), depth, width,
                                    2 * F)
  m = jax.random.normal(jax.random.PRNGKey(21), (33, nb)) * 2.0
  v = 1e-4 * jax.nn.softplus(jax.random.normal(jax.random.PRNGKey(22),
                                               (33, nb)))
  kw = dict(density_grad=True, out_y=False)
  ref = fused_mlp.reference_encoded_trunk(m, v, scales, kernels, biases,
                                          wd, bd, **kw)
  out = fused_mlp.fused_encoded_trunk(m, v, scales, kernels, biases,
                                      wd, bd, block=16, **kw)
  for a, b, name in zip(ref, out, ('sig', 'u')):
    scale = max(1.0, float(jnp.max(jnp.abs(a))))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=3e-4 * scale, rtol=1e-4, err_msg=name)


@pytest.mark.parametrize('in_kernel_trig', [False, True])
def test_encoded_trunk_large_args_match_safe_sin(in_kernel_trig):
  """Large scaled means (>> 100pi) must range-reduce exactly like the plain
  path's mathx.safe_sin/safe_cos (reference internal/math.py:24-34), or the
  TPU-default fused path diverges from plain XLA at max_deg_point=16."""
  from refnerf_tpu.ops import mathx

  depth, width, nb = 2, 64, 8
  scales = tuple(float(2 ** d) for d in range(16))
  F = nb * len(scales)
  kernels, biases, wd, bd = _params(jax.random.PRNGKey(30), depth, width,
                                    2 * F)
  # |m * 2^15| ~ 3e5 >> 100pi: the un-reduced trig regime.
  m = jax.random.normal(jax.random.PRNGKey(31), (33, nb)) * 10.0
  v = 1e-4 * jax.nn.softplus(jax.random.normal(jax.random.PRNGKey(32),
                                               (33, nb)))
  sc = jnp.asarray(scales)
  m_s = jnp.reshape(m[..., None, :] * sc[:, None], (33, F))
  v_s = jnp.reshape(v[..., None, :] * sc[:, None] ** 2, (33, F))
  e = jnp.exp(-0.5 * v_s)
  plain_x = [e * mathx.safe_sin(m_s), e * mathx.safe_cos(m_s)]
  ref = fused_mlp.reference_trunk(plain_x, kernels, biases, wd, bd)
  out = fused_mlp.fused_encoded_trunk(m, v, scales, kernels, biases,
                                      wd, bd, block=16, out_y=True,
                                      in_kernel_trig=in_kernel_trig)
  # reference_trunk returns (y, sig); fused returns (y, sig).
  for a, b, name in zip(ref[:2], out[:2], ('y', 'sig')):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    assert np.all(np.isfinite(b)), name
    scale = max(1.0, float(np.max(np.abs(a))))
    np.testing.assert_allclose(a, b, atol=3e-4 * scale, rtol=1e-4,
                               err_msg=name)


def test_encoded_trunk_gradients():
  """Params grads (incl. second-order via u and head paths) match pure AD."""
  depth, width, nb, scales = 4, 128, 16, (1.0, 2.0, 4.0)
  F = nb * len(scales)
  kernels, biases, wd, bd = _params(jax.random.PRNGKey(12), depth, width,
                                    2 * F)
  hf, hc = _heads(jax.random.PRNGKey(13), width)
  m = jax.random.normal(jax.random.PRNGKey(14), (61, nb)) * 3.0
  v = jax.nn.softplus(jax.random.normal(jax.random.PRNGKey(15), (61, nb)))

  def loss(params, fn, extra):
    k, b, w, bb, (wh, bh), (wc, bc) = params
    sig, h, c, u = fn(m, v, scales, k, b, w, bb, density_grad=True,
                      head_f32=(wh, bh), head_cdt=(wc, bc), out_y=False,
                      **extra)
    return (jnp.sum(jnp.tanh(sig)) + jnp.sum(jnp.sin(h)) +
            jnp.sum(jnp.cos(c)) +
            jnp.sum(jnp.sqrt(jnp.sum(u * u, -1) + 1e-4)))

  params = (kernels, biases, wd, bd, hf, hc)
  gr = jax.grad(loss)(params, fused_mlp.reference_encoded_trunk, {})
  gf = jax.grad(loss)(params, fused_mlp.fused_encoded_trunk,
                      dict(block=32))
  for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gr),
                          jax.tree.leaves(gf)):
    scale = max(1e-3, float(jnp.max(jnp.abs(a))))
    np.testing.assert_allclose(a, b, atol=3e-4 * scale, rtol=1e-3,
                               err_msg=jax.tree_util.keystr(path))


def test_segmented_input_with_width1():
  """Segments (incl. a width-1 n.v segment), fused rgb head, dx grads."""
  depth, width = 4, 128
  dims = (32, 24, 1)
  fin = sum(dims)
  kernels, biases, _, _ = _params(jax.random.PRNGKey(16), depth, width, fin,
                                  head=False)
  hf, _ = _heads(jax.random.PRNGKey(17), width, h1=3)
  keys = jax.random.split(jax.random.PRNGKey(18), 3)
  segs = [jax.random.normal(k, (37, d)) for k, d in zip(keys, dims)]

  ref = fused_mlp.reference_trunk(segs, kernels, biases, head_f32=hf)
  out = fused_mlp.fused_trunk(segs, kernels, biases, head_f32=hf,
                              out_y=True, block=16)
  np.testing.assert_allclose(ref[0], out[0], atol=1e-5, rtol=1e-5)
  np.testing.assert_allclose(ref[1], out[1], atol=1e-5, rtol=1e-5)

  def loss(args, fn, extra):
    segs, k, b, hf = args
    o = fn(segs, k, b, head_f32=hf, **extra)
    y, h = o[0], o[1]
    return jnp.sum(jnp.sin(y)) + jnp.sum(h ** 2)

  args = (segs, kernels, biases, hf)
  gr = jax.grad(loss)(args, fused_mlp.reference_trunk, {})
  gf = jax.grad(loss)(args, fused_mlp.fused_trunk,
                      dict(out_y=True, needs_dx=True, block=16))
  for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gr),
                          jax.tree.leaves(gf)):
    scale = max(1e-3, float(jnp.max(jnp.abs(a))))
    np.testing.assert_allclose(a, b, atol=2e-4 * scale, rtol=1e-3,
                               err_msg=jax.tree_util.keystr(path))


def _ref_weights(sig, delta, act_bias):
  """Plain-jnp compositing of the trunk's raw density (the epilogue's
  contract; exactness of this form vs render.compute_alpha_weights is
  pinned in tests/test_epilogue_design.py)."""
  sigma = jax.nn.softplus(sig + act_bias)
  dd = sigma * delta
  # True exclusive cumsum: cumsum(dd) - dd would catastrophically cancel
  # against the opaque-background 1e10 interval.
  excl = jnp.concatenate(
      [jnp.zeros_like(dd[..., :1]), jnp.cumsum(dd[..., :-1], axis=-1)], -1)
  return (1.0 - jnp.exp(-dd)) * jnp.exp(-excl)


@pytest.mark.parametrize('cdt', ['float32', 'bfloat16'])
def test_encoded_trunk_fused_compositing_forward(cdt):
  """In-kernel transmittance weights match plain compositing of sigma,
  incl. rays packed 2-per-block (the block-diagonal scan mask) and an
  opaque-background-style huge final interval."""
  depth, width, nb, scales = 4, 128, 8, (1.0, 2.0, 4.0)
  F = nb * len(scales)
  kernels, biases, wd, bd = _params(jax.random.PRNGKey(40), depth, width,
                                    2 * F)
  rays, s = 6, 16
  m = jax.random.normal(jax.random.PRNGKey(41), (rays, s, nb)) * 3.0
  v = jax.nn.softplus(jax.random.normal(jax.random.PRNGKey(42),
                                        (rays, s, nb)))
  delta = jax.nn.softplus(
      jax.random.normal(jax.random.PRNGKey(43), (rays, s))) * 0.1
  delta = delta.at[:, -1].set(1e10)  # opaque background clamp

  sig_ref = fused_mlp.reference_encoded_trunk(
      m, v, scales, kernels, biases, wd, bd, out_y=False,
      compute_dtype=cdt)
  w_ref = _ref_weights(sig_ref, delta, act_bias=-1.0)

  sig, w = fused_mlp.fused_encoded_trunk(
      m, v, scales, kernels, biases, wd, bd, out_y=False,
      compute_dtype=cdt, block=32, delta=delta, act_bias=-1.0)
  tol = 2e-5 if cdt == 'float32' else 5e-2
  np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                             atol=tol, rtol=tol)
  # Weights sum to <= 1 per ray and the opaque background absorbs the rest.
  np.testing.assert_allclose(np.asarray(jnp.sum(w, -1)), 1.0, atol=tol)


def test_encoded_trunk_fused_compositing_gradients():
  """Param grads through the in-kernel weights (their VJP folds into the
  raw-density cotangent, incl. the bd/act-bias chain) match pure AD, with
  the density-gradient (normals) path active alongside."""
  depth, width, nb, scales = 4, 128, 8, (1.0, 2.0, 4.0)
  F = nb * len(scales)
  kernels, biases, wd, bd = _params(jax.random.PRNGKey(44), depth, width,
                                    2 * F)
  rays, s = 4, 16
  m = jax.random.normal(jax.random.PRNGKey(45), (rays, s, nb)) * 3.0
  v = jax.nn.softplus(jax.random.normal(jax.random.PRNGKey(46),
                                        (rays, s, nb)))
  delta = jax.nn.softplus(
      jax.random.normal(jax.random.PRNGKey(47), (rays, s))) * 0.1

  def loss_ref(params):
    k, b, w, bb = params
    sig, u = fused_mlp.reference_encoded_trunk(
        m, v, scales, k, b, w, bb, density_grad=True, out_y=False)
    wts = _ref_weights(sig, delta, act_bias=-1.0)
    return (jnp.sum(jnp.sin(wts * 3.0)) + 0.1 * jnp.sum(jnp.tanh(sig)) +
            jnp.sum(jnp.sqrt(jnp.sum(u * u, -1) + 1e-4)))

  def loss_fused(params):
    k, b, w, bb = params
    sig, u, wts = fused_mlp.fused_encoded_trunk(
        m, v, scales, k, b, w, bb, density_grad=True, out_y=False,
        block=32, delta=delta, act_bias=-1.0)
    return (jnp.sum(jnp.sin(wts * 3.0)) + 0.1 * jnp.sum(jnp.tanh(sig)) +
            jnp.sum(jnp.sqrt(jnp.sum(u * u, -1) + 1e-4)))

  params = (kernels, biases, wd, bd)
  gr = jax.grad(loss_ref)(params)
  gf = jax.grad(loss_fused)(params)
  for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gr),
                          jax.tree.leaves(gf)):
    scale = max(1e-3, float(jnp.max(jnp.abs(a))))
    np.testing.assert_allclose(a, b, atol=3e-4 * scale, rtol=1e-3,
                               err_msg=jax.tree_util.keystr(path))


# ---------------------------------------------------------------------------
# In-kernel integrated directional encoding (TrunkCfg.ide).


def _ide_inputs(key, n, deg):
  k1, k2, k3, k4 = jax.random.split(key, 4)
  rd = jax.random.normal(k1, (n, 3))
  rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
  ki = jax.nn.softplus(jax.random.normal(k2, (n, 1)))
  seg0 = jax.random.normal(k3, (n, 24))
  dot = jax.random.normal(k4, (n, 1))
  return seg0, rd, ki, dot


def _ide_enc(deg, rd, ki):
  from refnerf_tpu.ops import ref_utils
  return ref_utils.generate_ide_fn(deg)(rd, ki)


@pytest.mark.parametrize('deg,cdt', [(3, 'float32'), (5, 'float32'),
                                     (5, 'bfloat16')])
def test_ide_trunk_forward_matches(deg, cdt):
  """IDE computed in-kernel == XLA generate_ide_fn feeding the trunk."""
  p2 = 2 * fused_mlp.ide_tables(deg)[0].shape[1]
  fin = 24 + p2 + 1
  kernels, biases, _, _ = _params(jax.random.PRNGKey(50), 4, 64, fin,
                                  head=False)
  wh = jax.random.normal(jax.random.PRNGKey(51), (64, 3)) / 8.0
  bh = jax.random.normal(jax.random.PRNGKey(52), (3,)) * 0.01
  seg0, rd, ki, dot = _ide_inputs(jax.random.PRNGKey(53), 67, deg)

  enc = _ide_enc(deg, rd, ki)
  ref = fused_mlp.reference_trunk([seg0, enc, dot], kernels, biases,
                                  head_f32=(wh, bh), compute_dtype=cdt)
  out = fused_mlp.fused_trunk([seg0, (rd, ki), dot], kernels, biases,
                              head_f32=(wh, bh), out_y=True,
                              compute_dtype=cdt, block=32,
                              ide_deg=deg, ide_at=1)
  tol = 1e-5 if cdt == 'float32' else 5e-2
  for a, b, name in zip(ref, out, ('y', 'h')):
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32),
                               atol=tol, rtol=tol, err_msg=name)


@pytest.mark.parametrize('deg', [3, 5])
def test_ide_trunk_gradients_match(deg):
  """d loss/d {refdirs, kappa_inv, segments, params} vs jax AD through
  ref_utils.generate_ide_fn + the plain trunk."""
  p2 = 2 * fused_mlp.ide_tables(deg)[0].shape[1]
  fin = 24 + p2 + 1
  kernels, biases, _, _ = _params(jax.random.PRNGKey(54), 4, 64, fin,
                                  head=False)
  wh = jax.random.normal(jax.random.PRNGKey(55), (64, 3)) / 8.0
  bh = jax.random.normal(jax.random.PRNGKey(56), (3,)) * 0.01
  seg0, rd, ki, dot = _ide_inputs(jax.random.PRNGKey(57), 53, deg)

  def loss_ref(params, seg0, rd, ki, dot):
    k, b = params
    enc = _ide_enc(deg, rd, ki)
    _, h = fused_mlp.reference_trunk([seg0, enc, dot], k, b,
                                     head_f32=(wh, bh))
    return jnp.sum(jnp.sin(h * 0.7))

  def loss_fused(params, seg0, rd, ki, dot):
    k, b = params
    _, h = fused_mlp.fused_trunk([seg0, (rd, ki), dot], k, b,
                                 head_f32=(wh, bh), out_y=True,
                                 needs_dx=True, block=32,
                                 ide_deg=deg, ide_at=1)
    return jnp.sum(jnp.sin(h * 0.7))

  args = ((kernels, biases), seg0, rd, ki, dot)
  gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
  gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
  for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gr),
                          jax.tree.leaves(gf)):
    scale = max(1e-3, float(jnp.max(jnp.abs(a))))
    np.testing.assert_allclose(a, b, atol=2e-4 * scale, rtol=2e-4,
                               err_msg=jax.tree_util.keystr(path))


def test_ide_trunk_no_bottleneck_slot_zero():
  """ide_at=0 (no bottleneck): the IDE pair leads the segment list."""
  deg = 4
  p2 = 2 * fused_mlp.ide_tables(deg)[0].shape[1]
  kernels, biases, _, _ = _params(jax.random.PRNGKey(58), 3, 32, p2 + 1,
                                  head=False)
  _, rd, ki, dot = _ide_inputs(jax.random.PRNGKey(59), 33, deg)
  enc = _ide_enc(deg, rd, ki)
  ref = fused_mlp.reference_trunk([enc, dot], kernels, biases)
  out = fused_mlp.fused_trunk([(rd, ki), dot], kernels, biases,
                              block=16, ide_deg=deg, ide_at=0)
  np.testing.assert_allclose(ref, out, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# In-kernel Ref-NeRF rgb epilogue (TrunkCfg.rgbe).


def _rgb_chain_ref(raw, rawd, rawt, premult, bias, pad):
  """mlp.py:491-518 color chain (the reference for the in-kernel fold)."""
  from refnerf_tpu.ops import image as image_ops
  rgb = jax.nn.sigmoid(premult * raw + bias)
  diffuse_linear = jax.nn.sigmoid(rawd - jnp.log(3.0))
  tint = jax.nn.sigmoid(rawt)
  specular_linear = tint * rgb
  rgb = specular_linear + diffuse_linear
  rgb_norm = jnp.maximum(rgb.max(axis=-1, keepdims=True),
                         jnp.ones_like(rgb[..., :1]))
  rgb = rgb / rgb_norm
  rgb = jnp.clip(image_ops.linear_to_srgb(rgb), 0.0, 1.0)
  return rgb * (1 + 2 * pad) - pad


def _rgbe_setup(key, n=67, fin=40, width=64, scale=1.0):
  kernels, biases, _, _ = _params(jax.random.PRNGKey(60), 3, width, fin,
                                  head=False)
  k1, k2, k3, k4, k5 = jax.random.split(key, 5)
  wh = jax.random.normal(k1, (width, 3)) / 4.0
  bh = jax.random.normal(k2, (3,)) * 0.1
  x = jax.random.normal(k3, (n, fin))
  # `scale` pushes raw diffuse/tint up so the gamut normalization (and its
  # 0.5-at-tie max/clip subgradients) actually engages.
  rawd = jax.random.normal(k4, (n, 3)) * scale + (scale - 1.0)
  rawt = jax.random.normal(k5, (n, 3)) * scale + (scale - 1.0)
  return kernels, biases, (wh, bh), x, rawd, rawt


@pytest.mark.parametrize('scale', [1.0, 4.0])
def test_rgb_epilogue_forward_matches(scale):
  kernels, biases, hf, x, rawd, rawt = _rgbe_setup(
      jax.random.PRNGKey(61), scale=scale)
  raw = fused_mlp.reference_trunk(x, kernels, biases, head_f32=hf)[1]
  want = _rgb_chain_ref(raw, rawd, rawt, 1.3, -0.2, 0.001)
  _, got = fused_mlp.fused_trunk(
      x, kernels, biases, head_f32=hf, out_y=False, block=32,
      rgb_epilogue=(rawd, rawt, 1.3, -0.2, 0.001))
  if scale > 1:  # the regime the normalization exists for must be hit
    assert np.asarray(raw_norm_active(rawd, rawt, raw)).any()
  np.testing.assert_allclose(want, got, atol=1e-6, rtol=1e-6)


def raw_norm_active(rawd, rawt, raw):
  c = (jax.nn.sigmoid(rawt) * jax.nn.sigmoid(raw)
       + jax.nn.sigmoid(rawd - jnp.log(3.0)))
  return c.max(-1) > 1.0


@pytest.mark.parametrize('scale', [1.0, 4.0])
def test_rgb_epilogue_gradients_match(scale):
  """d loss/d {x, rawd, rawt, params} vs jax AD of the XLA chain -
  including at gamut-normalized samples where max/clip subgradient ties
  are exact (cn == 1.0 at the argmax channel)."""
  kernels, biases, hf, x, rawd, rawt = _rgbe_setup(
      jax.random.PRNGKey(62), scale=scale)

  def loss_ref(params, x, rawd, rawt):
    k, b = params
    raw = fused_mlp.reference_trunk(x, k, b, head_f32=hf)[1]
    rgb = _rgb_chain_ref(raw, rawd, rawt, 1.3, -0.2, 0.001)
    return jnp.sum(jnp.sin(rgb * 3.0))

  def loss_fused(params, x, rawd, rawt):
    k, b = params
    _, rgb = fused_mlp.fused_trunk(
        x, k, b, head_f32=hf, out_y=False, needs_dx=True, block=32,
        rgb_epilogue=(rawd, rawt, 1.3, -0.2, 0.001))
    return jnp.sum(jnp.sin(rgb * 3.0))

  args = ((kernels, biases), x, rawd, rawt)
  gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
  gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
  for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gr),
                          jax.tree.leaves(gf)):
    scale_ = max(1e-3, float(jnp.max(jnp.abs(a))))
    np.testing.assert_allclose(a, b, atol=2e-5 * scale_, rtol=2e-5,
                               err_msg=jax.tree_util.keystr(path))


def test_rgb_epilogue_with_raw_head_cotangent():
  """raw_rgb (the h_f32 output) stays available alongside the fused rgb;
  a loss touching BOTH must accumulate both head cotangents."""
  kernels, biases, hf, x, rawd, rawt = _rgbe_setup(jax.random.PRNGKey(63))

  def loss_ref(params):
    k, b = params
    raw = fused_mlp.reference_trunk(x, k, b, head_f32=hf)[1]
    rgb = _rgb_chain_ref(raw, rawd, rawt, 1.0, 0.0, 0.001)
    return jnp.sum(rgb ** 2) + jnp.sum(jnp.tanh(raw))

  def loss_fused(params):
    k, b = params
    raw, rgb = fused_mlp.fused_trunk(
        x, k, b, head_f32=hf, out_y=False, needs_dx=True, block=32,
        rgb_epilogue=(rawd, rawt, 1.0, 0.0, 0.001))
    return jnp.sum(rgb ** 2) + jnp.sum(jnp.tanh(raw))

  gr = jax.grad(loss_ref)((kernels, biases))
  gf = jax.grad(loss_fused)((kernels, biases))
  for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gr),
                          jax.tree.leaves(gf)):
    s = max(1e-3, float(jnp.max(jnp.abs(a))))
    np.testing.assert_allclose(a, b, atol=2e-5 * s, rtol=2e-5,
                               err_msg=jax.tree_util.keystr(path))


# ---------------------------------------------------------------------------
# In-kernel directional geometry (TrunkCfg.ide_geo).


def _geo_ref_segments(deg, gp, v, ki):
  from refnerf_tpu.ops import ref_utils
  n = -ref_utils.l2_normalize(gp)
  rd = ref_utils.reflect(-v, n)
  nd = jnp.sum(n * v, axis=-1, keepdims=True)
  enc = ref_utils.generate_ide_fn(deg)(rd, ki)
  p = enc.shape[-1] // 2
  return enc[..., :p], enc[..., p:], nd


@pytest.mark.parametrize('deg', [3, 5])
def test_ide_geo_trunk_forward_matches(deg):
  """normalize -> reflect -> IDE -> n.v all in-kernel == the XLA chain."""
  p2 = 2 * fused_mlp.ide_tables(deg)[0].shape[1]
  fin = 24 + p2 + 1
  kernels, biases, _, _ = _params(jax.random.PRNGKey(70), 4, 64, fin,
                                  head=False)
  wh = jax.random.normal(jax.random.PRNGKey(71), (64, 3)) / 8.0
  bh = jax.random.normal(jax.random.PRNGKey(72), (3,)) * 0.01
  seg0, v, ki, _ = _ide_inputs(jax.random.PRNGKey(73), 67, deg)
  gp = jax.random.normal(jax.random.PRNGKey(74), (67, 3))

  re, im, nd = _geo_ref_segments(deg, gp, v, ki)
  ref = fused_mlp.reference_trunk(
      [seg0, jnp.concatenate([re, im], -1), nd], kernels, biases,
      head_f32=(wh, bh))
  out = fused_mlp.fused_trunk(
      [seg0, (gp, v, ki)], kernels, biases, head_f32=(wh, bh), out_y=True,
      block=32, ide_deg=deg, ide_at=1, ide_geo=True)
  for a, b, name in zip(ref, out, ('y', 'h')):
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5, err_msg=name)


def test_ide_geo_trunk_gradients_match():
  """d loss/d {grad, viewdirs, kappa_inv, seg0, params} vs jax AD through
  the XLA normalize/reflect/IDE/n.v chain."""
  deg = 4
  p2 = 2 * fused_mlp.ide_tables(deg)[0].shape[1]
  fin = 24 + p2 + 1
  kernels, biases, _, _ = _params(jax.random.PRNGKey(75), 4, 64, fin,
                                  head=False)
  wh = jax.random.normal(jax.random.PRNGKey(76), (64, 3)) / 8.0
  bh = jax.random.normal(jax.random.PRNGKey(77), (3,)) * 0.01
  seg0, v, ki, _ = _ide_inputs(jax.random.PRNGKey(78), 53, deg)
  gp = jax.random.normal(jax.random.PRNGKey(79), (53, 3))

  def loss_ref(params, seg0, gp, v, ki):
    k, b = params
    re, im, nd = _geo_ref_segments(deg, gp, v, ki)
    _, h = fused_mlp.reference_trunk(
        [seg0, jnp.concatenate([re, im], -1), nd], k, b, head_f32=(wh, bh))
    return jnp.sum(jnp.sin(h * 0.7))

  def loss_fused(params, seg0, gp, v, ki):
    k, b = params
    _, h = fused_mlp.fused_trunk(
        [seg0, (gp, v, ki)], k, b, head_f32=(wh, bh), out_y=True,
        needs_dx=True, block=32, ide_deg=deg, ide_at=1, ide_geo=True)
    return jnp.sum(jnp.sin(h * 0.7))

  args = ((kernels, biases), seg0, gp, v, ki)
  gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
  gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
  for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gr),
                          jax.tree.leaves(gf)):
    scale = max(1e-3, float(jnp.max(jnp.abs(a))))
    np.testing.assert_allclose(a, b, atol=2e-4 * scale, rtol=2e-4,
                               err_msg=jax.tree_util.keystr(path))


def test_kernel_helper_copies_match_ops():
  """The kernel re-implements linear_to_srgb / safe-trig reduction /
  reflect+normalize geometry for in-kernel use; the fused-vs-XLA equality
  contract depends on these copies never drifting from the ops versions.
  Pin them together."""
  from refnerf_tpu.ops import image as image_ops
  from refnerf_tpu.ops import mathx
  from refnerf_tpu.ops import ref_utils

  rng = np.random.RandomState(3)
  x = jnp.asarray(rng.uniform(0, 1, (257,)).astype(np.float32))
  np.testing.assert_array_equal(
      np.asarray(fused_mlp._linear_to_srgb(x)),
      np.asarray(image_ops.linear_to_srgb(x)))

  # safe_sin/cos(x) == sin/cos(_safe_trig_arg(x)) incl. the wrap boundary.
  big = jnp.asarray(
      rng.uniform(-1e6, 1e6, (4097,)).astype(np.float32))
  np.testing.assert_allclose(
      np.asarray(jnp.sin(fused_mlp._safe_trig_arg(big))),
      np.asarray(mathx.safe_sin(big)), atol=1e-6)
  np.testing.assert_allclose(
      np.asarray(jnp.cos(fused_mlp._safe_trig_arg(big))),
      np.asarray(mathx.safe_cos(big)), atol=1e-6)

  grad = jnp.asarray(rng.randn(64, 3).astype(np.float32))
  v = jnp.asarray(rng.randn(64, 3).astype(np.float32))
  v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
  r_kernel, nd_kernel = fused_mlp._dir_geometry(grad, v)
  normals = -ref_utils.l2_normalize(grad)
  r_ops = ref_utils.reflect(-v, normals)
  nd_ops = jnp.sum(normals * v, axis=-1, keepdims=True)
  np.testing.assert_allclose(np.asarray(r_kernel), np.asarray(r_ops),
                             atol=1e-6)
  np.testing.assert_allclose(np.asarray(nd_kernel), np.asarray(nd_ops),
                             atol=1e-6)
