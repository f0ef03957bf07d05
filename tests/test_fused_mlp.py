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
