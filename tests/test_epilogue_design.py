"""Numerical oracle for the planned in-kernel alpha-compositing epilogue.

TODO.md queues fusing `render.compute_alpha_weights` into the spatial
Pallas kernel's epilogue (reference compositing: internal/render.py:132-149).
The kernel-side formulation differs from the jnp one in two ways that this
file pins BEFORE the port, so the kernel has an exact oracle:

1. Forward: the exclusive cumsum over samples becomes a strictly-lower-
   triangular [S, S] matmul on the MXU (Mosaic has no native cumsum
   lowering; see the resampler post-mortem in docs/DESIGN.md). Rows are
   ray-major/samples-minor, so a fused block of B rows holds exactly
   B // S whole rays and needs no cross-block carry.
2. Backward: the kernel's custom VJP must produce d(loss)/d(raw_density)
   by hand. With dd_i = sigma_i * delta_i, alpha_i = 1 - exp(-dd_i),
   T_i = exp(-sum_{j<i} dd_j), w_i = alpha_i * T_i:

     d w_i / d dd_k = T_i * exp(-dd_i)   if k == i
                    = -w_i               if k <  i

   so ct_dd = ct_w * (T - w) - rev_excl_cumsum(ct_w * w), where
   rev_excl_cumsum is the reversed (suffix) exclusive sum - the SAME
   triangular matmul transposed. Then ct_sigma = ct_dd * delta and
   ct_raw = ct_sigma * sigmoid(raw + bias) (softplus' = sigmoid).

Both are asserted here against compute_alpha_weights + jax.grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refnerf_tpu.models import render

jax.config.update('jax_enable_x64', False)


def _tri_excl(s, dtype=jnp.float32):
  """Strictly-lower-triangular ones: y = x @ L.T is an exclusive cumsum."""
  return jnp.asarray(np.tril(np.ones((s, s), np.float32), k=-1), dtype)


def epilogue_forward(raw_density, tdist, dirs, density_bias=-1.0):
  """Kernel-shaped weights: softplus density + triangular-matmul scan.

  Mirrors model.py:152 (softplus(raw + bias) from mlp.py:378 feeding
  compute_alpha_weights); written with only ops the Mosaic port can use:
  elementwise exp/sigmoid/softplus and [R,S]@[S,S] matmuls.
  """
  sigma = jax.nn.softplus(raw_density + density_bias)
  delta = (tdist[..., 1:] - tdist[..., :-1]) * jnp.linalg.norm(
      dirs, axis=-1, keepdims=True)
  dd = sigma * delta
  excl = dd @ _tri_excl(dd.shape[-1]).T      # exclusive prefix sum
  trans = jnp.exp(-excl)
  alpha = 1.0 - jnp.exp(-dd)
  return alpha * trans, trans, dd, delta


def epilogue_vjp(ct_w, raw_density, tdist, dirs, density_bias=-1.0):
  """Hand VJP d(ct_w . w)/d(raw_density) in the kernel's op vocabulary."""
  w, trans, dd, delta = epilogue_forward(raw_density, tdist, dirs,
                                         density_bias)
  # suffix (reversed exclusive) sum = the same triangular matmul,
  # untransposed: (x @ L)_k = sum_{i>k} x_i.
  suffix = (ct_w * w) @ _tri_excl(dd.shape[-1])
  ct_dd = ct_w * (trans - w) - suffix
  ct_sigma = ct_dd * delta
  return ct_sigma * jax.nn.sigmoid(raw_density + density_bias)


@pytest.fixture
def problem():
  rng = np.random.RandomState(0)
  rays, s = 12, 16
  raw = jnp.asarray(rng.randn(rays, s).astype(np.float32))
  t = np.sort(rng.uniform(2.0, 6.0, (rays, s + 1)).astype(np.float32), -1)
  dirs = rng.randn(rays, 3).astype(np.float32)
  return raw, jnp.asarray(t), jnp.asarray(dirs)


def test_forward_matches_compute_alpha_weights(problem):
  raw, tdist, dirs = problem
  w, trans, _, _ = epilogue_forward(raw, tdist, dirs)
  sigma = jax.nn.softplus(raw - 1.0)
  w_ref, _, trans_ref = render.compute_alpha_weights(sigma, tdist, dirs)
  np.testing.assert_allclose(w, w_ref, rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(trans, trans_ref, rtol=1e-5, atol=1e-6)


def test_manual_vjp_matches_autodiff(problem):
  raw, tdist, dirs = problem
  rng = np.random.RandomState(1)
  ct_w = jnp.asarray(rng.randn(*raw.shape).astype(np.float32))

  def loss(raw):
    sigma = jax.nn.softplus(raw - 1.0)
    w = render.compute_alpha_weights(sigma, tdist, dirs)[0]
    return jnp.sum(ct_w * w)

  ct_auto = jax.grad(loss)(raw)
  ct_manual = epilogue_vjp(ct_w, raw, tdist, dirs)
  np.testing.assert_allclose(ct_manual, ct_auto, rtol=1e-4, atol=1e-5)


def test_blockwise_no_carry(problem):
  """Whole-ray blocks compose: per-block results equal the full batch."""
  raw, tdist, dirs = problem
  w_full = epilogue_forward(raw, tdist, dirs)[0]
  blocks = [epilogue_forward(raw[i:i + 4], tdist[i:i + 4], dirs[i:i + 4])[0]
            for i in range(0, raw.shape[0], 4)]
  np.testing.assert_allclose(jnp.concatenate(blocks), w_full,
                             rtol=1e-6, atol=0)


def test_second_order_grads_flow(problem):
  """The epilogue sits inside a step whose params get second-order
  cotangents (nested-grad normals); its VJP formulation must itself be
  differentiable without custom rules."""
  raw, tdist, dirs = problem
  ct_w = jnp.ones_like(raw)
  g = jax.grad(lambda r: jnp.sum(epilogue_vjp(ct_w, r, tdist, dirs)))(raw)
  assert np.all(np.isfinite(np.asarray(g)))
