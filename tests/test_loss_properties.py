"""Property tests for loss-library semantics (zeros, bounds, torch ddof)."""

import types

import jax.numpy as jnp
import numpy as np
import pytest

from refnerf_tpu.ops import ref_utils
from refnerf_tpu.train import losses


def _cfg(**kw):
  return types.SimpleNamespace(**kw)


def test_masked_mean_matches_numpy_and_is_zero_safe():
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.randn(32, 7).astype(np.float32))
  mask = jnp.asarray(rng.uniform(size=(32, 7)) < 0.3)
  got = losses._masked_mean(x, mask)
  want = np.asarray(x)[np.asarray(mask)].mean()
  np.testing.assert_allclose(got, want, rtol=1e-5)
  # Empty mask: denominator floor keeps it finite (and zero).
  empty = losses._masked_mean(x, jnp.zeros_like(mask))
  assert float(empty) == 0.0
  # Broadcasting masks (per-ray) behaves like repeating them per sample.
  row_mask = jnp.asarray(rng.uniform(size=(32, 1)) < 0.5)
  got_b = losses._masked_mean(x, row_mask)
  want_b = np.asarray(x)[np.broadcast_to(np.asarray(row_mask),
                                         x.shape)].mean()
  np.testing.assert_allclose(got_b, want_b, rtol=1e-5)


def test_var_unbiased_is_torch_var():
  rng = np.random.RandomState(1)
  x = jnp.asarray(rng.randn(5, 9).astype(np.float32))
  got = losses._var_unbiased(x, axis=0)
  want = np.var(np.asarray(x), axis=0, ddof=1, keepdims=True)
  np.testing.assert_allclose(got, want, rtol=1e-4)


def test_orientation_terms_zero_for_front_facing():
  rng = np.random.RandomState(2)
  w = jnp.asarray(rng.uniform(0, 1, (8, 6)).astype(np.float32))
  v = jnp.asarray(
      rng.randn(8, 3).astype(np.float32))
  v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
  # Normals exactly along v: n.v = 1 > 0 -> zero penalty.
  n = jnp.broadcast_to(v[:, None, :], (8, 6, 3))
  np.testing.assert_allclose(
      ref_utils.orientation_loss_terms(w, n, v), 0.0, atol=1e-7)
  # Normals opposite v: penalty = w * 1.
  np.testing.assert_allclose(
      ref_utils.orientation_loss_terms(w, -n, v), np.asarray(w), atol=1e-6)
  # Always nonnegative for random normals.
  nr = jnp.asarray(rng.randn(8, 6, 3).astype(np.float32))
  nr = nr / jnp.linalg.norm(nr, axis=-1, keepdims=True)
  assert bool(jnp.all(ref_utils.orientation_loss_terms(w, nr, v) >= 0))


def test_predicted_normal_loss_zero_iff_aligned():
  rng = np.random.RandomState(3)
  w = jnp.asarray(rng.uniform(0, 1, (8, 6)).astype(np.float32))
  n = jnp.asarray(rng.randn(8, 6, 3).astype(np.float32))
  n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
  cfg = _cfg(predicted_normal_loss_mult=1.0,
             predicted_normal_coarse_loss_mult=1.0)
  hist = [dict(weights=w, normals=n, normals_pred=n)]
  np.testing.assert_allclose(
      losses.predicted_normal_loss(1, hist, cfg), 0.0, atol=1e-6)
  hist_anti = [dict(weights=w, normals=n, normals_pred=-n)]
  # Anti-aligned: per-sample term w * 2.
  np.testing.assert_allclose(
      losses.predicted_normal_loss(1, hist_anti, cfg),
      float(jnp.mean((2 * w).sum(-1))), rtol=1e-5)


def test_accumulated_weights_loss_zero_at_full_opacity():
  cfg = _cfg(accumulated_weights_loss_mult=2.0)
  rend = [dict(acc=jnp.ones((16,)))]
  assert float(losses.accumulated_weights_loss(rend, cfg)) == 0.0
  rend = [dict(acc=jnp.full((16,), 0.5))]
  np.testing.assert_allclose(losses.accumulated_weights_loss(rend, cfg),
                             2.0 * 0.25, rtol=1e-6)


def test_weights_entropy_zero_for_onehot_and_positive_otherwise():
  cfg = _cfg(acc_threshold_for_weights_entropy_loss=0.5,
             weights_entropy_loss_mult=1.0,
             weights_entropy_coarse_loss_mult=1.0)
  onehot = jnp.zeros((8, 6)).at[:, 2].set(1.0)
  rend = [dict(acc=onehot.sum(-1))]
  hist = [dict(weights=onehot)]
  np.testing.assert_allclose(
      losses.weights_entropy_loss(1, rend, hist, cfg, warmup_ratio=1.0),
      0.0, atol=1e-5)
  uniform = jnp.full((8, 6), 1.0 / 6)
  rend = [dict(acc=uniform.sum(-1))]
  hist = [dict(weights=uniform)]
  ent = losses.weights_entropy_loss(1, rend, hist, cfg, warmup_ratio=1.0)
  np.testing.assert_allclose(ent, np.log(6.0), rtol=1e-3)
  # Below the acc threshold nothing contributes.
  rend = [dict(acc=jnp.full((8,), 0.2))]
  assert float(losses.weights_entropy_loss(1, rend, hist, cfg,
                                           warmup_ratio=1.0)) == 0.0


def test_interlevel_loss_zero_when_proposal_dominates():
  cfg = _cfg(interlevel_loss_mult=1.0)
  n, s = 8, 16
  t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, s + 1), (n, s + 1))
  rng = np.random.RandomState(4)
  w_nerf = jnp.asarray(rng.uniform(0, 1, (n, s)).astype(np.float32))
  w_nerf = w_nerf / w_nerf.sum(-1, keepdims=True)
  # Proposal envelope == nerf histogram on the same grid: no excess.
  hist = [dict(sdist=t, weights=w_nerf), dict(sdist=t, weights=w_nerf)]
  np.testing.assert_allclose(losses.interlevel_loss(hist, cfg), 0.0,
                             atol=1e-6)
  # Starving proposal (all mass elsewhere) must be penalized.
  w_prop = jnp.zeros_like(w_nerf).at[:, 0].set(1.0)
  hist = [dict(sdist=t, weights=w_prop), dict(sdist=t, weights=w_nerf)]
  assert float(losses.interlevel_loss(hist, cfg)) > 1e-3


def test_distortion_loss_scales_with_spread():
  cfg = _cfg(distortion_loss_mult=1.0)
  n, s = 8, 16
  t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, s + 1), (n, s + 1))
  concentrated = jnp.zeros((n, s)).at[:, 7].set(1.0)
  uniform = jnp.full((n, s), 1.0 / s)
  l_c = float(losses.distortion_loss([dict(sdist=t, weights=concentrated)],
                                     cfg))
  l_u = float(losses.distortion_loss([dict(sdist=t, weights=uniform)], cfg))
  assert l_c < l_u, 'spread-out mass must cost more distortion'
