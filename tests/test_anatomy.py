"""Fused hard-label anatomy dice vs the dense one-hot composition.

pallas/anatomy.py must reproduce soft_dice_on_probs(grid_sample(one_hot(m)),
f) — value AND deformation gradient — at C=1 kernel cost (interpret mode).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepatlas_tpu.losses import soft_dice_on_probs
from deepatlas_tpu.ops import grid_sample, identity_grid_batch, one_hot
from deepatlas_tpu.pallas.anatomy import binned_sum, hard_anatomy_dice

D, H, W, NC = 24, 20, 36, 6
TZ, R = 4, 3


def smooth_field(rng, amp):
    disp = rng.rand(1, D, H, W, 3).astype(np.float32) * 2.0 - 1.0
    scale = np.array([amp * 2.0 / (W - 1), amp * 2.0 / (H - 1),
                      amp * 2.0 / (D - 1)], np.float32)
    return jnp.asarray(disp * scale)


def dense_loss(lab_m, lab_f, deform):
    warped = grid_sample(one_hot(lab_m, NC, dtype=jnp.float32), deform,
                         mode="trilinear")
    return soft_dice_on_probs(warped, lab_f, NC)


@pytest.fixture
def data(rng):
    lab_m = jnp.asarray(rng.randint(0, NC, (1, D, H, W)).astype(np.int32))
    lab_f = jnp.asarray(rng.randint(0, NC, (1, D, H, W)).astype(np.int32))
    grid = smooth_field(rng, R - 1.0) + identity_grid_batch((1, D, H, W, 3))
    return lab_m, lab_f, grid


def test_binned_sum_matches_bincount(rng):
    v = jnp.asarray(rng.rand(1000).astype(np.float32))
    l = jnp.asarray(rng.randint(0, NC, (1000,)).astype(np.int32))
    got = np.asarray(binned_sum(v, l, NC, chunk=256))
    want = np.array([float(v[l == c].sum()) for c in range(NC)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.slow
def test_value_matches_dense(data):
    lab_m, lab_f, grid = data
    fused = hard_anatomy_dice(lab_m, lab_f, grid, NC, max_disp=R,
                              z_tile=TZ, interpret=True)
    ref = dense_loss(lab_m, lab_f, grid)
    np.testing.assert_allclose(float(fused), float(ref), atol=1e-5,
                               rtol=1e-5)


@pytest.mark.slow
def test_grad_matches_dense(data):
    lab_m, lab_f, grid = data
    g_fused = jax.grad(lambda g: hard_anatomy_dice(
        lab_m, lab_f, g, NC, max_disp=R, z_tile=TZ, interpret=True))(grid)
    g_ref = jax.grad(lambda g: dense_loss(lab_m, lab_f, g))(grid)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_fused_grad_matches_dense(data):
    # fused_grad=True computes the gradient planes IN the forward kernel
    # (one joint-loop sweep; elementwise backward) — value and grad must
    # be exactly the recomputing path's, i.e. the dense composition's
    lab_m, lab_f, grid = data

    def loss(g):
        return hard_anatomy_dice(lab_m, lab_f, g, NC, max_disp=R,
                                 z_tile=TZ, fused_grad=True, interpret=True)

    val, g_fused = jax.value_and_grad(loss)(grid)
    ref = dense_loss(lab_m, lab_f, grid)
    g_ref = jax.grad(lambda g: dense_loss(lab_m, lab_f, g))(grid)
    np.testing.assert_allclose(float(val), float(ref), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=2e-4, rtol=1e-3)


def test_identity_deform_is_plain_dice(data):
    lab_m, lab_f, _ = data
    grid = identity_grid_batch((1, D, H, W, 3))
    fused = hard_anatomy_dice(lab_m, lab_f, grid, NC, max_disp=R,
                              z_tile=TZ, interpret=True)
    ref = dense_loss(lab_m, lab_f, grid)
    np.testing.assert_allclose(float(fused), float(ref), atol=1e-5)


def test_tiny_volume_fallback(rng):
    lab_m = jnp.asarray(rng.randint(0, NC, (1, 8, 10, 12)).astype(np.int32))
    lab_f = jnp.asarray(rng.randint(0, NC, (1, 8, 10, 12)).astype(np.int32))
    grid = identity_grid_batch((1, 8, 10, 12, 3))
    fused = hard_anatomy_dice(lab_m, lab_f, grid, NC, max_disp=R,
                              z_tile=TZ, interpret=True)
    warped = grid_sample(one_hot(lab_m, NC, dtype=jnp.float32), grid,
                         mode="trilinear")
    ref = soft_dice_on_probs(warped, lab_f, NC)
    np.testing.assert_allclose(float(fused), float(ref), atol=1e-6)
