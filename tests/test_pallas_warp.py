"""Pallas warp kernel vs the XLA reference (interpret mode on CPU).

SURVEY.md §4(e): Pallas kernel equivalence tests run in interpreter mode
against the ops/warp.py composition (itself bit-matched to torch
grid_sample in test_warp.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepatlas_tpu.ops import grid_sample, identity_grid_batch
from deepatlas_tpu.pallas import pallas_grid_sample, pallas_warp

D, H, W = 24, 20, 36
TZ, R = 4, 3


def make_field(rng, amplitude_vox):
    """Smooth random displacement field bounded by ``amplitude_vox``."""
    disp = rng.rand(1, D, H, W, 3).astype(np.float32) * 2.0 - 1.0
    # scale normalized units so the voxel displacement stays in bound
    scale = np.array([amplitude_vox * 2.0 / (W - 1),
                      amplitude_vox * 2.0 / (H - 1),
                      amplitude_vox * 2.0 / (D - 1)], np.float32)
    return disp * scale


class TestPallasForward:
    def test_identity_grid_roundtrip(self, rng):
        vol = jnp.asarray(rng.rand(1, D, H, W, 1).astype(np.float32))
        grid = identity_grid_batch((1, D, H, W, 3))
        out = pallas_grid_sample(vol, grid, max_disp=R, z_tile=TZ,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(vol),
                                   atol=1e-5)

    def test_matches_xla_grid_sample(self, rng):
        vol = jnp.asarray(rng.rand(1, D, H, W, 1).astype(np.float32))
        disp = jnp.asarray(make_field(rng, amplitude_vox=2.5))
        grid = disp + identity_grid_batch((1, D, H, W, 3))
        ref = grid_sample(vol, grid, mode="trilinear")
        out = pallas_grid_sample(vol, grid, max_disp=R, z_tile=TZ,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_out_of_volume_zero_padding(self, rng):
        vol = jnp.asarray(rng.rand(1, D, H, W, 1).astype(np.float32))
        grid = identity_grid_batch((1, D, H, W, 3)) + 0.08  # push past +1
        ref = grid_sample(vol, grid, mode="trilinear")
        out = pallas_grid_sample(vol, grid, max_disp=R, z_tile=TZ,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_multichannel_batch(self, rng):
        vol = jnp.asarray(rng.rand(2, D, H, W, 2).astype(np.float32))
        disp = jnp.asarray(np.concatenate(
            [make_field(rng, 1.5), make_field(rng, 1.5)], axis=0))
        grid = disp + identity_grid_batch((2, D, H, W, 3))
        ref = grid_sample(vol, grid, mode="trilinear")
        out = pallas_grid_sample(vol, grid, max_disp=R, z_tile=TZ,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

    def test_wide_volume_lane_chunking(self, rng):
        """W > 128 exercises the multi-chunk lane gather."""
        w = 150
        vol = jnp.asarray(rng.rand(1, D, H, w, 1).astype(np.float32))
        disp = rng.rand(1, D, H, w, 3).astype(np.float32) * 0.02 - 0.01
        grid = jnp.asarray(disp) + identity_grid_batch((1, D, H, w, 3))
        ref = grid_sample(vol, grid, mode="trilinear")
        out = pallas_grid_sample(vol, grid, max_disp=R, z_tile=TZ,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


class TestPallasBackward:
    @pytest.mark.slow
    def test_grad_wrt_grid_matches_xla(self, rng):
        vol = jnp.asarray(rng.rand(1, D, H, W, 1).astype(np.float32))
        disp = jnp.asarray(make_field(rng, 2.0))
        grid0 = disp + identity_grid_batch((1, D, H, W, 3))
        tangent = jnp.asarray(rng.rand(1, D, H, W, 1).astype(np.float32))

        def loss_ref(g):
            return jnp.sum(grid_sample(vol, g, mode="trilinear") * tangent)

        def loss_pallas(g):
            return jnp.sum(pallas_grid_sample(vol, g, max_disp=R, z_tile=TZ,
                                              interpret=True) * tangent)

        g_ref = jax.grad(loss_ref)(grid0)
        g_pal = jax.grad(loss_pallas)(grid0)
        # gradients agree except on the measure-zero set where a sample
        # coordinate is exactly integral (tent kink); random fields avoid it
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   atol=1e-3, rtol=1e-3)

    @pytest.mark.slow
    def test_saturated_field_fwd_and_grads_match_xla(self, rng):
        """Clamp-saturated field (plateaus at exactly +-max_disp voxels, a
        smooth transition band sweeping every offset in between) — the
        regime the per-source-plane JOINT offset lists (_joint_sdy_meta /
        _plane_meta jdx) were built for.  Forward, volume-grad and
        grid-grad must all match XLA on the clamped field."""
        from deepatlas_tpu.ops import clamp_displacement
        vol0 = jnp.asarray(rng.rand(1, D, H, W, 2).astype(np.float32))
        disp = jnp.asarray(make_field(rng, 4.0 * R))  # 4x the bound
        grid0 = disp + identity_grid_batch((1, D, H, W, 3))
        grid_c = clamp_displacement(grid0, R)
        # the clamp really saturates a large fraction per-axis
        vox = np.abs(np.asarray(disp)) * (np.array([W, H, D]) - 1) / 2.0
        assert (vox > R).mean() > 0.4
        tangent = jnp.asarray(rng.rand(1, D, H, W, 2).astype(np.float32))

        out_p = pallas_grid_sample(vol0, grid0, max_disp=R, z_tile=TZ,
                                   interpret=True)
        out_x = grid_sample(vol0, grid_c, mode="trilinear")
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   atol=1e-4, rtol=1e-4)

        gv_p = jax.grad(lambda v: jnp.sum(pallas_grid_sample(
            v, grid0, max_disp=R, z_tile=TZ, interpret=True)
            * tangent))(vol0)
        gv_x = jax.grad(lambda v: jnp.sum(
            grid_sample(v, grid_c, mode="trilinear") * tangent))(vol0)
        np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_x),
                                   atol=1e-4, rtol=1e-4)

        # grid-grad: compare on the CLAMPED field (both sides see the same
        # coordinates; the clamp's own zero-gradient region is chained
        # outside the kernel by clamp_displacement's vjp).  Perturb off the
        # exactly-integral plateaus (tent kink) first — with a magnitude
        # floor: at the kink the subgradient choices differ (the tent
        # kernel returns 0, XLA's floor rule returns v[z1]-v[z0]) and a
        # plain white-noise perturbation underflows float32 addition at a
        # few dozen voxels, leaving them exactly on the kink.
        pf = np.asarray(make_field(rng, 0.4))
        pert = np.sign(pf + 1e-12) * (1e-4 + np.abs(pf))
        grid_in = grid_c + jnp.asarray(pert.astype(np.float32))
        gg_p = jax.grad(lambda g: jnp.sum(pallas_grid_sample(
            vol0, g, max_disp=R, z_tile=TZ, bound_mode="none",
            interpret=True) * tangent))(grid_in)
        gg_x = jax.grad(lambda g: jnp.sum(
            grid_sample(vol0, g, mode="trilinear") * tangent))(grid_in)
        np.testing.assert_allclose(np.asarray(gg_p), np.asarray(gg_x),
                                   atol=1e-3, rtol=1e-3)

    def test_grad_wrt_vol_matches_xla(self, rng):
        vol0 = jnp.asarray(rng.rand(1, D, H, W, 1).astype(np.float32))
        disp = jnp.asarray(make_field(rng, 2.0))
        grid = disp + identity_grid_batch((1, D, H, W, 3))
        tangent = jnp.asarray(rng.rand(1, D, H, W, 1).astype(np.float32))

        g_ref = jax.grad(lambda v: jnp.sum(
            grid_sample(v, grid, mode="trilinear") * tangent))(vol0)
        g_pal = jax.grad(lambda v: jnp.sum(
            pallas_grid_sample(v, grid, max_disp=R, z_tile=TZ,
                               interpret=True) * tangent))(vol0)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-4)


def test_pallas_warp_displacement_api(rng):
    vol = jnp.asarray(rng.rand(1, D, H, W, 1).astype(np.float32))
    disp = jnp.asarray(make_field(rng, 1.0))
    from deepatlas_tpu.ops import warp as xla_warp
    ref = xla_warp(vol, disp)
    out = pallas_warp(vol, disp, max_disp=R, z_tile=TZ, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


def test_multichannel_gradients(rng):
    """C>1: dgrid accumulates across the channel grid axis."""
    c = 3
    vol = jnp.asarray(rng.rand(1, D, H, W, c).astype(np.float32))
    disp = jnp.asarray(make_field(rng, 2.0))
    grid0 = disp + identity_grid_batch((1, D, H, W, 3))
    t = jnp.asarray(rng.rand(1, D, H, W, c).astype(np.float32))

    g_ref = jax.grad(lambda g: jnp.sum(
        grid_sample(vol, g, mode="trilinear") * t))(grid0)
    g_pal = jax.grad(lambda g: jnp.sum(
        pallas_grid_sample(vol, g, max_disp=R, z_tile=TZ,
                           interpret=True) * t))(grid0)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=1e-3, rtol=1e-3)


def test_fused_warp_lncc_matches_composition(rng):
    from deepatlas_tpu.pallas import warp_lncc_loss
    from deepatlas_tpu.losses import get_loss_function
    vol = jnp.asarray(rng.rand(1, D, H, W, 1).astype(np.float32))
    fixed = jnp.asarray(rng.rand(1, D, H, W, 1).astype(np.float32))
    disp = jnp.asarray(make_field(rng, 1.5))
    grid0 = disp + identity_grid_batch((1, D, H, W, 3))
    fused = float(warp_lncc_loss(vol, fixed, grid0, filter_size=5,
                                 max_disp=R, z_tile=TZ, interpret=True))
    ln = get_loss_function("lncc")(filter_size=5)
    ref = float(ln(grid_sample(vol, grid0, mode="trilinear"), fixed))
    np.testing.assert_allclose(fused, ref, atol=1e-5)


class TestDisplacementGuard:
    """max_disp guard: oversized fields saturate (clamp) instead of the raw
    kernel's silent zero contribution (VERDICT round-1 weak #6)."""

    def test_overflow_clamps_to_bound(self, rng):
        from deepatlas_tpu.ops import clamp_displacement
        vol = jnp.asarray(rng.rand(1, D, H, W, 1).astype(np.float32))
        # 9-voxel displacement along z: way past the R=3 bound
        disp = jnp.zeros((1, D, H, W, 3), jnp.float32)
        disp = disp.at[..., 2].set(9.0 * 2.0 / (D - 1))
        grid = disp + identity_grid_batch((1, D, H, W, 3))
        out = pallas_grid_sample(vol, grid, max_disp=R, z_tile=TZ,
                                 interpret=True)  # bound_mode="clamp" default
        ref = grid_sample(vol, clamp_displacement(grid, R), mode="trilinear")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
        # interior voxels must NOT be zero (the raw kernel would zero them)
        interior = np.asarray(out)[0, R + 2:D - R - 2]
        assert np.abs(interior).max() > 0.1

    def test_bound_mode_none_keeps_raw_kernel(self, rng):
        vol = jnp.asarray(rng.rand(1, D, H, W, 1).astype(np.float32))
        disp = jnp.zeros((1, D, H, W, 3), jnp.float32)
        disp = disp.at[..., 2].set(9.0 * 2.0 / (D - 1))
        grid = disp + identity_grid_batch((1, D, H, W, 3))
        out = pallas_grid_sample(vol, grid, max_disp=R, z_tile=TZ,
                                 bound_mode="none", interpret=True)
        # raw kernel semantics: samples whose source plane falls outside a
        # tile's slab window vanish silently.  Tile 1 (z = 4..7) has slab
        # planes 0..11 but sources at z+9 = 13..16 — all zero.
        assert np.abs(np.asarray(out)[0, TZ:2 * TZ]).max() < 1e-6
        # while the clamped default keeps those voxels alive
        clamped = pallas_grid_sample(vol, grid, max_disp=R, z_tile=TZ,
                                     interpret=True)
        assert np.abs(np.asarray(clamped)[0, TZ:2 * TZ]).max() > 0.1

    def test_overflow_fraction_metric(self):
        from deepatlas_tpu.ops import displacement_overflow
        grid = identity_grid_batch((1, D, H, W, 3))
        assert float(displacement_overflow(grid, R)) == 0.0
        disp = jnp.zeros((1, D, H, W, 3), jnp.float32)
        disp = disp.at[:, : D // 2, ..., 2].set((R + 2.0) * 2.0 / (D - 1))
        frac = float(displacement_overflow(
            grid + disp, R))
        np.testing.assert_allclose(frac, 0.5, atol=1e-6)

    def test_clamp_identity_inside_bound(self, rng):
        from deepatlas_tpu.ops import clamp_displacement
        disp = jnp.asarray(make_field(rng, amplitude_vox=R - 0.5))
        grid = disp + identity_grid_batch((1, D, H, W, 3))
        np.testing.assert_allclose(np.asarray(clamp_displacement(grid, R)),
                                   np.asarray(grid), atol=1e-6)


class TestValuesAdjoint:
    """ops/warp.py::warp_values_adjoint — the exact transpose identity
    ``<warp(v), ct> == <v, adjoint(ct)>`` that the label-structured joint
    seg phase (train/reg_steps.py f-hard branch) relies on."""

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_inner_product_identity(self, rng, use_pallas):
        from functools import partial

        from deepatlas_tpu.ops.warp import warp_values_adjoint

        if use_pallas:
            warp_fn = partial(pallas_grid_sample, max_disp=R, z_tile=TZ,
                              grad="values", interpret=True)
        else:
            from deepatlas_tpu.ops.warp import clamp_displacement

            def warp_fn(v, g):
                return grid_sample(v, clamp_displacement(g, R))

        c = 3
        vol = jnp.asarray(rng.rand(1, D, H, W, c).astype(np.float32))
        ct = jnp.asarray(rng.rand(1, D, H, W, c).astype(np.float32))
        grid = jnp.asarray(make_field(rng, amplitude_vox=R + 2.0)) \
            + identity_grid_batch((1, D, H, W, 3))

        lhs = jnp.sum(warp_fn(vol, grid) * ct, axis=(1, 2, 3))
        rhs = jnp.sum(vol * warp_values_adjoint(warp_fn, ct, grid),
                      axis=(1, 2, 3))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   rtol=2e-4)

    @pytest.mark.slow
    def test_channel_sum_is_ones_splat(self, rng):
        """splat(one_hot) summed over channels equals splat(ones) — the
        free warped-mass denominator of the f-hard branch."""
        from functools import partial

        from deepatlas_tpu.ops import one_hot
        from deepatlas_tpu.ops.warp import warp_values_adjoint

        warp_fn = partial(pallas_grid_sample, max_disp=R, z_tile=TZ,
                          grad="values", interpret=True)
        labs = jnp.asarray(rng.randint(0, 4, (1, D, H, W)))
        onehot = one_hot(labs.astype(jnp.int32), 4, dtype=jnp.float32)
        grid = jnp.asarray(make_field(rng, amplitude_vox=R - 0.5)) \
            + identity_grid_batch((1, D, H, W, 3))
        s = warp_values_adjoint(warp_fn, onehot, grid)
        ones = warp_values_adjoint(warp_fn, jnp.ones((1, D, H, W, 1)), grid)
        np.testing.assert_allclose(np.asarray(jnp.sum(s, axis=-1)),
                                   np.asarray(ones[..., 0]), atol=1e-4)

    @pytest.mark.parametrize("amp_factor", [0.5, 4.0])
    @pytest.mark.slow
    def test_ct_sparse_flag_is_bit_identical(self, rng, amp_factor):
        """ct_sparse=False (drop the per-dy cotangent-mass skip) is a pure
        scheduling hint: the splat results are BIT-identical for smooth
        (list-branch) and clamp-saturated (static full-sweep branch)
        fields alike (pallas/splat.py)."""
        from functools import partial

        from deepatlas_tpu.ops import clamp_displacement
        from deepatlas_tpu.ops.warp import warp_values_adjoint

        ct = jnp.asarray(rng.rand(1, D, H, W, 2).astype(np.float32))
        disp = jnp.asarray(make_field(rng, amplitude_vox=amp_factor * R))
        grid = clamp_displacement(
            disp + identity_grid_batch((1, D, H, W, 3)), R)
        outs = []
        for sparse in (True, False):
            warp_fn = partial(pallas_grid_sample, max_disp=R, z_tile=TZ,
                              grad="values", ct_sparse=sparse,
                              interpret=True)
            outs.append(np.asarray(warp_values_adjoint(warp_fn, ct, grid)))
        np.testing.assert_array_equal(outs[0], outs[1])


class TestPresenceSkip:
    """The empty-slab skip guard (warp `_channel_presence` + SMEM table) is
    exact: zero channel-slabs contribute nothing to the linear warp/splat,
    so skipping their VPU work changes no output.  One-hot volumes — the
    m-hard/f-hard branches of the label-structured joint seg phase — are the
    sparse case the guard accelerates."""

    def test_onehot_warp_and_splat_match_xla(self, rng):
        from functools import partial

        from deepatlas_tpu.ops import one_hot
        from deepatlas_tpu.ops.warp import (clamp_displacement,
                                            warp_values_adjoint)

        c = 6
        # classes localized in z so most (tile, channel) slabs are empty
        labs = rng.randint(0, c, (1, D, H, W))
        labs[:, : D // 2] = 0
        oh = one_hot(jnp.asarray(labs).astype(jnp.int32), c,
                     dtype=jnp.float32)
        grid = jnp.asarray(make_field(rng, amplitude_vox=R + 1.0)) \
            + identity_grid_batch((1, D, H, W, 3))
        wf = partial(pallas_grid_sample, max_disp=R, z_tile=TZ,
                     grad="values", interpret=True)

        out_k = wf(oh, grid)
        out_x = grid_sample(oh, clamp_displacement(grid, R))
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                                   atol=1e-5)

        s_k = warp_values_adjoint(wf, oh, grid)
        s_x = warp_values_adjoint(
            lambda v, g: grid_sample(v, clamp_displacement(g, R)), oh, grid)
        np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_x),
                                   atol=1e-5)

    def test_presence_table(self):
        from deepatlas_tpu.pallas.warp import _channel_presence
        vol = jnp.zeros((3, 24, 4, 4))
        vol = vol.at[1, 23].set(1.0)          # class 1 only in the last plane
        pres = np.asarray(_channel_presence(vol, tz=4, r=3, n_tiles=6, d=24))
        assert pres[0].sum() == 0 and pres[2].sum() == 0
        # slab windows reaching plane 23: tiles whose [s0, s0+12) cover it
        assert pres[1, -1] == 1 and pres[1, 0] == 0

    def test_offset_presence_strict_band(self):
        """Exactly-integral offsets (clamp-saturated plateaus) must mark ONE
        bit, not a zero-mass neighbour too — the neighbour bit multiplied
        the saturated product-set combos 4-8x (measured regression)."""
        from deepatlas_tpu.pallas.warp import _floor_presence
        t = jnp.full((2, 3, 4), 3.0)
        p = np.asarray(_floor_presence(t, 0, 8, axes=(0, 1, 2)))
        assert p[3] and p.sum() == 1
        t2 = jnp.full((2, 3, 4), 3.5)
        p2 = np.asarray(_floor_presence(t2, 0, 8, axes=(0, 1, 2)))
        assert p2[3] and p2[4] and p2.sum() == 2
