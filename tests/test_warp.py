"""Golden tests: warp / identity grid / resize vs PyTorch reference kernels.

BASELINE.json demands warp-MSE parity with the PyTorch reference, so these
tests bit-compare against torch.nn.functional.grid_sample / F.interpolate on
random volumes and random deformations (float32, tolerance ~1e-5).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from deepatlas_tpu.ops import (grid_sample, identity_grid, identity_grid_batch,
                               nearest_resize, trilinear_resize, warp,
                               warp_labels)


def torch_identity_grid(shape):
    """Reference identity grid semantics (lib/utils.py:89-102), permuted to
    the (D, H, W, 3) grid_sample layout (voxel_morph.py:90)."""
    coords = [torch.arange(0, shape[k]).float() / (shape[k] - 1) * 2.0 - 1.0
              for k in range(3)]
    xx, yy, zz = torch.meshgrid(coords, indexing="ij")
    ident = torch.stack([zz, yy, xx])  # (3, D, H, W), channels (x, y, z)
    return ident.permute(1, 2, 3, 0)


class TestIdentityGrid:
    def test_matches_reference_convention(self):
        shape = (5, 7, 6)
        ours = np.asarray(identity_grid(shape))
        ref = torch_identity_grid(shape).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_batch_broadcast(self):
        g = identity_grid_batch((2, 4, 5, 6, 1))
        assert g.shape == (2, 4, 5, 6, 3)
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g[1]))

    def test_unnormalized(self):
        g = np.asarray(identity_grid((3, 4, 5), normalize=False))
        assert g[..., 0].max() == 4  # x spans W
        assert g[..., 1].max() == 3  # y spans H
        assert g[..., 2].max() == 2  # z spans D


def _torch_grid_sample(vol_np, grid_np, mode):
    """vol_np (B,D,H,W,C) channel-last, grid_np (B,Do,Ho,Wo,3)."""
    vol_t = torch.from_numpy(np.moveaxis(vol_np, -1, 1).copy())
    grid_t = torch.from_numpy(grid_np)
    out = F.grid_sample(vol_t, grid_t, mode=mode, padding_mode="zeros",
                        align_corners=True)
    return np.moveaxis(out.numpy(), 1, -1)


class TestGridSample:
    @pytest.mark.parametrize("mode,tmode", [("trilinear", "bilinear"),
                                            ("nearest", "nearest")])
    def test_random_grid_matches_torch(self, rng, mode, tmode):
        vol = rng.rand(2, 9, 10, 11, 3).astype(np.float32)
        # grid inside and slightly outside the volume to exercise zero padding
        grid = (rng.rand(2, 7, 8, 6, 3).astype(np.float32) * 2.4 - 1.2)
        ours = np.asarray(grid_sample(jnp.asarray(vol), jnp.asarray(grid),
                                      mode=mode))
        ref = _torch_grid_sample(vol, grid, tmode)
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_identity_grid_is_identity(self, rng):
        vol = rng.rand(1, 6, 7, 8, 2).astype(np.float32)
        grid = identity_grid_batch(vol.shape)
        out = np.asarray(grid_sample(jnp.asarray(vol), grid))
        np.testing.assert_allclose(out, vol, atol=1e-5)

    def test_warp_matches_torch_displacement(self, rng):
        """Full spatial-transformer composition: disp + identity, then sample
        (voxel_morph.py:85-91)."""
        vol = rng.rand(1, 8, 9, 10, 1).astype(np.float32)
        disp = (rng.rand(1, 8, 9, 10, 3).astype(np.float32) - 0.5) * 0.2
        ours = np.asarray(warp(jnp.asarray(vol), jnp.asarray(disp)))

        ref_grid = (torch_identity_grid((8, 9, 10)).numpy()[None] + disp)
        ref = _torch_grid_sample(vol, ref_grid, "bilinear")
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_warp_labels_nearest(self, rng):
        labels = rng.randint(0, 5, size=(1, 6, 7, 8)).astype(np.int32)
        disp = (rng.rand(1, 6, 7, 8, 3).astype(np.float32) - 0.5) * 0.1
        deform = np.asarray(identity_grid_batch((1, 6, 7, 8))) + disp
        ours = np.asarray(warp_labels(jnp.asarray(labels), jnp.asarray(deform)))
        ref = _torch_grid_sample(labels[..., None].astype(np.float32),
                                 deform, "nearest")[..., 0]
        np.testing.assert_allclose(ours, ref.astype(np.int32))

    def test_gradients_flow(self, rng):
        import jax
        vol = jnp.asarray(rng.rand(1, 5, 5, 5, 1).astype(np.float32))
        disp = jnp.asarray((rng.rand(1, 5, 5, 5, 3) - 0.5).astype(np.float32) * 0.1)

        def loss(d):
            return jnp.mean(warp(vol, d) ** 2)

        g = jax.grad(loss)(disp)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestResize:
    @pytest.mark.parametrize("out_shape", [(4, 7, 9), (12, 5, 16), (8, 9, 10)])
    def test_nearest_matches_torch(self, rng, out_shape):
        vol = rng.rand(2, 8, 9, 10, 3).astype(np.float32)
        ours = np.asarray(nearest_resize(jnp.asarray(vol), out_shape))
        vol_t = torch.from_numpy(np.moveaxis(vol, -1, 1).copy())
        ref = F.interpolate(vol_t, size=out_shape)  # default mode: nearest
        np.testing.assert_allclose(ours, np.moveaxis(ref.numpy(), 1, -1))

    @pytest.mark.parametrize("align", [False, True])
    def test_trilinear_matches_torch(self, rng, align):
        vol = rng.rand(1, 6, 7, 8, 2).astype(np.float32)
        out_shape = (12, 14, 16)
        ours = np.asarray(trilinear_resize(jnp.asarray(vol), out_shape,
                                           align_corners=align))
        vol_t = torch.from_numpy(np.moveaxis(vol, -1, 1).copy())
        ref = F.interpolate(vol_t, size=out_shape, mode="trilinear",
                            align_corners=align)
        np.testing.assert_allclose(ours, np.moveaxis(ref.numpy(), 1, -1),
                                   atol=2e-6)
