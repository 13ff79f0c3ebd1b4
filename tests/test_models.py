"""Model architecture tests.

Strategy (SURVEY.md §4b): shape/dtype tests for the exact UNet_light /
fixed-UNet / VoxelMorph channel plans, plus *weight-transfer forward parity*
against independently-written PyTorch models that follow the reference
architecture (unets.py, voxel_morph.py) — transferring every kernel from the
Flax net into the torch net and comparing outputs end to end.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from deepatlas_tpu.models import (UNet, UNetLight, VoxelMorphCVPR2018,
                                  get_available_networks, get_network)


def t2f_conv(w):
    """torch Conv3d weight (O,I,k,k,k) -> flax kernel (k,k,k,I,O)."""
    return np.transpose(w.detach().numpy(), (2, 3, 4, 1, 0))


def t2f_deconv(w):
    """torch ConvTranspose3d weight (I,O,k,k,k) -> flax ConvTranspose kernel
    with transpose_kernel=True, shape (k,k,k,O,I)."""
    return np.transpose(w.detach().numpy(), (2, 3, 4, 1, 0))


def t2f_deconv_as_conv(w):
    """torch ConvTranspose3d (stride 1, pad 1, k3) weight (I,O,k,k,k) ->
    equivalent flax Conv kernel (k,k,k,I,O): swap io + flip spatial."""
    v = w.detach().numpy()[:, :, ::-1, ::-1, ::-1]  # (I,O,k,k,k) flipped
    return np.transpose(v, (2, 3, 4, 0, 1))


class TorchConvBlock(nn.Module):
    def __init__(self, cin, cout, k=3, s=1, p=1, bias=True, bn=False,
                 act="ReLU"):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, k, stride=s, padding=p, bias=bias)
        self.bn = nn.BatchNorm3d(cout) if bn else None
        self.act = nn.ReLU() if act == "ReLU" else nn.LeakyReLU(0.01)

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        return self.act(x)


class TorchDeconvBlock(nn.Module):
    def __init__(self, cin, cout, k=2, s=2, bias=True, bn=False, act="ReLU"):
        super().__init__()
        self.deconv = nn.ConvTranspose3d(cin, cout, k, stride=s, bias=bias)
        self.bn = nn.BatchNorm3d(cout) if bn else None
        self.act = nn.ReLU() if act == "ReLU" else nn.LeakyReLU(0.01)

    def forward(self, x):
        x = self.deconv(x)
        if self.bn is not None:
            x = self.bn(x)
        return self.act(x)


# ------------------------------------------------------------ UNet_light

ENCODERS = [(8, 16), (16, 16, 32), (32, 32, 64), (64, 64, 64)]
DECODERS = [(64, 64, 64), (64, 32, 32), (32, 16, 16)]


class TorchUNetLight(nn.Module):
    """The UNet_light plan (network_factory/__init__.py:12-15) rebuilt in
    torch for golden comparison."""

    def __init__(self, in_channel, n_classes, bias=True, bn=True):
        super().__init__()
        self.enc_levels = nn.ModuleList()
        for i, plan in enumerate(ENCODERS):
            chain = (in_channel,) + plan if i == 0 else plan
            self.enc_levels.append(nn.Sequential(*[
                TorchConvBlock(chain[k], chain[k + 1], bias=bias, bn=bn,
                               act="LeakyReLU")
                for k in range(len(chain) - 1)]))
        self.ups = nn.ModuleList()
        self.dec_levels = nn.ModuleList()
        for j, plan in enumerate(DECODERS):
            cin = ENCODERS[-1][-1] if j == 0 else DECODERS[j - 1][-1]
            self.ups.append(TorchDeconvBlock(cin, plan[0], bias=bias, bn=bn,
                                             act="LeakyReLU"))
            chain = (ENCODERS[-(j + 2)][-1] + plan[0],) + plan[1:]
            self.dec_levels.append(nn.Sequential(*[
                TorchConvBlock(chain[k], chain[k + 1], bias=bias, bn=bn,
                               act="LeakyReLU")
                for k in range(len(chain) - 1)]))
        self.final = nn.Conv3d(DECODERS[-1][-1], n_classes, 1, bias=bias)

    def forward(self, x):
        skips = []
        for i, level in enumerate(self.enc_levels):
            x = level(x)
            if i < len(self.enc_levels) - 1:
                skips.append(x)
                x = F.max_pool3d(x, 2)
        for up, dec in zip(self.ups, self.dec_levels):
            x = up(x)
            x = dec(torch.cat([x, skips.pop()], dim=1))
        return self.final(x)


def _torch_convblocks_in_order(tm):
    """All TorchConvBlocks in flax creation order (encoders then decoders)."""
    blocks = [b for lvl in tm.enc_levels for b in lvl]
    blocks += [b for lvl in tm.dec_levels for b in lvl]
    return blocks


def _transfer_unet_light(params, batch_stats, tm):
    """Copy flax UNetLight weights into the torch model."""
    p = jax.tree_util.tree_map(np.asarray, params)
    bs = jax.tree_util.tree_map(np.asarray, batch_stats)
    conv_blocks = _torch_convblocks_in_order(tm)
    with torch.no_grad():
        for idx, blk in enumerate(conv_blocks):
            fp = p[f"ConvBlock_{idx}"]
            blk.conv.weight.copy_(torch.from_numpy(
                np.transpose(fp["Conv_0"]["kernel"], (4, 3, 0, 1, 2)).copy()))
            blk.conv.bias.copy_(torch.from_numpy(fp["Conv_0"]["bias"]))
            fb = fp["BatchNorm_0"]
            fbs = bs[f"ConvBlock_{idx}"]["BatchNorm_0"]
            blk.bn.weight.copy_(torch.from_numpy(fb["scale"]))
            blk.bn.bias.copy_(torch.from_numpy(fb["bias"]))
            blk.bn.running_mean.copy_(torch.from_numpy(fbs["mean"]))
            blk.bn.running_var.copy_(torch.from_numpy(fbs["var"]))
        for j, up in enumerate(tm.ups):
            fp = p[f"DeconvBlock_{j}"]
            # flax transpose_kernel kernel (k,k,k,O,I) -> torch (I,O,k,k,k)
            up.deconv.weight.copy_(torch.from_numpy(
                np.transpose(fp["ConvTranspose_0"]["kernel"],
                             (4, 3, 0, 1, 2)).copy()))
            up.deconv.bias.copy_(torch.from_numpy(fp["ConvTranspose_0"]["bias"]))
            fb = fp["BatchNorm_0"]
            fbs = bs[f"DeconvBlock_{j}"]["BatchNorm_0"]
            up.bn.weight.copy_(torch.from_numpy(fb["scale"]))
            up.bn.bias.copy_(torch.from_numpy(fb["bias"]))
            up.bn.running_mean.copy_(torch.from_numpy(fbs["mean"]))
            up.bn.running_var.copy_(torch.from_numpy(fbs["var"]))
        tm.final.weight.copy_(torch.from_numpy(
            np.transpose(p["Conv_0"]["kernel"], (4, 3, 0, 1, 2)).copy()))
        tm.final.bias.copy_(torch.from_numpy(p["Conv_0"]["bias"]))


class TestUNetLight:
    def test_forward_shape(self, rng):
        model = UNetLight(in_channel=1, n_classes=32, bias=True, BN=True)
        x = jnp.asarray(rng.rand(1, 16, 16, 16, 1).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 16, 16, 16, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_param_count_matches_torch(self):
        model = UNetLight(in_channel=1, n_classes=32, bias=True, BN=True)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 8, 8, 8, 1)), train=False)
        n_flax = sum(x.size for x in jax.tree_util.tree_leaves(
            variables["params"]))
        tm = TorchUNetLight(1, 32)
        n_torch = sum(q.numel() for q in tm.parameters())
        assert n_flax == n_torch

    def test_forward_parity_with_torch(self, rng):
        model = UNetLight(in_channel=1, n_classes=5, bias=True, BN=True)
        x = rng.rand(2, 16, 16, 16, 1).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                               train=False)
        # randomize batch stats so eval-mode BN parity is nontrivial
        bs = jax.tree_util.tree_map(
            lambda a: jnp.asarray(
                rng.rand(*a.shape).astype(np.float32) * 0.5 + 0.5),
            variables["batch_stats"])
        variables = {"params": variables["params"], "batch_stats": bs}

        ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

        tm = TorchUNetLight(1, 5)
        _transfer_unet_light(variables["params"], bs, tm)
        tm.eval()
        with torch.no_grad():
            ref = tm(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
        ref = np.moveaxis(ref.numpy(), 1, -1)
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


# ------------------------------------------------------------ VoxelMorph

class TorchVoxelMorph(nn.Module):
    """VoxelMorphCVPR2018 (voxel_morph.py:18-92) rebuilt in torch."""

    def __init__(self, enc=(16, 32, 32, 32, 32), dec=(32, 32, 32, 8, 8)):
        super().__init__()
        self.encs = nn.ModuleList()
        for i, f in enumerate(enc):
            cin = 2 if i == 0 else enc[i - 1]
            self.encs.append(TorchConvBlock(cin, f, s=1 if i == 0 else 2,
                                            bias=True))
        self.decs = nn.ModuleList([
            TorchConvBlock(enc[-1], dec[0], bias=True),
            TorchConvBlock(dec[0] + enc[3], dec[1], bias=True),
            TorchConvBlock(dec[1] + enc[2], dec[2], bias=True),
            TorchConvBlock(dec[2] + enc[1], dec[3], bias=True),
            TorchConvBlock(dec[3], dec[4], bias=True),
        ])
        self.flow = nn.Conv3d(dec[4] + enc[0], 3, 3, padding=1, bias=True)

    def forward(self, source, target):
        e = []
        x = torch.cat([source, target], dim=1)
        for enc in self.encs:
            x = enc(x)
            e.append(x)
        d1 = self.decs[0](F.interpolate(e[4], size=e[3].shape[2:]))
        d2 = self.decs[1](F.interpolate(torch.cat([d1, e[3]], 1),
                                        size=e[2].shape[2:]))
        d3 = self.decs[2](F.interpolate(torch.cat([d2, e[2]], 1),
                                        size=e[1].shape[2:]))
        d4 = self.decs[3](torch.cat([d3, e[1]], 1))
        d5 = self.decs[4](F.interpolate(d4, size=e[0].shape[2:]))
        disp = self.flow(torch.cat([d5, e[0]], 1))

        coords = [torch.arange(0, s).float() / (s - 1) * 2 - 1
                  for s in source.shape[2:]]
        xx, yy, zz = torch.meshgrid(coords, indexing="ij")
        ident = torch.stack([zz, yy, xx])[None]
        deform = disp + ident
        warped = F.grid_sample(source, deform.permute(0, 2, 3, 4, 1),
                               mode="bilinear", padding_mode="zeros",
                               align_corners=True)
        return disp, warped, deform


def _transfer_voxelmorph(params, tm):
    p = jax.tree_util.tree_map(np.asarray, params)
    blocks = list(tm.encs) + list(tm.decs)
    with torch.no_grad():
        for idx, blk in enumerate(blocks):
            fp = p[f"ConvBlock_{idx}"]["Conv_0"]
            blk.conv.weight.copy_(torch.from_numpy(
                np.transpose(fp["kernel"], (4, 3, 0, 1, 2)).copy()))
            blk.conv.bias.copy_(torch.from_numpy(fp["bias"]))
        tm.flow.weight.copy_(torch.from_numpy(
            np.transpose(p["Conv_0"]["kernel"], (4, 3, 0, 1, 2)).copy()))
        tm.flow.bias.copy_(torch.from_numpy(p["Conv_0"]["bias"]))


class TestVoxelMorph:
    @pytest.mark.slow
    def test_forward_shapes_odd_sizes(self, rng):
        model = VoxelMorphCVPR2018()
        src = jnp.asarray(rng.rand(1, 11, 14, 13, 1).astype(np.float32))
        tgt = jnp.asarray(rng.rand(1, 11, 14, 13, 1).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), src, tgt)
        disp, warped, deform = model.apply(variables, src, tgt)
        assert disp.shape == (1, 11, 14, 13, 3)
        assert warped.shape == src.shape
        assert deform.shape == disp.shape

    def test_param_count_matches_torch(self):
        model = VoxelMorphCVPR2018()
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 16, 16, 16, 1)),
                               jnp.zeros((1, 16, 16, 16, 1)))
        n_flax = sum(x.size for x in jax.tree_util.tree_leaves(
            variables["params"]))
        n_torch = sum(q.numel() for q in TorchVoxelMorph().parameters())
        assert n_flax == n_torch

    def test_forward_parity_with_torch(self, rng):
        # narrow filters keep the HIGHEST-precision CPU compile fast; the
        # full-width channel plan is covered by test_param_count_matches_torch
        enc, dec = (4, 8, 8, 8, 8), (8, 8, 8, 4, 4)
        model = VoxelMorphCVPR2018(enc_filters=enc, dec_filters=dec)
        src = rng.rand(1, 12, 14, 16, 1).astype(np.float32)
        tgt = rng.rand(1, 12, 14, 16, 1).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(src),
                               jnp.asarray(tgt))
        disp, warped, deform = model.apply(variables, jnp.asarray(src),
                                           jnp.asarray(tgt))

        tm = TorchVoxelMorph(enc=enc, dec=dec)
        _transfer_voxelmorph(variables["params"], tm)
        tm.eval()
        with torch.no_grad():
            tdisp, twarped, tdeform = tm(
                torch.from_numpy(np.moveaxis(src, -1, 1).copy()),
                torch.from_numpy(np.moveaxis(tgt, -1, 1).copy()))
        np.testing.assert_allclose(
            np.asarray(disp), np.moveaxis(tdisp.numpy(), 1, -1),
            atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(warped)[..., 0], twarped.numpy()[:, 0],
            atol=1e-4, rtol=1e-3)


# ------------------------------------------------------------ fixed UNet

@pytest.mark.slow
class TestFixedUNet:
    def test_forward_shape(self, rng):
        model = UNet(in_channel=1, n_classes=3, bias=True, BN=False)
        x = jnp.asarray(rng.rand(1, 16, 16, 16, 1).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (1, 16, 16, 16, 3)

    def test_param_count(self):
        """Channel plan check: sum conv params of the ec0..dc0 plan
        (unets.py:75-98)."""
        enc_plan = [(1, 32), (32, 64), (64, 64), (64, 128), (128, 128),
                    (128, 256), (256, 256), (256, 512)]
        ups = [(512, 512), (256, 256), (128, 128)]  # k=2
        dec_convs = [(768, 256), (256, 256), (384, 128), (128, 128),
                     (192, 64), (64, 64)]
        expected = sum(i * o * 27 + o for i, o in enc_plan)
        expected += sum(i * o * 8 + o for i, o in ups)
        expected += sum(i * o * 27 + o for i, o in dec_convs)
        expected += 64 * 3 * 1 + 3  # dc0 1x1x1
        model = UNet(in_channel=1, n_classes=3, bias=True, BN=False)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 8, 8, 8, 1)))
        n_flax = sum(x.size for x in jax.tree_util.tree_leaves(
            variables["params"]))
        assert n_flax == expected


# ------------------------------------------------------------ registry

def test_registry_keys():
    assert set(get_available_networks()) == {"voxel_morph_cvpr", "UNet",
                                             "UNet_light"}


def test_registry_reference_settings():
    # train_seg.py:47 model_settings
    net = get_network("UNet_light")(in_channel=1, n_classes=32, bias=True,
                                    BN=True)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1)),
                         train=False)
    assert "params" in variables and "batch_stats" in variables


def test_registry_unknown_raises():
    import pytest as _pytest
    with _pytest.raises(KeyError):
        get_network("nope")
