"""3D U-Nets: the fixed ``UNet`` and the configurable ``UNetTemplate``.

Capability parity with lib/network_factory/unets.py:
  * ``UNet`` — the fixed ec0..ec7 / dc9..dc0 plan with 3 max-pools and a
    512-channel bottleneck (unets.py:70-179).  The reference builds its
    stride-1 k3 p1 "decoder" convs as ConvTranspose3d modules
    (unets.py:124-137); a stride-1 transpose conv is mathematically a plain
    conv with flipped kernels, so we use nn.Conv (the torch-parity test
    transfers weights with the flip).
  * ``UNetTemplate`` — the ``UNet_generator`` template (unets.py:182-280)
    parameterized by encoder/decoder channel plans; ``UNet_light`` is the
    instantiation registered in network_factory/__init__.py:12-15.

Inputs are channel-last ``(B, D, H, W, C)``; outputs are raw logits
``(B, D, H, W, n_classes)`` (softmax lives in the dice loss, loss.py:426-427).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBlock, DeconvBlock, conv_kernel_init, max_pool_3d


def _maybe_remat(cls, enabled: bool):
    """Per-block rematerialization: with ``enabled`` the backward pass
    recomputes each block's BN/activation internals instead of storing them
    (SURVEY.md §7: 3D convs at 200^3 need remat to fit one chip's HBM)."""
    return nn.remat(cls, static_argnums=(2,)) if enabled else cls


class UNet(nn.Module):
    """Fixed 3-pool U-Net (unets.py:70-179)."""
    in_channel: int = 1
    n_classes: int = 2
    bias: bool = False
    BN: bool = False
    dtype: Any = None
    remat: bool = False
    spatial_axis: Any = None            # depth sharding (parallel/spatial.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        CB = _maybe_remat(ConvBlock, self.remat)
        DB = _maybe_remat(DeconvBlock, self.remat)

        def enc(features, h):
            return CB(features, 3, 1, 1, use_bias=self.bias,
                      batchnorm=self.BN, act="ReLU", dtype=self.dtype,
                      spatial_axis=self.spatial_axis)(h, train)

        def dec_conv(features, h):
            return CB(features, 3, 1, 1, use_bias=self.bias,
                      batchnorm=self.BN, act="ReLU", dtype=self.dtype,
                      spatial_axis=self.spatial_axis)(h, train)

        def dec_up(features, h):
            return DB(features, 2, 2, use_bias=self.bias,
                      batchnorm=self.BN, act="ReLU", dtype=self.dtype,
                      spatial_axis=self.spatial_axis)(h, train)

        e0 = enc(32, x)
        syn0 = enc(64, e0)
        e1 = max_pool_3d(syn0)
        e2 = enc(64, e1)
        syn1 = enc(128, e2)
        e3 = max_pool_3d(syn1)
        e4 = enc(128, e3)
        syn2 = enc(256, e4)
        e5 = max_pool_3d(syn2)
        e6 = enc(256, e5)
        e7 = enc(512, e6)

        d9 = jnp.concatenate([dec_up(512, e7), syn2], axis=-1)
        d8 = dec_conv(256, d9)
        d7 = dec_conv(256, d8)
        d6 = jnp.concatenate([dec_up(256, d7), syn1], axis=-1)
        d5 = dec_conv(128, d6)
        d4 = dec_conv(128, d5)
        d3 = jnp.concatenate([dec_up(128, d4), syn0], axis=-1)
        d2 = dec_conv(64, d3)
        d1 = dec_conv(64, d2)
        d0 = nn.Conv(self.n_classes, (1, 1, 1), use_bias=self.bias,
                     dtype=self.dtype, kernel_init=conv_kernel_init)(d1)
        return d0


class UNetTemplate(nn.Module):
    """Configurable U-Net (unets.py:198-278).

    ``encoders``/``decoders`` are per-level channel tuples; the first encoder
    level is implicitly prefixed with ``in_channel`` (unets.py:222-224), each
    decoder level's conv chain is prefixed with the skip concat width
    (unets.py:244), and the final level appends a 1x1x1 conv to ``n_classes``
    (unets.py:249-250).
    """
    encoders: Tuple[Tuple[int, ...], ...]
    decoders: Tuple[Tuple[int, ...], ...]
    in_channel: int = 1
    n_classes: int = 2
    bias: bool = False
    BN: bool = False
    act: str = "ReLU"
    maxpool: bool = True
    upsample: bool = False
    res: bool = False
    dtype: Any = None
    remat: bool = False
    # packed execution: the shallow (high-resolution, small-channel) levels
    # run on the lane-packed Pallas conv kernels (pallas/conv3d.py) instead
    # of XLA convolutions — same math, no channel-minor layout padding.
    # ``packed_levels`` counts resolution levels from the top; deeper levels
    # (small tensors, wide channels) stay on XLA.  Default 3 packs through
    # the quarter-resolution C=64 level — measured 190 ms vs 204 ms for the
    # full-size supervised seg step at packed_levels=2 (tools/
    # bench_seg_step.py, round 3).  Checkpoint trees differ per variant;
    # models/packed.py::transfer_unet_params maps between them.
    packed: bool = False
    packed_levels: int = 3
    interpret: Any = None               # Pallas interpret override (tests)
    # depth sharding: mesh-axis name when the input volume's D axis is
    # sharded over devices (parallel/spatial.py).  Convs halo-exchange
    # their boundary planes, BatchNorm moments psum over the axis, pool /
    # k2s2 deconv / 1x1x1 head are shard-local — the sharded forward is
    # numerically the unsharded one.
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.spatial_axis is not None and self.upsample:
            raise ValueError(
                "spatial_axis is not supported with trilinear upsampling "
                "(cross-shard interpolation); use deconv upsamplers")
        if self.packed:
            return self._packed_call(x, train)
        CB = _maybe_remat(ConvBlock, self.remat)
        DB = _maybe_remat(DeconvBlock, self.remat)
        levels = len(self.encoders)
        factor = 2 ** (levels - 1)
        bad = [n for n in x.shape[1:4] if n % factor]
        if bad:
            raise ValueError(
                f"UNet with {levels} levels needs spatial dims divisible by "
                f"{factor}, got {x.shape[1:4]} — crop or pad the input "
                f"(the reference has the same constraint: maxpool floor + "
                f"2x deconv, unets.py:230-241)")
        skips = []

        # encoder path: level 0's chain is (in_channel,) + plan, deeper levels
        # conv between consecutive plan entries (unets.py:222-227)
        for i, enc_plan in enumerate(self.encoders):
            h = x
            chain = enc_plan if i == 0 else enc_plan[1:]
            for features in chain:
                h = CB(features, 3, 1, 1, use_bias=self.bias,
                       batchnorm=self.BN, act=self.act, dtype=self.dtype,
                       spatial_axis=self.spatial_axis)(h, train)
            if self.res:
                h = h + x
            if i < levels - 1:
                skips.append(h)
                if self.maxpool:
                    x = max_pool_3d(h)
                else:
                    x = nn.Conv(self.encoders[i + 1][0], (2, 2, 2),
                                strides=(2, 2, 2), padding="VALID",
                                use_bias=self.bias, dtype=self.dtype,
                                kernel_init=conv_kernel_init)(h)
            else:
                x = h

        # decoder path
        for j, dec_plan in enumerate(self.decoders):
            if self.upsample:
                from ..ops import trilinear_resize
                up_shape = tuple(2 * s for s in x.shape[1:4])
                x = trilinear_resize(x, up_shape, align_corners=False)
            else:
                x = DB(dec_plan[0], 2, 2, use_bias=self.bias,
                       batchnorm=self.BN, act=self.act, dtype=self.dtype,
                       spatial_axis=self.spatial_axis)(x, train)
            skip = skips.pop()
            h = jnp.concatenate([x, skip], axis=-1)
            for features in dec_plan[1:]:
                h = CB(features, 3, 1, 1, use_bias=self.bias,
                       batchnorm=self.BN, act=self.act, dtype=self.dtype,
                       spatial_axis=self.spatial_axis)(h, train)
            if self.res:
                h = h + x
            x = h
            if j == len(self.decoders) - 1:
                x = nn.Conv(self.n_classes, (1, 1, 1), use_bias=self.bias,
                            dtype=self.dtype, kernel_init=conv_kernel_init)(x)
        return x

    def _packed_call(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """Packed-layout execution of the same plan (see class docstring).

        The top ``packed_levels`` resolution levels (encoder and the
        decoder levels at the same resolutions) run on the packed Pallas
        conv/deconv/pool; deeper levels use the standard XLA blocks.  Skip
        connections into packed decoder levels never materialize a concat:
        the first conv of the level splits its kernel over (upsampled,
        skip) and sums (conv of a concat == sum of per-part convs).
        """
        import dataclasses

        from .packed import (PackedConvBlock, PackedDeconvBlock,
                             effective_cout, fit_packed, next_pow2, pack,
                             packed_max_pool, unpack)

        if self.upsample or self.res or not self.maxpool:
            raise NotImplementedError(
                "packed UNet supports the maxpool-down / deconv-up plan "
                "(the UNet_light configuration)")
        levels = len(self.encoders)
        nl = min(self.packed_levels, levels - 1)
        factor = 2 ** (levels - 1)
        bad = [n for n in x.shape[1:4] if n % factor]
        if bad:
            raise ValueError(
                f"UNet with {levels} levels needs spatial dims divisible by "
                f"{factor}, got {x.shape[1:4]}")

        def pcb(features, in_features, spec, h, ks=3, act=None, bn=None):
            return PackedConvBlock(
                features, in_features, spec, kernel_size=ks,
                use_bias=self.bias,
                batchnorm=self.BN if bn is None else bn,
                act=self.act if act is None else act, dtype=self.dtype,
                interpret=self.interpret,
                spatial_axis=self.spatial_axis)(h, train)

        # ---- packed encoder levels
        xp, spec = pack(x.astype(self.dtype or x.dtype))
        cin = self.in_channel
        packed_skips = []                     # (tensor, spec, channels)
        for i in range(nl):
            plan = self.encoders[i]
            chain = plan if i == 0 else plan[1:]
            for f in chain:
                xp = pcb(f, cin, spec, xp)
                spec = dataclasses.replace(spec, c=effective_cout(f, spec))
                cin = f
            packed_skips.append((xp, spec, cin))
            xp, spec = packed_max_pool(xp, spec)

        # ---- XLA deep levels (standard blocks)
        CB = _maybe_remat(ConvBlock, self.remat)
        DB = _maybe_remat(DeconvBlock, self.remat)
        h = unpack(xp, spec)
        xla_skips = []
        for i in range(nl, levels):
            for f in self.encoders[i][1:]:
                h = CB(f, 3, 1, 1, use_bias=self.bias, batchnorm=self.BN,
                       act=self.act, dtype=self.dtype,
                       spatial_axis=self.spatial_axis)(h, train)
                cin = f
            if i < levels - 1:
                xla_skips.append(h)
                h = max_pool_3d(h)

        # ---- decoder
        for j, dec_plan in enumerate(self.decoders):
            out_level = levels - 2 - j        # resolution of this level
            if out_level >= nl:
                # fully XLA level
                h = DB(dec_plan[0], 2, 2, use_bias=self.bias,
                       batchnorm=self.BN, act=self.act, dtype=self.dtype,
                       spatial_axis=self.spatial_axis)(h, train)
                skip = xla_skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                for f in dec_plan[1:]:
                    h = CB(f, 3, 1, 1, use_bias=self.bias,
                           batchnorm=self.BN, act=self.act,
                           dtype=self.dtype,
                           spatial_axis=self.spatial_axis)(h, train)
                cin = dec_plan[-1] if len(dec_plan) > 1 else dec_plan[0]
                continue
            # packed level: upsample into the packed domain
            skip_p, skip_spec, skip_c = packed_skips[out_level]
            if out_level == nl - 1:
                # transition: pack the XLA tensor, then packed deconv
                xp, spec = pack(h.astype(self.dtype or h.dtype),
                                w_align=max(skip_spec.w_stored // 2, 1))
            up = PackedDeconvBlock(
                dec_plan[0], cin, spec, use_bias=self.bias,
                batchnorm=self.BN, act=self.act, dtype=self.dtype,
                interpret=self.interpret,
                spatial_axis=self.spatial_axis)(xp, train)
            from .packed import PackedSpec
            spec = PackedSpec(next_pow2(dec_plan[0]), 2 * spec.w,
                              2 * spec.w_stored, 2 * spec.h,
                              2 * spec.h_stored)
            up, spec = fit_packed(up, spec, skip_spec.w_stored,
                                  skip_spec.h_stored)
            cin = dec_plan[0]
            xp = up
            for fi, f in enumerate(dec_plan[1:]):
                if fi == 0:
                    xp = pcb(f, (cin, skip_c), (spec, skip_spec),
                             (xp, skip_p))
                else:
                    xp = pcb(f, cin, spec, xp)
                spec = dataclasses.replace(
                    spec, c=effective_cout(
                        f, (spec, skip_spec) if fi == 0 else spec))
                cin = f
            if j == len(self.decoders) - 1:
                xp = pcb(self.n_classes, cin, spec, xp, ks=1, act="None",
                         bn=False)
                spec = dataclasses.replace(
                    spec, c=effective_cout(self.n_classes, spec))
                return unpack(xp, spec, c_valid=self.n_classes)
        return unpack(xp, spec)  # pragma: no cover (plans end at level 0)
