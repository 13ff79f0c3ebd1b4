"""VoxelMorph (CVPR 2018) registration network + spatial transformer.

Capability parity with lib/network_factory/voxel_morph.py:18-101: a 5-level
strided-conv encoder over the concatenated (source, target) pair, a decoder
with nearest-neighbour upsampling to the matching encoder resolutions and
channel-concat skips (the reference's ``F.interpolate`` calls default to
nearest, voxel_morph.py:72-80), a 3-channel flow head, and a trilinear
spatial-transformer warp of the source by ``displacement + identity``
(voxel_morph.py:85-91).

Channel-last layout; the returned displacement/deformation fields are
``(B, D, H, W, 3)`` with last axis (x, y, z) in normalized [-1, 1] units —
identical semantics to the reference's permuted grid.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import grid_sample, identity_grid_batch, nearest_resize
from .layers import ConvBlock, conv_kernel_init
from .unet import _maybe_remat


class VoxelMorphCVPR2018(nn.Module):
    input_channel: int = 2
    output_channel: int = 3
    enc_filters: Tuple[int, ...] = (16, 32, 32, 32, 32)
    dec_filters: Tuple[int, ...] = (32, 32, 32, 8, 8)
    dtype: Any = None
    remat: bool = False
    # spatial transformer backend: the Pallas kernel (pallas/warp.py) avoids
    # XLA's slow TPU gather; exact for |disp| <= max_disp voxels in z/y
    use_pallas_warp: bool = False
    max_disp: int = 8
    # forbid the silent XLA fallback of the Pallas warp (dryruns/tests
    # asserting the kernel path is actually engaged)
    require_kernel: bool = False
    # packed execution of the full- and half-resolution convolutions on the
    # lane-packed Pallas kernels (pallas/conv3d.py) — XLA's channel-minor
    # layouts pad the C=3..16 full-resolution tensors of this net 16-43x
    packed: bool = False
    interpret: Any = None
    # constant multiplier on the predicted displacement field (1.0 = the
    # reference semantics).  Lets benchmarks/calibration emulate the trained
    # regime (fields of a few voxels, voxel_morph.py:88) from an untrained
    # net, and matches the integer-scaling knob common to VoxelMorph forks.
    flow_scale: float = 1.0
    # depth sharding (parallel/spatial.py): stride-1/-2 convs halo-exchange
    # boundary planes, the nearest 2x upsamples and flow head are handled
    # locally, the identity grid is the GLOBAL one sliced per shard, and
    # the spatial transformer warps through a max_disp+1-plane halo with
    # the clamp-bounded semantics (ops/halo.py::spatial_grid_sample).
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, source: jnp.ndarray, target: jnp.ndarray,
                 train: bool = False):
        """Register ``source`` onto ``target``.

        Args:
          source, target: ``(B, D, H, W, C)`` volumes (C normally 1).

        Returns:
          (disp_field, warped_source, deform_field) — fields are
          ``(B, D, H, W, 3)``, warped_source matches source's shape.
        """
        if self.spatial_axis is not None and (self.packed
                                              or self.use_pallas_warp):
            raise ValueError(
                "spatial_axis currently requires the XLA trunk and warp "
                "(packed=False, use_pallas_warp=False); the spatial warp "
                "is clamp-bounded at max_disp like the Pallas path")
        if self.packed:
            disp_field = self._packed_trunk(source, target, train)
        else:
            disp_field = self._xla_trunk(source, target, train)
        if self.flow_scale != 1.0:
            disp_field = disp_field * jnp.float32(self.flow_scale)

        if self.spatial_axis is not None:
            from ..ops.halo import shard_identity_grid, spatial_grid_sample
            deform_field = disp_field + shard_identity_grid(
                source.shape, self.spatial_axis, dtype=disp_field.dtype)
            warped_source = spatial_grid_sample(
                source.astype(jnp.float32), deform_field,
                self.spatial_axis, max_disp=self.max_disp)
            return disp_field, warped_source, deform_field

        deform_field = disp_field + identity_grid_batch(
            source.shape, dtype=disp_field.dtype)
        if self.use_pallas_warp:
            from ..pallas import pallas_grid_sample
            warped_source = pallas_grid_sample(
                source.astype(jnp.float32), deform_field,
                max_disp=self.max_disp, ct_sparse=False,  # image ct: dense
                require_kernel=self.require_kernel)
        else:
            warped_source = grid_sample(source, deform_field,
                                        mode="trilinear")
        return disp_field, warped_source, deform_field

    def _xla_trunk(self, source, target, train):
        CB = _maybe_remat(ConvBlock, self.remat)

        def conv(features, h, stride=1):
            return CB(features, 3, stride, 1, use_bias=True,
                      batchnorm=False, act="ReLU", dtype=self.dtype,
                      spatial_axis=self.spatial_axis)(h, train)

        x = jnp.concatenate([source, target], axis=-1)
        encs = []
        for i, f in enumerate(self.enc_filters):
            x = conv(f, x, stride=1 if i == 0 else 2)
            encs.append(x)
        e1, e2, e3, e4, e5 = encs

        d1 = conv(self.dec_filters[0], nearest_resize(e5, e4.shape[1:4]))
        d2 = conv(self.dec_filters[1],
                  nearest_resize(jnp.concatenate([d1, e4], axis=-1),
                                 e3.shape[1:4]))
        d3 = conv(self.dec_filters[2],
                  nearest_resize(jnp.concatenate([d2, e3], axis=-1),
                                 e2.shape[1:4]))
        d4 = conv(self.dec_filters[3], jnp.concatenate([d3, e2], axis=-1))
        d5 = conv(self.dec_filters[4], nearest_resize(d4, e1.shape[1:4]))

        head_in = jnp.concatenate([d5, e1], axis=-1)
        d_pad = (1, 1)
        if self.spatial_axis is not None:
            # same halo treatment as ConvBlock, inlined to keep the flow
            # head's parameter path ('Conv_0') checkpoint-compatible
            from ..ops.halo import halo_exchange_d
            head_in = halo_exchange_d(head_in, self.spatial_axis, 1)
            d_pad = (0, 0)
        disp_field = nn.Conv(self.output_channel, (3, 3, 3), strides=(1, 1, 1),
                             padding=[d_pad, (1, 1), (1, 1)], use_bias=True,
                             dtype=self.dtype, kernel_init=conv_kernel_init)(
            head_in)
        # the warp/deform math stays in f32: bf16 displacement quantizes
        # voxel coordinates too coarsely for sub-voxel registration
        return disp_field.astype(jnp.float32)

    def _packed_trunk(self, source, target, train):
        """The same network with levels 0/1 (full/half resolution) on the
        packed Pallas kernels.  Strided encoder convs become stride-1 packed
        convs + even-index subsample (exact, torch Conv3d(k3 s2 p1)
        semantics); the decoder's nearest 2x upsample is the packed identity
        transposed conv.  Deeper levels (sixteenth..quarter resolution, tiny
        tensors) keep the XLA blocks."""
        import dataclasses

        from .packed import (PackedConvBlock, PackedSpec, fit_packed, pack,
                             packed_nearest_up2, packed_stride2, unpack)

        def pcb(features, cins, specs, h, act="ReLU"):
            return PackedConvBlock(
                features, cins, specs, kernel_size=3, use_bias=True,
                batchnorm=False, act=act, dtype=self.dtype,
                interpret=self.interpret)(h, train)

        CB = _maybe_remat(ConvBlock, self.remat)

        def conv(features, h, stride=1):
            return CB(features, 3, stride, 1, use_bias=True,
                      batchnorm=False, act="ReLU", dtype=self.dtype)(h, train)

        dt = self.dtype or source.dtype
        x = jnp.concatenate([source, target], axis=-1).astype(dt)
        f1, f2 = self.enc_filters[0], self.enc_filters[1]
        # 2-channel entry: w-groups of 64 (K = 128) — stored W aligns to 64
        xp, spec = pack(x, c_pad=2, w_align=64)
        e1p = pcb(f1, 2, spec, xp)
        spec = dataclasses.replace(spec, c=f1)
        spec_e1 = spec
        t = pcb(f2, f1, spec, e1p)
        spec = dataclasses.replace(spec, c=f2)
        e2p, spec_e2 = packed_stride2(t, spec)
        e2 = unpack(e2p, spec_e2)

        # deep levels: XLA
        e3 = conv(self.enc_filters[2], e2, stride=2)
        e4 = conv(self.enc_filters[3], e3, stride=2)
        e5 = conv(self.enc_filters[4], e4, stride=2)
        d1 = conv(self.dec_filters[0], nearest_resize(e5, e4.shape[1:4]))
        d2 = conv(self.dec_filters[1],
                  nearest_resize(jnp.concatenate([d1, e4], axis=-1),
                                 e3.shape[1:4]))
        d3 = conv(self.dec_filters[2],
                  nearest_resize(jnp.concatenate([d2, e3], axis=-1),
                                 e2.shape[1:4]))

        # d4 @ half resolution, packed: conv(cat(d3, e2)) as split kernels
        d3p, spec_d3 = pack(d3.astype(dt),
                            w_align=spec_e2.w_stored)
        d3p, spec_d3 = fit_packed(d3p, spec_d3, spec_e2.w_stored,
                                  spec_e2.h_stored)
        d4p = pcb(self.dec_filters[3], (self.dec_filters[2], f2),
                  (spec_d3, spec_e2), (d3p, e2p))
        spec_d4 = dataclasses.replace(spec_e2,
                                      c=max(self.dec_filters[3], 8))

        # d5 @ full resolution: nearest up + conv
        up, spec_up = packed_nearest_up2(d4p, spec_d4,
                                         interpret=self.interpret)
        up, spec_up = fit_packed(up, spec_up, spec_e1.w_stored,
                                 spec_e1.h_stored)
        d5p = pcb(self.dec_filters[4], spec_d4.c, spec_up, up)
        spec_d5 = dataclasses.replace(spec_up,
                                      c=max(self.dec_filters[4], 8))

        # flow head: conv(cat(d5, e1)) -> 3 channels (lane-padded to 8)
        flowp = pcb(self.output_channel, (self.dec_filters[4], f1),
                    (spec_d5, spec_e1), (d5p, e1p), act="None")
        spec_f = dataclasses.replace(spec_d5, c=8)
        return unpack(flowp, spec_f,
                      c_valid=self.output_channel).astype(jnp.float32)
