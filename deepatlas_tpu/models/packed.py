"""Packed-layout U-Net building blocks.

These mirror models/layers.py's ConvBlock / DeconvBlock / max_pool_3d but on
lane-packed activations ``(B, D, H_stored, W_stored*C)`` (channels folded
into the 128-lane axis — see pallas/conv3d.py for why: XLA's channel-minor
layouts pad full-resolution C=8..32 tensors 8-64x, which both OOMs the
joint DeepAtlas seg phase and makes every conv bandwidth-bound on padding).

Semantics match the reference blocks (lib/network_factory/modules.py:28-87):
Conv3d(k3 s1 p1) + optional BatchNorm(momentum .9, eps 1e-5) + activation,
ConvTranspose3d(k2 s2) + BN + activation, MaxPool3d(2).  BatchNorm is
written out explicitly so its statistics ignore the W/H padding voxels and
all its temporaries stay in the packed layout; the pad region is re-zeroed
after every block (the invariant the packed convs' edge taps rely on).

A ``PackedSpec`` carries the logical-vs-stored geometry between blocks.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..pallas.conv3d import (pack_channels, packed_conv3d, unpack_channels)
from ..pallas.deconv3d import deconv_w_blk, packed_deconv2x
from .layers import conv_kernel_init, get_activation


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@dataclasses.dataclass(frozen=True)
class PackedSpec:
    """Geometry of a packed activation: logical (w, h) inside stored
    (w_stored, h_stored), c channels per lane group."""
    c: int
    w: int
    w_stored: int
    h: int
    h_stored: int

    @property
    def lanes(self) -> int:
        return self.w_stored * self.c


def pack(x: jnp.ndarray, c_pad: Optional[int] = None,
         w_align: int = 16) -> Tuple[jnp.ndarray, PackedSpec]:
    """(B, D, H, W, C) -> packed + spec.  ``c_pad`` zero-extends channels
    (e.g. the 1-channel input volume packs as 8 lanes per w)."""
    b, d, h, w, c = x.shape
    c_eff = c_pad or next_pow2(max(c, 8))
    if c_eff != c:
        x = jnp.pad(x, [(0, 0)] * 4 + [(0, c_eff - c)])
    ws = _ceil_to(w, w_align)
    hs = _ceil_to(h, 8)
    return pack_channels(x, ws, hs), PackedSpec(c_eff, w, ws, h, hs)


def unpack(x: jnp.ndarray, spec: PackedSpec,
           c_valid: Optional[int] = None) -> jnp.ndarray:
    out = unpack_channels(x, spec.c, spec.w, spec.h)
    return out[..., :c_valid] if c_valid else out


def effective_cout(features: int, specs=None) -> int:
    """Lane-packed output channel count: the next power of two, floored at
    8 so the conv's w-group stays <= 16 (every stored width in the packed
    pipeline is a multiple of its level's w-groups; tiny class counts
    would otherwise demand w-groups of 32+)."""
    del specs
    return max(next_pow2(features), 8)


def _pad_mask(spec: PackedSpec, c_out: int) -> jnp.ndarray:
    """(1, 1, H_stored, W_stored*c_out) bool: True on valid voxels."""
    lane = jnp.arange(spec.w_stored * c_out) < spec.w * c_out
    row = jnp.arange(spec.h_stored) < spec.h
    return (row[:, None] & lane[None, :])[None, None]


class PackedBatchNorm(nn.Module):
    """Per-channel BatchNorm on packed activations (torch semantics:
    momentum 0.9 running stats, eps 1e-5, biased batch variance — matching
    flax nn.BatchNorm as used by models/layers.py).  Statistics exclude the
    W/H pad voxels.

    ``spatial_axis``: mesh-axis name when D is sharded over devices
    (parallel/spatial.py) — batch moments then psum over the axis so the
    statistics equal the unsharded model's."""
    c: int
    n_valid: int                       # B*D_local*h*w valid voxels (static)
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = self.c
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if train:
            s = jnp.sum(x.astype(jnp.float32), axis=(0, 1, 2))
            s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(0, 1, 2))
            s = s.reshape(-1, c).sum(axis=0)
            s2 = s2.reshape(-1, c).sum(axis=0)
            n_valid = self.n_valid
            if self.spatial_axis is not None:
                n_sh = jax.lax.axis_size(self.spatial_axis)
                if n_sh > 1:   # axis size is static — skip at mesh-of-1
                    # ONE psum for both moments (collective launches are
                    # the cost, not the 2C floats)
                    s, s2 = jax.lax.psum((s, s2), self.spatial_axis)
                n_valid = n_valid * n_sh
            mean = s / n_valid
            var = jnp.maximum(s2 / n_valid - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value \
                    + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value \
                    + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        mul = (scale * jax.lax.rsqrt(var + self.epsilon))
        add = bias - mean * mul
        w_s = x.shape[-1] // c
        dt = self.dtype or x.dtype
        mul_l = jnp.tile(mul, w_s).astype(dt)
        add_l = jnp.tile(add, w_s).astype(dt)
        return x.astype(dt) * mul_l + add_l


class PackedConvBlock(nn.Module):
    """Conv3d(k3 or k1, s1) + bias + optional BN + activation, packed.

    ``in_features`` may be a tuple: the input is then a tuple of packed
    activations whose channel-concat this block convolves (skip connections
    never materialize a packed concat — conv(concat(a, b)) = conv_a(a) +
    conv_b(b)).

    ``spatial_axis``: mesh-axis name when D is depth-sharded
    (parallel/spatial.py).  The packed layout keeps D as a plain array
    axis, so the composition is direct: each input halo-exchanges one
    neighbour plane (ops/halo.py), the kernel's implicit zero D padding
    then lands on the discarded halo-adjacent outputs, and slicing the
    interior planes reproduces the unsharded SAME conv exactly (global
    edges receive zero halos = the volume's zero padding)."""
    features: int
    in_features: Any                   # int or tuple of ints
    spec: Any                          # PackedSpec or tuple of PackedSpec
    kernel_size: int = 3
    use_bias: bool = True
    batchnorm: bool = False
    act: str = "ReLU"
    dtype: Any = None
    interpret: Optional[bool] = None
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x: Any, train: bool = False) -> jnp.ndarray:
        ins = x if isinstance(x, (tuple, list)) else (x,)
        cins = self.in_features if isinstance(self.in_features, (tuple, list)) \
            else (self.in_features,)
        specs = self.spec if isinstance(self.spec, (tuple, list)) \
            else (self.spec,)
        ks = self.kernel_size
        # the param keeps the *logical* channel counts (weight transfer /
        # checkpoint compatibility); lane packing pads to powers of two
        kernel = self.param(
            "kernel", conv_kernel_init,
            (ks, ks, ks, sum(cins), self.features), jnp.float32)
        co_eff = effective_cout(self.features, specs)
        halo = 1 if (self.spatial_axis is not None and ks == 3) else 0
        out = None
        off = 0
        for xi, ci, sp in zip(ins, cins, specs):
            kpart = kernel[:, :, :, off:off + ci, :]
            off += ci
            if ci != sp.c:        # entry conv: input channels zero-padded
                kpart = jnp.pad(kpart, [(0, 0)] * 3
                                + [(0, sp.c - ci), (0, 0)])
            if co_eff != self.features:
                kpart = jnp.pad(kpart, [(0, 0)] * 4
                                + [(0, co_eff - self.features)])
            if halo:
                from ..ops.halo import halo_exchange_d
                xi = halo_exchange_d(xi, self.spatial_axis, halo)
            parts = []
            for b in range(xi.shape[0]):
                parts.append(packed_conv3d(
                    xi[b].astype(self.dtype or xi.dtype), kpart, c_in=sp.c,
                    w_valid=sp.w, h_valid=sp.h, kernel_size=ks,
                    interpret=self.interpret))
            y = jnp.stack(parts)
            out = y if out is None else out + y
        if halo:
            # the kernel's zero D padding fell on the halo-adjacent output
            # planes; the interior equals the unsharded SAME conv
            out = out[:, halo:-halo]
        sp0 = specs[0]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            bias_eff = jnp.pad(bias, (0, co_eff - self.features)) \
                if co_eff != self.features else bias
            out = out + jnp.tile(bias_eff, sp0.w_stored).astype(out.dtype)
        if self.batchnorm:
            if co_eff != self.features:
                raise NotImplementedError(
                    "BN on non-power-of-two channel counts in packed "
                    "layout — pad the plan or disable BN on this block")
            n_valid = out.shape[0] * out.shape[1] * sp0.h * sp0.w
            out = PackedBatchNorm(co_eff, n_valid, dtype=self.dtype,
                                  spatial_axis=self.spatial_axis)(out, train)
        out = get_activation(self.act)(out)
        # restore the zero pad region (bias/BN shift it; the next conv's
        # edge taps read it as volume zero padding).  Pad *channels* are
        # masked too so unpack-and-slice gives exact logits.
        mask = _pad_mask(sp0, co_eff)
        if co_eff != self.features:
            ch = jnp.arange(sp0.w_stored * co_eff) % co_eff < self.features
            mask = mask & ch[None, None, None, :]
        out = jnp.where(mask, out, jnp.zeros((), out.dtype))
        return out


class PackedDeconvBlock(nn.Module):
    """ConvTranspose3d(k2 s2) + bias + optional BN + activation, packed.
    Doubles D, h, w (stored H doubles too, so sublane alignment holds).
    kernel == stride makes it shard-local under depth sharding;
    ``spatial_axis`` only routes the BatchNorm moment reduction."""
    features: int
    in_features: int
    spec: PackedSpec
    use_bias: bool = True
    batchnorm: bool = False
    act: str = "ReLU"
    dtype: Any = None
    interpret: Optional[bool] = None
    spatial_axis: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        sp = self.spec
        # torch ConvTranspose3d weight is (cin, cout, 2, 2, 2); we keep the
        # (2,2,2,cin,cout) layout used by flax (transfer tests permute)
        kernel = self.param("kernel", conv_kernel_init,
                            (2, 2, 2, self.in_features, self.features),
                            jnp.float32)
        parts = []
        for b in range(x.shape[0]):
            parts.append(packed_deconv2x(
                x[b].astype(self.dtype or x.dtype), kernel,
                c_in=self.in_features, w_valid_out=2 * sp.w,
                interpret=self.interpret))
        out = jnp.stack(parts)
        out_spec = PackedSpec(self.features, 2 * sp.w, 2 * sp.w_stored,
                              2 * sp.h, 2 * sp.h_stored)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + jnp.tile(bias, out_spec.w_stored).astype(out.dtype)
        if self.batchnorm:
            n_valid = out.shape[0] * out.shape[1] * out_spec.h * out_spec.w
            out = PackedBatchNorm(self.features, n_valid, dtype=self.dtype,
                                  spatial_axis=self.spatial_axis)(out, train)
        out = get_activation(self.act)(out)
        out = jnp.where(_pad_mask(out_spec, self.features), out,
                        jnp.zeros((), out.dtype))
        return out


def packed_max_pool(x: jnp.ndarray, spec: PackedSpec,
                    w_align: int = 16) -> Tuple[jnp.ndarray, PackedSpec]:
    """MaxPool3d(2) on packed activations (torch floor semantics).

    D and H halve by strided slicing; the w-pair max regroups lanes
    ``(W/2, 2, C)`` (a small transient with minor dim 2C — the only place
    the packed pipeline tolerates lane-split padding, on a 1/8-size
    tensor).  The result is re-aligned to ``w_align`` for the next level's
    w-groups and its pad region re-zeroed.
    """
    b, d, hs, L = x.shape
    c = spec.c
    d2 = d // 2
    h2v = spec.h // 2
    w2v = spec.w // 2
    m = jnp.maximum(x[:, 0:2 * d2:2], x[:, 1:2 * d2:2])
    m = jnp.maximum(m[:, :, 0::2], m[:, :, 1::2])          # (B, D2, Hs/2, L)
    ws2 = spec.w_stored // 2
    m = m.reshape(b, d2, hs // 2, ws2, 2, c)
    m = jnp.maximum(m[..., 0, :], m[..., 1, :])            # (B,D2,Hs/2,ws2,C)
    # re-align stored dims for the next level
    ws_new = _ceil_to(max(w2v, 1), w_align)
    hs_new = _ceil_to(max(h2v, 1), 8)
    m = m[:, :, :hs_new if hs_new <= hs // 2 else hs // 2, :, :]
    if ws_new <= ws2:
        m = m[:, :, :, :ws_new, :]
    else:
        m = jnp.pad(m, [(0, 0), (0, 0), (0, 0), (0, ws_new - ws2), (0, 0)])
    cur_h = m.shape[2]
    if hs_new > cur_h:
        m = jnp.pad(m, [(0, 0), (0, 0), (0, hs_new - cur_h), (0, 0), (0, 0)])
    else:
        m = m[:, :, :hs_new]
    new_spec = PackedSpec(c, w2v, ws_new, h2v, hs_new)
    m = m.reshape(b, d2, hs_new, ws_new * c)
    # zero pad voxels that strided slicing may have carried along
    m = jnp.where(_pad_mask(new_spec, c), m, jnp.zeros((), m.dtype))
    return m, new_spec


def fit_packed(x: jnp.ndarray, spec: PackedSpec, w_stored: int,
               h_stored: int) -> Tuple[jnp.ndarray, PackedSpec]:
    """Re-align a packed activation's stored geometry (slice/pad rows and
    lane groups) — used where a deconv's doubled storage must match the
    skip connection's.  Valid voxels are untouched; pads stay zero."""
    b, d, hs, L = x.shape
    c = spec.c
    if hs > h_stored:
        x = x[:, :, :h_stored]
    elif hs < h_stored:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, h_stored - hs), (0, 0)])
    ws = spec.w_stored
    if ws > w_stored:
        x = x[..., :w_stored * c]
    elif ws < w_stored:
        x = jnp.pad(x, [(0, 0)] * 3 + [(0, (w_stored - ws) * c)])
    return x, PackedSpec(c, spec.w, w_stored, spec.h, h_stored)


def packed_stride2(x: jnp.ndarray, spec: PackedSpec,
                   w_align: int = 16) -> Tuple[jnp.ndarray, PackedSpec]:
    """Even-index subsample (d, h, w) of a packed activation — composing a
    stride-1 packed conv with this reproduces torch Conv3d(k3, s2, p1)
    exactly (output o reads input 2o and its ±1 taps)."""
    b, d, hs, L = x.shape
    c = spec.c
    d2 = -(-d // 2)
    m = x[:, 0::2, 0::2]                                   # (B, d2, hs/2, L)
    ws2 = spec.w_stored // 2
    m = m.reshape(b, d2, hs // 2, ws2, 2, c)[..., 0, :]    # even w
    w2 = -(-spec.w // 2)
    h2 = -(-spec.h // 2)
    ws_new = _ceil_to(max(w2, 1), w_align)
    hs_new = _ceil_to(max(h2, 1), 8)
    cur_h = m.shape[2]
    if ws_new <= ws2:
        m = m[:, :, :, :ws_new, :]
    else:
        m = jnp.pad(m, [(0, 0)] * 3 + [(0, ws_new - ws2), (0, 0)])
    if hs_new <= cur_h:
        m = m[:, :, :hs_new]
    else:
        m = jnp.pad(m, [(0, 0), (0, 0), (0, hs_new - cur_h), (0, 0), (0, 0)])
    new_spec = PackedSpec(c, w2, ws_new, h2, hs_new)
    m = m.reshape(b, d2, hs_new, ws_new * c)
    m = jnp.where(_pad_mask(new_spec, c), m, jnp.zeros((), m.dtype))
    return m, new_spec


def packed_nearest_up2(x: jnp.ndarray, spec: PackedSpec,
                       interpret=None) -> Tuple[jnp.ndarray, PackedSpec]:
    """Nearest-neighbour 2x upsample of a packed activation (the reference's
    F.interpolate default, voxel_morph.py:72-80) — a packed k2 s2 transposed
    conv with the constant identity bank (every tap copies the input)."""
    c = spec.c
    k = jnp.broadcast_to(jnp.eye(c, dtype=jnp.float32), (2, 2, 2, c, c))
    parts = [packed_deconv2x(x[b], k, c_in=c, w_valid_out=2 * spec.w,
                             interpret=interpret)
             for b in range(x.shape[0])]
    out = jnp.stack(parts)
    return out, PackedSpec(c, 2 * spec.w, 2 * spec.w_stored, 2 * spec.h,
                           2 * spec.h_stored)


def transfer_unet_params(std_vars: dict, model) -> dict:
    """Map a standard ``UNetTemplate`` variable tree onto the packed
    variant's tree (same plan, any ``packed_levels``) — packed and standard
    variants store identical math under different module names/layouts, so
    checkpoints trained on one execute on the other.

    Args:
      std_vars: ``{'params': ..., ['batch_stats': ...]}`` from the standard
        (XLA-conv) model.
      model: the packed ``UNetTemplate`` instance (``packed=True``) whose
        plan/flags describe the target tree.

    Returns the packed model's variable dict.  Module creation order is
    deterministic in both paths (encoder chains top-down, then decoder
    levels), which this mapping mirrors; parity is pinned in
    tests/test_packed_unet.py.
    """
    import jax.numpy as jnp

    encoders, decoders = model.encoders, model.decoders
    levels = len(encoders)
    nl = min(model.packed_levels, levels - 1)
    bn = model.BN
    p = std_vars["params"]
    bs = std_vars.get("batch_stats", {})
    out: dict = {}
    bso: dict = {}
    counters = {"pcb": 0, "cb": 0, "pdb": 0, "db": 0,
                "std_cb": 0, "std_db": 0}

    def emit_conv(packed: bool):
        src_name = f"ConvBlock_{counters['std_cb']}"
        counters["std_cb"] += 1
        src = p[src_name]
        if not packed:
            name = f"ConvBlock_{counters['cb']}"
            counters["cb"] += 1
            out[name] = src
            if bn and src_name in bs:
                bso[name] = bs[src_name]
            return
        name = f"PackedConvBlock_{counters['pcb']}"
        counters["pcb"] += 1
        dst = {"kernel": src["Conv_0"]["kernel"]}
        if "bias" in src["Conv_0"]:
            dst["bias"] = src["Conv_0"]["bias"]
        if bn and "BatchNorm_0" in src:
            dst["PackedBatchNorm_0"] = {
                "scale": src["BatchNorm_0"]["scale"],
                "bias": src["BatchNorm_0"]["bias"]}
            bso[name] = {"PackedBatchNorm_0": {
                "mean": bs[src_name]["BatchNorm_0"]["mean"],
                "var": bs[src_name]["BatchNorm_0"]["var"]}}
        out[name] = dst

    def emit_deconv(packed: bool):
        src_name = f"DeconvBlock_{counters['std_db']}"
        counters["std_db"] += 1
        src = p[src_name]
        if not packed:
            name = f"DeconvBlock_{counters['db']}"
            counters["db"] += 1
            out[name] = src
            if bn and src_name in bs:
                bso[name] = bs[src_name]
            return
        name = f"PackedDeconvBlock_{counters['pdb']}"
        counters["pdb"] += 1
        # std DeconvBlock kernel is (2,2,2,O,I) (transpose_kernel); the
        # packed deconv kernel is (2,2,2,I,O)
        dst = {"kernel": jnp.transpose(src["ConvTranspose_0"]["kernel"],
                                       (0, 1, 2, 4, 3))}
        if "bias" in src["ConvTranspose_0"]:
            dst["bias"] = src["ConvTranspose_0"]["bias"]
        if bn and "BatchNorm_0" in src:
            dst["PackedBatchNorm_0"] = {
                "scale": src["BatchNorm_0"]["scale"],
                "bias": src["BatchNorm_0"]["bias"]}
            bso[name] = {"PackedBatchNorm_0": {
                "mean": bs[src_name]["BatchNorm_0"]["mean"],
                "var": bs[src_name]["BatchNorm_0"]["var"]}}
        out[name] = dst

    for i, plan in enumerate(encoders):
        chain = plan if i == 0 else plan[1:]
        for _ in chain:
            emit_conv(packed=i < nl)
    for j, dec_plan in enumerate(decoders):
        out_level = levels - 2 - j
        emit_deconv(packed=out_level < nl)
        for _ in dec_plan[1:]:
            emit_conv(packed=out_level < nl)
    # final 1x1 conv (appended at the last decoder level)
    fin_level = levels - 2 - (len(decoders) - 1)
    fin = {"kernel": p["Conv_0"]["kernel"]}
    if "bias" in p["Conv_0"]:
        fin["bias"] = p["Conv_0"]["bias"]
    if fin_level < nl:
        out[f"PackedConvBlock_{counters['pcb']}"] = fin
    else:
        out["Conv_0"] = fin

    vars_out = {"params": out}
    if bn:
        vars_out["batch_stats"] = bso
    return vars_out
