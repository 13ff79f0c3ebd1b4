"""Fused hard-label anatomy dice: the joint-training loss without the C=32 warp.

The DeepAtlas reg phase computes ``soft_dice_on_probs(warp(one_hot(lab_m)),
lab_f)`` (train/reg_steps.py) — in the reg phase both anatomies are hard
labels (ground truth or the frozen seg net's argmax), so the dense C=n_class
one-hot warp does n_class times the gather work (and memory) of a scalar
warp just to throw most of it away in the dice reductions.  Round-1 measured
the full joint reg step at ~7.3 s, dominated by this warp.

The identity that removes the channel dimension: with hard labels,

  inter_c   = sum_v [lab_f(v)=c] * m(v),   m(v) = sum_i w_i(v)*[lab_m(i_v)=c]
  denom_m_c = sum_{v'} [lab_m(v')=c] * u(v'),  u = splat(ones)  (warp adjoint)

so the whole anatomy loss needs ONE matched-warp pass (gather labels, compare
to the target voxel's label, tent-accumulate — a one-line change to the
pallas/warp.py kernel) and ONE ones-splat (existing kernel), plus two
per-class binned sums that are tiny MXU matmuls.  The backward w.r.t. the
deformation is again two C=1 passes (the matched grid-gradient kernel and
the existing grid-gradient kernel on the binned cotangent volume).

Exactness vs the dense composition is pinned in tests/test_anatomy.py.
Reference op: the anatomy term of the MICCAI'19 joint scheme — warp at
voxel_morph.py:85-91 + DiceLossOnLabel, loss.py:348-391.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.warp import clamp_displacement
from .splat import pallas_splat
from .warp import (LANE, _JW, _SW, _bwd_grid_single, _ceil_to,  # noqa: F401
                   _default_interpret, _gather_pre, _joint_sdy_meta,
                   _ldecode, _pad_last, _prep_gather, _tent, _tile_meta,
                   _vox_coords, _wp_for, _ypad)


# ------------------------------------------------------------- kernels

def _matched_fwd_kernel(gz_ref, gy_ref, gx_ref, lf_ref, lab_ref, meta_ref,
                        jmeta_ref, out_ref, slab, sem, *, d, h, w, wp,
                        tz, r):
    """m(v) = sum_i w_i(v) * [lab_m(corner_i(v)) == lab_f(v)]."""
    s_planes = tz + 2 * (r + 1)
    yp = _ypad(r)
    hp = h + 2 * yp
    zi = pl.program_id(0)
    z0 = zi * tz
    s0 = jnp.clip(z0 - (r + 1), 0, jnp.maximum(d - s_planes, 0))
    slab[...] = jnp.zeros_like(slab)
    cp = pltpu.make_async_copy(
        lab_ref.at[pl.ds(s0, s_planes), :, :],
        slab.at[:, pl.ds(yp, h), :], sem)
    cp.start()

    gz = gz_ref[...] - s0.astype(jnp.float32)
    gy = gy_ref[...]
    gx = gx_ref[...]
    lf = lf_ref[...]

    rows = jax.lax.broadcasted_iota(jnp.int32, gz.shape, 1)
    ty = gy - rows.astype(jnp.float32)
    # packed offset lists from the SMEM meta (warp.py _tile_meta); the
    # dy loop is per source plane (_joint_sdy_meta)
    ns = meta_ref[zi, 0]

    # shared single gather plan (see warp.py _fwd_kernel): v1 at ix1, v0
    # via the one-lane-rolled plane; index prep + masked blend weights
    # hoisted out of the loops
    ix0 = jnp.floor(gx).astype(jnp.int32)
    fx = gx - ix0.astype(jnp.float32)
    x_ok0 = (ix0 >= 0) & (ix0 <= w - 1)
    x_ok1 = (ix0 + 1 >= 0) & (ix0 + 1 <= w - 1)
    ix1c = jnp.clip(ix0 + 1, 0, wp - 1)
    prep = _prep_gather(ix1c, wp)
    w0m = jnp.where(x_ok0, 1.0 - fx, 0.0)
    w1m = jnp.where(x_ok1, fx, 0.0)

    cp.wait()

    def z_body(j1, acc):
        s = _ldecode(meta_ref, zi, 2, j1)
        wz = _tent(gz - s.astype(jnp.float32))
        ndy_s = jmeta_ref[zi, s * _JW]

        def y_body(j2, acc):
            dy = (jax.lax.shift_right_logical(
                jmeta_ref[zi, s * _JW + 1 + j2 // 6],
                5 * (j2 % 6)) & 31) - (r + 1)
            y_src = rows + dy
            wy = jnp.where((y_src >= 0) & (y_src <= h - 1),
                           _tent(ty - dy.astype(jnp.float32)), 0.0)
            wzy = wz * wy
            k = jnp.mod(hp - (yp + dy), hp)
            rolled = pltpu.roll(slab[s].astype(jnp.float32), k, 0)[0:h]
            v1 = _gather_pre(jnp.broadcast_to(rolled, gz.shape), prep)
            v0 = _gather_pre(jnp.broadcast_to(
                pltpu.roll(rolled, 1, 1), gz.shape), prep)
            xv = jnp.where(jnp.abs(v0 - lf) < 0.5, w0m, 0.0) + \
                jnp.where(jnp.abs(v1 - lf) < 0.5, w1m, 0.0)
            return acc + wzy * xv

        return jax.lax.fori_loop(0, ndy_s, y_body, acc)

    acc = jax.lax.fori_loop(0, ns, z_body,
                            jnp.zeros(gz.shape, jnp.float32))
    out_ref[...] = acc


def _matched_fused_kernel(gz_ref, gy_ref, gx_ref, lf_ref, lab_ref, meta_ref,
                          jmeta_ref, out_ref, dgz_ref, dgy_ref, dgx_ref,
                          slab, sem, *, d, h, w, wp, tz, r):
    """Value AND unscaled grid-gradient planes in ONE (s, dy)-loop pass.

    The anatomy loss's cotangent w.r.t. m is per-OUTPUT-voxel (a LUT of
    ``lab_f``: d loss/d m(v) = g[lab_f(v)] after the binned-sum reductions),
    so it multiplies every (s, dy) contribution of ``_matched_bwd_kernel``
    elementwise and factors out of the loops entirely.  Accumulating the
    three derivative sums WITHOUT ct alongside the value makes the whole
    backward an elementwise ``ct * plane`` product — the joint loops run
    once instead of twice (round-4 reg-phase breakdown: the recomputing
    value+grad pair was 55% of the reg phase)."""
    s_planes = tz + 2 * (r + 1)
    yp = _ypad(r)
    hp = h + 2 * yp
    zi = pl.program_id(0)
    z0 = zi * tz
    s0 = jnp.clip(z0 - (r + 1), 0, jnp.maximum(d - s_planes, 0))
    slab[...] = jnp.zeros_like(slab)
    cp = pltpu.make_async_copy(
        lab_ref.at[pl.ds(s0, s_planes), :, :],
        slab.at[:, pl.ds(yp, h), :], sem)
    cp.start()

    gz = gz_ref[...] - s0.astype(jnp.float32)
    gy = gy_ref[...]
    gx = gx_ref[...]
    lf = lf_ref[...]

    rows = jax.lax.broadcasted_iota(jnp.int32, gz.shape, 1)
    ty = gy - rows.astype(jnp.float32)
    ns = meta_ref[zi, 0]

    ix0 = jnp.floor(gx).astype(jnp.int32)
    fx = gx - ix0.astype(jnp.float32)
    x_ok0f = jnp.where((ix0 >= 0) & (ix0 <= w - 1), 1.0, 0.0)
    x_ok1f = jnp.where((ix0 + 1 >= 0) & (ix0 + 1 <= w - 1), 1.0, 0.0)
    ix1c = jnp.clip(ix0 + 1, 0, wp - 1)
    prep = _prep_gather(ix1c, wp)
    fx0 = 1.0 - fx

    cp.wait()

    zero = jnp.zeros(gz.shape, jnp.float32)

    def z_body(j1, accs):
        s = _ldecode(meta_ref, zi, 2, j1)
        tz_f = gz - s.astype(jnp.float32)
        wz = _tent(tz_f)
        dwz = jnp.where(jnp.abs(tz_f) < 1.0, -jnp.sign(tz_f), 0.0)
        ndy_s = jmeta_ref[zi, s * _JW]

        # hoist the dy-invariant factors (wz, dwz) and the loop-invariant
        # x-blend (fx0, fx) out of the inner loop: accumulate only the
        # per-plane sums p = sum_dy wy*v0, q = sum_dy wy*v1 and
        # ay_p = sum_dy dwy*xv, then reconstruct t = fx0*p + fx*q (shared
        # by the value and z-grad) and the x-grad u = q - p ONCE per s.
        # The sweep is elementwise-VPU-bound (r4 breakdown: value 225 ms,
        # value+grad 435 ms at identical gather/roll traffic), so per-trip
        # vector-op count is the cost — this drops the four
        # wz*wy*xv-style triple-product chains from every trip.
        def y_body(j2, pqa):
            dy = (jax.lax.shift_right_logical(
                jmeta_ref[zi, s * _JW + 1 + j2 // 6],
                5 * (j2 % 6)) & 31) - (r + 1)
            p, q, ay_p = pqa
            k = jnp.mod(hp - (yp + dy), hp)
            rolled = pltpu.roll(slab[s].astype(jnp.float32), k, 0)[0:h]
            g1 = _gather_pre(jnp.broadcast_to(rolled, gz.shape), prep)
            g0 = _gather_pre(jnp.broadcast_to(
                pltpu.roll(rolled, 1, 1), gz.shape), prep)
            v0 = jnp.where(jnp.abs(g0 - lf) < 0.5, x_ok0f, 0.0)
            v1 = jnp.where(jnp.abs(g1 - lf) < 0.5, x_ok1f, 0.0)
            ty_f = ty - dy.astype(jnp.float32)
            y_in = (rows + dy >= 0) & (rows + dy <= h - 1)
            wy = jnp.where(y_in, _tent(ty_f), 0.0)
            dwy = jnp.where(y_in & (jnp.abs(ty_f) < 1.0),
                            -jnp.sign(ty_f), 0.0)
            xv = fx0 * v0 + fx * v1
            return p + wy * v0, q + wy * v1, ay_p + dwy * xv

        p, q, ay_p = jax.lax.fori_loop(0, ndy_s, y_body,
                                       (zero, zero, zero))
        am, az, ay, ax = accs
        t = fx0 * p + fx * q
        return (am + wz * t, az + dwz * t, ay + wz * ay_p,
                ax + wz * (q - p))

    am, az, ay, ax = jax.lax.fori_loop(0, ns, z_body,
                                       (zero, zero, zero, zero))
    out_ref[...] = am
    dgz_ref[...] = az
    dgy_ref[...] = ay
    dgx_ref[...] = ax


def _matched_bwd_kernel(gz_ref, gy_ref, gx_ref, lf_ref, ct_ref, lab_ref,
                        meta_ref, jmeta_ref, dgz_ref, dgy_ref, dgx_ref,
                        slab, sem, *, d, h, w, wp, tz, r):
    s_planes = tz + 2 * (r + 1)
    yp = _ypad(r)
    hp = h + 2 * yp
    zi = pl.program_id(0)
    z0 = zi * tz
    s0 = jnp.clip(z0 - (r + 1), 0, jnp.maximum(d - s_planes, 0))
    slab[...] = jnp.zeros_like(slab)
    cp = pltpu.make_async_copy(
        lab_ref.at[pl.ds(s0, s_planes), :, :],
        slab.at[:, pl.ds(yp, h), :], sem)
    cp.start()

    gz = gz_ref[...] - s0.astype(jnp.float32)
    gy = gy_ref[...]
    gx = gx_ref[...]
    lf = lf_ref[...]
    ct = ct_ref[...]

    rows = jax.lax.broadcasted_iota(jnp.int32, gz.shape, 1)
    ty = gy - rows.astype(jnp.float32)
    # packed offset lists from the SMEM meta; the tent-derivative support
    # equals the tent support, so the same joint per-s lists are exact
    ns = meta_ref[zi, 0]

    ix0 = jnp.floor(gx).astype(jnp.int32)
    fx = gx - ix0.astype(jnp.float32)
    x_ok0f = jnp.where((ix0 >= 0) & (ix0 <= w - 1), 1.0, 0.0)
    x_ok1f = jnp.where((ix0 + 1 >= 0) & (ix0 + 1 <= w - 1), 1.0, 0.0)
    ix1c = jnp.clip(ix0 + 1, 0, wp - 1)
    prep = _prep_gather(ix1c, wp)
    fx0 = 1.0 - fx

    cp.wait()

    zero = jnp.zeros(gz.shape, jnp.float32)

    def z_body(j1, accs):
        s = _ldecode(meta_ref, zi, 2, j1)
        tz_f = gz - s.astype(jnp.float32)
        # fold ct into the dy-invariant per-plane factors (see the fused
        # kernel's hoisting note): the inner loop accumulates only
        # p/q/ay_p, the triple-product chains happen once per s
        ctwz = ct * _tent(tz_f)
        ctdwz = ct * jnp.where(jnp.abs(tz_f) < 1.0, -jnp.sign(tz_f), 0.0)
        ndy_s = jmeta_ref[zi, s * _JW]

        def y_body(j2, pqa):
            dy = (jax.lax.shift_right_logical(
                jmeta_ref[zi, s * _JW + 1 + j2 // 6],
                5 * (j2 % 6)) & 31) - (r + 1)
            p, q, ay_p = pqa
            k = jnp.mod(hp - (yp + dy), hp)
            rolled = pltpu.roll(slab[s].astype(jnp.float32), k, 0)[0:h]
            g1 = _gather_pre(jnp.broadcast_to(rolled, gz.shape), prep)
            g0 = _gather_pre(jnp.broadcast_to(
                pltpu.roll(rolled, 1, 1), gz.shape), prep)
            v0 = jnp.where(jnp.abs(g0 - lf) < 0.5, x_ok0f, 0.0)
            v1 = jnp.where(jnp.abs(g1 - lf) < 0.5, x_ok1f, 0.0)
            ty_f = ty - dy.astype(jnp.float32)
            y_in = (rows + dy >= 0) & (rows + dy <= h - 1)
            wy = jnp.where(y_in, _tent(ty_f), 0.0)
            dwy = jnp.where(y_in & (jnp.abs(ty_f) < 1.0),
                            -jnp.sign(ty_f), 0.0)
            xv = fx0 * v0 + fx * v1
            return p + wy * v0, q + wy * v1, ay_p + dwy * xv

        p, q, ay_p = jax.lax.fori_loop(0, ndy_s, y_body,
                                       (zero, zero, zero))
        az, ay, ax = accs
        t = fx0 * p + fx * q
        return (az + ctdwz * t, ay + ctwz * ay_p, ax + ctwz * (q - p))

    az, ay, ax = jax.lax.fori_loop(0, ns, z_body, (zero, zero, zero))
    dgz_ref[...] = az
    dgy_ref[...] = ay
    dgx_ref[...] = ax


_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _matched_fwd_call(lab_m, lab_f, gz, gy, gx, *, tz, r, interpret):
    d, h, w = lab_m.shape
    wp = _wp_for(w, r)
    hb = _ceil_to(h, 8)
    n_tiles = -(-d // tz)
    dp = n_tiles * tz
    s_planes = tz + 2 * (r + 1)
    hp_slab = hb + 2 * _ypad(r)
    labp = _pad_last(jnp.pad(lab_m, [(0, 0), (0, hb - h), (0, 0)]), wp)
    coords = [_pad_last(jnp.pad(c, [(0, dp - d), (0, hb - h), (0, 0)],
                                mode="edge"), wp) for c in (gz, gy, gx)]
    # pad target labels with -1 so pad voxels never match
    lfp = _pad_last(jnp.pad(lab_f, [(0, dp - d), (0, hb - h), (0, 0)],
                            constant_values=-1.0), wp)
    kern = functools.partial(_matched_fwd_kernel, d=d, h=hb, w=w, wp=wp,
                             tz=tz, r=r)
    meta = _tile_meta(gz, gy, tz=tz, r=r, n_tiles=n_tiles, d=d)
    jmeta = _joint_sdy_meta(gz, gy, tz=tz, r=r, n_tiles=n_tiles, d=d)
    cspec = pl.BlockSpec((tz, hb, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[cspec, cspec, cspec, cspec,
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=cspec,
        out_shape=jax.ShapeDtypeStruct((dp, hb, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s_planes, hp_slab, wp), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=_VMEM,
        interpret=interpret,
    )(*coords, lfp, labp, meta, jmeta)
    return out[:d, :h, :w]


def _matched_bwd_call(lab_m, lab_f, gz, gy, gx, ct, *, tz, r, interpret):
    d, h, w = lab_m.shape
    wp = _wp_for(w, r)
    hb = _ceil_to(h, 8)
    n_tiles = -(-d // tz)
    dp = n_tiles * tz
    s_planes = tz + 2 * (r + 1)
    hp_slab = hb + 2 * _ypad(r)
    labp = _pad_last(jnp.pad(lab_m, [(0, 0), (0, hb - h), (0, 0)]), wp)
    coords = [_pad_last(jnp.pad(c, [(0, dp - d), (0, hb - h), (0, 0)],
                                mode="edge"), wp) for c in (gz, gy, gx)]
    lfp = _pad_last(jnp.pad(lab_f, [(0, dp - d), (0, hb - h), (0, 0)],
                            constant_values=-1.0), wp)
    ctp = _pad_last(jnp.pad(ct, [(0, dp - d), (0, hb - h), (0, 0)]), wp)
    kern = functools.partial(_matched_bwd_kernel, d=d, h=hb, w=w, wp=wp,
                             tz=tz, r=r)
    meta = _tile_meta(gz, gy, tz=tz, r=r, n_tiles=n_tiles, d=d)
    jmeta = _joint_sdy_meta(gz, gy, tz=tz, r=r, n_tiles=n_tiles, d=d)
    cspec = pl.BlockSpec((tz, hb, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    dgz, dgy, dgx = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[cspec] * 5 + [pl.BlockSpec(memory_space=pl.ANY),
                                pl.BlockSpec(memory_space=pltpu.SMEM),
                                pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(cspec, cspec, cspec),
        out_shape=tuple(jax.ShapeDtypeStruct((dp, hb, wp), jnp.float32)
                        for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((s_planes, hp_slab, wp), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=_VMEM,
        interpret=interpret,
    )(*coords, lfp, ctp, labp, meta, jmeta)
    return (dgz[:d, :h, :w], dgy[:d, :h, :w], dgx[:d, :h, :w])


def _matched_fused_call(lab_m, lab_f, gz, gy, gx, *, tz, r, interpret):
    d, h, w = lab_m.shape
    wp = _wp_for(w, r)
    hb = _ceil_to(h, 8)
    n_tiles = -(-d // tz)
    dp = n_tiles * tz
    s_planes = tz + 2 * (r + 1)
    hp_slab = hb + 2 * _ypad(r)
    labp = _pad_last(jnp.pad(lab_m, [(0, 0), (0, hb - h), (0, 0)]), wp)
    coords = [_pad_last(jnp.pad(c, [(0, dp - d), (0, hb - h), (0, 0)],
                                mode="edge"), wp) for c in (gz, gy, gx)]
    lfp = _pad_last(jnp.pad(lab_f, [(0, dp - d), (0, hb - h), (0, 0)],
                            constant_values=-1.0), wp)
    kern = functools.partial(_matched_fused_kernel, d=d, h=hb, w=w, wp=wp,
                             tz=tz, r=r)
    meta = _tile_meta(gz, gy, tz=tz, r=r, n_tiles=n_tiles, d=d)
    jmeta = _joint_sdy_meta(gz, gy, tz=tz, r=r, n_tiles=n_tiles, d=d)
    cspec = pl.BlockSpec((tz, hb, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    m, dgz, dgy, dgx = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[cspec, cspec, cspec, cspec,
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(cspec, cspec, cspec, cspec),
        out_shape=tuple(jax.ShapeDtypeStruct((dp, hb, wp), jnp.float32)
                        for _ in range(4)),
        scratch_shapes=[pltpu.VMEM((s_planes, hp_slab, wp), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=_VMEM,
        interpret=interpret,
    )(*coords, lfp, labp, meta, jmeta)
    return (m[:d, :h, :w], dgz[:d, :h, :w], dgy[:d, :h, :w],
            dgx[:d, :h, :w])


# --------------------------------------------------- differentiable ops

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _matched3d(lab_m, lab_f, grid, tz, r, interpret):
    """labels (D,H,W) f32 x grid (D,H,W,3 normalized xyz) -> m (D,H,W)."""
    d, h, w = lab_m.shape
    gz, gy, gx = _vox_coords(grid, d, h, w)
    return _matched_fwd_call(lab_m, lab_f, gz, gy, gx, tz=tz, r=r,
                             interpret=interpret)


def _matched3d_fwd(lab_m, lab_f, grid, tz, r, interpret):
    return _matched3d(lab_m, lab_f, grid, tz, r, interpret), \
        (lab_m, lab_f, grid)


def _matched3d_bwd(tz, r, interpret, res, ct):
    lab_m, lab_f, grid = res
    d, h, w = lab_m.shape
    gz, gy, gx = _vox_coords(grid, d, h, w)
    dgz, dgy, dgx = _matched_bwd_call(lab_m, lab_f, gz, gy, gx,
                                      ct.astype(jnp.float32), tz=tz, r=r,
                                      interpret=interpret)
    dgrid = jnp.stack([dgx * ((w - 1) / 2.0),
                       dgy * ((h - 1) / 2.0),
                       dgz * ((d - 1) / 2.0)], axis=-1).astype(grid.dtype)
    return jnp.zeros_like(lab_m), jnp.zeros_like(lab_f), dgrid


_matched3d.defvjp(_matched3d_fwd, _matched3d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _matched3d_fused(lab_m, lab_f, grid, tz, r, interpret):
    """``_matched3d`` with a fused value+gradient forward: the joint
    (s, dy) loops run ONCE, emitting the value plane and the three
    UNSCALED derivative planes; the backward is elementwise (the anatomy
    cotangent is a per-output-voxel LUT of ``lab_f`` and factors out of
    the loops — see ``_matched_fused_kernel``).  Use on paths that WILL be
    differentiated (the joint reg step); the primal-only ``_matched3d``
    stays cheaper for value-only paths (the hard seg branch).

    The undifferentiated primal delegates to the value-only kernel — only
    the VJP forward pays the 4-output bandwidth (ADVICE r4: metric/logging
    evaluations of a fused_grad=True closure should not emit and discard
    three gradient planes)."""
    return _matched3d(lab_m, lab_f, grid, tz, r, interpret)


def _matched3d_fused_fwd(lab_m, lab_f, grid, tz, r, interpret):
    d, h, w = lab_m.shape
    gz, gy, gx = _vox_coords(grid, d, h, w)
    m, dgz, dgy, dgx = _matched_fused_call(lab_m, lab_f, gz, gy, gx, tz=tz,
                                           r=r, interpret=interpret)
    return m, (lab_m, lab_f, grid, dgz, dgy, dgx)


def _matched3d_fused_bwd(tz, r, interpret, res, ct):
    lab_m, lab_f, grid, dgz, dgy, dgx = res
    d, h, w = lab_m.shape
    ct = ct.astype(jnp.float32)
    dgrid = jnp.stack([ct * dgx * ((w - 1) / 2.0),
                       ct * dgy * ((h - 1) / 2.0),
                       ct * dgz * ((d - 1) / 2.0)],
                      axis=-1).astype(grid.dtype)
    return jnp.zeros_like(lab_m), jnp.zeros_like(lab_f), dgrid


_matched3d_fused.defvjp(_matched3d_fused_fwd, _matched3d_fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _splat_ones3d(grid, dhw, tz, r, interpret):
    """splat(ones) — the per-source-voxel total warp weight u(v')."""
    d, h, w = dhw
    gz, gy, gx = _vox_coords(grid, d, h, w)
    return pallas_splat(jnp.ones((1, d, h, w), jnp.float32), gz, gy, gx,
                        d=d, h=h, w=w, tz=max(tz // 2, 1), r=r,
                        ct_sparse=False,  # constant ct: the mass skip
                        interpret=interpret)[0]  # never fires


def _splat_ones3d_fwd(grid, dhw, tz, r, interpret):
    return _splat_ones3d(grid, dhw, tz, r, interpret), grid


def _splat_ones3d_bwd(dhw, tz, r, interpret, grid, ct):
    # d/d grid of sum_{v'} ct(v') u(v') = grid-gradient of warp(ct) with
    # unit cotangent — the existing kernel
    d, h, w = dhw
    gz, gy, gx = _vox_coords(grid, d, h, w)
    dgz, dgy, dgx = _bwd_grid_single(
        ct.astype(jnp.float32)[None], gz, gy, gx,
        jnp.ones((1, d, h, w), jnp.float32), tz=tz, r=r,
        interpret=interpret)
    dgrid = jnp.stack([dgx * ((w - 1) / 2.0),
                       dgy * ((h - 1) / 2.0),
                       dgz * ((d - 1) / 2.0)], axis=-1).astype(grid.dtype)
    return (dgrid,)


_splat_ones3d.defvjp(_splat_ones3d_fwd, _splat_ones3d_bwd)


def binned_sum(values: jnp.ndarray, labels: jnp.ndarray, n_class: int,
               chunk: int = 1 << 19) -> jnp.ndarray:
    """sum of ``values`` bucketed by ``labels`` — (n_class,) f32.

    A scanned one-hot matmul: differentiable w.r.t. values (the backward is
    a per-voxel table lookup), never materializing the full one-hot volume.
    """
    v = values.reshape(-1).astype(jnp.float32)
    l = labels.reshape(-1)
    n = v.shape[0]
    pad = (-n) % chunk
    if pad:
        v = jnp.pad(v, (0, pad))
        l = jnp.pad(l, (0, pad))
    v = v.reshape(-1, chunk)
    l = l.reshape(-1, chunk)

    def body(acc, vl):
        vi, li = vl
        oh = jax.nn.one_hot(li, n_class, dtype=jnp.float32)
        return acc + jnp.dot(vi, oh, preferred_element_type=jnp.float32), None

    acc, _ = lax.scan(body, jnp.zeros((n_class,), jnp.float32), (v, l))
    return acc


def hard_anatomy_dice(lab_m: jnp.ndarray, lab_f: jnp.ndarray,
                      deform: jnp.ndarray, n_class: int, *,
                      max_disp: int = 8, z_tile: int = 8, eps: float = 1e-5,
                      require_kernel: bool = False,
                      fused_grad: bool = False,
                      interpret: bool | None = None) -> jnp.ndarray:
    """Exactly ``soft_dice_on_probs(grid_sample(one_hot(lab_m), deform),
    lab_f, n_class)`` for HARD moving labels, at C=1 kernel cost.

    Args:
      lab_m, lab_f: ``(B, D, H, W)`` integer masks.
      deform: ``(B, D, H, W, 3)`` normalized (x, y, z) deformation; clamped
        to ±``max_disp`` voxels (the Pallas warp guard).
      fused_grad: compute the matched-warp's grid-gradient planes IN the
        forward pass (one joint-loop sweep instead of two; the backward
        becomes elementwise).  Set True on paths that take grad(deform) —
        the joint reg step; leave False for value-only uses.

    Differentiable w.r.t. ``deform`` only (labels are hard).
    """
    if interpret is None:
        interpret = _default_interpret()
    from .warp import MAX_PACKED_DISP
    if max_disp > MAX_PACKED_DISP:
        # auto-route past the packed bound to the dense XLA composition
        # (clamped at the requested wider bound — exact for |disp| within
        # it); ADVICE r4: raising here broke shallow-volume configs that
        # previously worked via the fallback
        if require_kernel:
            raise ValueError(
                f"max_disp={max_disp} exceeds the packed offset-list bound "
                f"(MAX_PACKED_DISP={MAX_PACKED_DISP}) and "
                f"require_kernel=True forbids the fallback")
        from ..losses import soft_dice_on_probs
        from ..ops import grid_sample, one_hot
        deform = clamp_displacement(deform, max_disp)
        warped = grid_sample(one_hot(lab_m.astype(jnp.int32), n_class,
                                     dtype=jnp.float32), deform,
                             mode="trilinear")
        return soft_dice_on_probs(warped, lab_f.astype(jnp.int32), n_class)
    b, d, h, w = lab_m.shape
    if d < z_tile + 2 * (max_disp + 1):
        # shrink the z-tile to fit shallow volumes (same as
        # pallas_grid_sample); only depths with no room beside the tent
        # margins fall back to the dense XLA composition
        if d - 2 * (max_disp + 1) >= 1:
            z_tile = d - 2 * (max_disp + 1)
        else:
            if require_kernel:
                raise ValueError(
                    f"hard_anatomy_dice kernel path requires depth "
                    f"> {2 * (max_disp + 1)} at max_disp={max_disp}; got "
                    f"d={d} (require_kernel=True forbids the fallback)")
            from ..losses import soft_dice_on_probs
            from ..ops import grid_sample, one_hot
            warped = grid_sample(one_hot(lab_m.astype(jnp.int32), n_class,
                                         dtype=jnp.float32), deform,
                                 mode="trilinear")
            return soft_dice_on_probs(warped, lab_f.astype(jnp.int32),
                                      n_class)
    deform = clamp_displacement(deform, max_disp)
    matched = _matched3d_fused if fused_grad else _matched3d
    inters, denms, denfs = [], [], []
    for bi in range(b):
        lm = lab_m[bi].astype(jnp.float32)
        lf = lab_f[bi].astype(jnp.float32)
        m = matched(lm, lf, deform[bi], z_tile, max_disp, interpret)
        u = _splat_ones3d(deform[bi], (d, h, w), z_tile, max_disp, interpret)
        inters.append(binned_sum(m, lab_f[bi].astype(jnp.int32), n_class))
        denms.append(binned_sum(u, lab_m[bi].astype(jnp.int32), n_class))
        denfs.append(binned_sum(jnp.ones((d, h, w), jnp.float32),
                                lab_f[bi].astype(jnp.int32), n_class))
    inter = jnp.stack(inters)[:, 1:]
    denom = jnp.stack(denms)[:, 1:] + jnp.stack(denfs)[:, 1:]
    scores = 2.0 * inter / (denom + eps)
    return 1.0 - jnp.mean(scores)
