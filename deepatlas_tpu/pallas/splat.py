"""Pallas TPU kernel: trilinear splat (the adjoint of the warp).

``splat(ct, grid)[q] = sum_p w(p, q) * ct(p)`` where ``w`` are the trilinear
weights of sampling position ``grid(p)`` — exactly the gradient of
``grid_sample`` w.r.t. the source volume.  XLA lowers this to a generic
scatter-add that runs ~1 s at MB101 size for one channel; this kernel
reformulates it with the same tent-algebra as pallas/warp.py, transposed:

  for every *source* z-tile, DMA the coordinate fields and cotangents of the
  output planes that can reach it (|disp| <= max_disp), then accumulate
  ``ct(p) * tent(gz(p)-s) * tent(tyf(p)+dy) * tent(txf(p)+dx)`` shifted by
  (-dy, -dx) (cyclic rolls + validity masks), over the adaptive offset
  ranges the actual field needs.

Equivalence with the XLA adjoint is asserted in tests/test_pallas_warp.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import LANE, _ceil_to, _pad_last, _range_from, _tent


def _splat_kernel(gz_ref, gy_ref, gx_ref, ct_ref, dvol_ref,
                  gz_s, gy_s, gx_s, ct_s, rtent_s, sem, *, d, h, w, wp, tz,
                  r):
    # when the lane padding is at least the displacement bound, x-shifted
    # contributions whose target falls outside [0, w) land in (and wrap
    # into) the pad columns, which the caller slices away — the per-(dy,dx)
    # x-validity mask disappears from the inner loop (receivers *in* the
    # pad are pre-zeroed once per plane instead)
    x_pad_lands = (wp - w) >= (r + 1)
    s_out = tz + 2 * (r + 1)      # output planes that can reach this tile
    zi = pl.program_id(0)
    ci = pl.program_id(1)
    t0 = zi * tz
    o0 = jnp.clip(t0 - (r + 1), 0, jnp.maximum(d - s_out, 0))

    cps = [pltpu.make_async_copy(ref.at[pl.ds(o0, s_out), :, :], scr,
                                 sem.at[k])
           for k, (ref, scr) in enumerate(
               [(gz_ref, gz_s), (gy_ref, gy_s), (gx_ref, gx_s)])]
    cps.append(pltpu.make_async_copy(
        ct_ref.at[ci, pl.ds(o0, s_out), :, :], ct_s, sem.at[3]))
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    rows2 = jax.lax.broadcasted_iota(jnp.int32, (h, wp), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (h, wp), 1)
    planes = jax.lax.broadcasted_iota(
        jnp.int32, (s_out, h, wp), 0).astype(jnp.float32)

    # global scalar z bounds (Mosaic cannot dynamically index materialized
    # vectors, so all per-plane selection below reads the *refs* at a traced
    # plane index); the y/x offset ranges adapt PER RECEIVER PLANE inside
    # k_body — a registration field is spatially smooth, so one plane's
    # offset spread is far tighter than the whole 2(r+1)+tz-plane slab's
    # (the difference between O(spread^2) and O((2r)^2) inner iterations
    # for large-but-smooth fields)
    gz_all = gz_s[...]
    zoff = gz_all - (planes + o0.astype(jnp.float32))   # z-displacements
    zoff_min = jnp.min(zoff)
    zoff_max = jnp.max(zoff)

    for sl in range(tz):
        s_global = t0 + sl
        sf = s_global.astype(jnp.float32)
        # output planes k (slab-local) that can reach source plane s_global:
        # gz(k) = o0 + k + zoff in (s-1, s+1)
        k_lo = jnp.clip(s_global - o0
                        - jnp.ceil(zoff_max).astype(jnp.int32) - 1,
                        0, s_out - 1)
        k_hi = jnp.clip(s_global - o0
                        - jnp.floor(zoff_min).astype(jnp.int32) + 1,
                        0, s_out - 1)

        def k_body(k, acc):
            gzk = gz_s[k]
            wz = _tent(gzk - sf)

            # a receiver plane whose whole z-tent misses this source plane
            # costs one reduction, not the dy x dx loops (the k-range is a
            # slab-global bound; per-plane mass is usually concentrated)
            def k_work(acc):
                f0 = ct_s[k].astype(jnp.float32) * wz
                if x_pad_lands:
                    f0 = jnp.where(cols2 <= w - 1, f0, 0.0)
                tyk = gy_s[k] - rows2.astype(jnp.float32)
                txk = gx_s[k] - cols2.astype(jnp.float32)
                dy_lo, dy_hi = _range_from(jnp.min(-tyk) - 1.0,
                                           jnp.max(-tyk) + 1.0, -(r + 1),
                                           r + 1)
                dx_lo, dx_hi = _range_from(jnp.min(-txk) - 1.0,
                                           jnp.max(-txk) + 1.0, -(r + 1),
                                           r + 1)

                # hoist the per-dx work that is invariant across dy: the
                # x-tent, its -dx lane roll, and the target-column validity
                # mask, staged once per receiver plane k into rtent_s
                # (rolls commute with elementwise products, so
                # roll(fy*tent, -dx) = roll(fy, -dx) * rtent[dx]) — the
                # (dy, dx) inner loop becomes roll + multiply-add
                def fill_dx(dx, _):
                    t = _tent(txk + dx.astype(jnp.float32))
                    g = pltpu.roll(t, jnp.mod(-dx, wp), 1)
                    if not x_pad_lands:
                        # lane j of the rolled plane reads receiver column
                        # j + dx — mask the ones falling outside [0, w)
                        cols_sh = cols2 + dx
                        x_ok = (cols_sh >= 0) & (cols_sh <= w - 1)
                        g = jnp.where(x_ok, g, 0.0)
                    rtent_s[dx + r + 1] = g
                    return 0

                jax.lax.fori_loop(dx_lo, dx_hi + 1, fill_dx, 0)

                def dy_body(dy, acc):
                    fy = f0 * _tent(tyk + dy.astype(jnp.float32))

                    def dy_work(acc):
                        # accumulate the x-offsets unshifted in y, then one
                        # row roll per dy (the row shift commutes with the
                        # lane work — saves dx_range-1 rolls per dy)
                        def dx_body(dx, acc_x):
                            g = pltpu.roll(fy, jnp.mod(-dx, wp), 1)
                            return acc_x + g * rtent_s[dx + r + 1]

                        acc_x = jax.lax.fori_loop(
                            dx_lo, dx_hi + 1, dx_body,
                            jnp.zeros((h, wp), jnp.float32))
                        g2 = pltpu.roll(acc_x, jnp.mod(-dy, h), 0)
                        rows_sh = rows2 + dy
                        y_ok = (rows_sh >= 0) & (rows_sh <= h - 1)
                        return acc + jnp.where(y_ok, g2, 0.0)

                    return jax.lax.cond(jnp.max(jnp.abs(fy)) > 0.0, dy_work,
                                        lambda a: a, acc)

                return jax.lax.fori_loop(dy_lo, dy_hi + 1, dy_body, acc)

            return jax.lax.cond(jnp.max(wz) > 0.0, k_work, lambda a: a, acc)

        acc = jax.lax.fori_loop(k_lo, k_hi + 1, k_body,
                                jnp.zeros((h, wp), jnp.float32))
        dvol_ref[0, sl] = acc.astype(dvol_ref.dtype)


def pallas_splat(ct: jnp.ndarray, gz, gy, gx, *, d: int, h: int, w: int,
                 tz: int = 4, r: int = 8,
                 interpret: bool = False) -> jnp.ndarray:
    """ct (C, D, H, W) cotangents + voxel coords (D, H, W) -> dvol (C,D,H,W).

    The adjoint of _fwd_single for displacements bounded by ``r`` voxels
    (all axes — x included, unlike the forward, whose x-gather is exact).
    """
    nc = ct.shape[0]
    wp = _ceil_to(w, LANE)
    hb = _ceil_to(h, 8)
    n_tiles = -(-d // tz)
    dp = n_tiles * tz
    s_out = tz + 2 * (r + 1)
    if d < s_out:
        raise ValueError(f"volume depth {d} < slab {s_out}")

    ctp = _pad_last(jnp.pad(ct, [(0, 0), (0, 0), (0, hb - h), (0, 0)]), wp)
    coords = [_pad_last(jnp.pad(c, [(0, 0), (0, hb - h), (0, 0)],
                                mode="edge"), wp) for c in (gz, gy, gx)]

    kern = functools.partial(_splat_kernel, d=d, h=hb, w=w, wp=wp, tz=tz,
                             r=r)
    out = pl.pallas_call(
        kern,
        grid=(n_tiles, nc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec((1, tz, hb, wp), lambda i, c: (c, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc, dp, hb, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s_out, hb, wp), jnp.float32)] * 3
        + [pltpu.VMEM((s_out, hb, wp), ct.dtype),
           pltpu.VMEM((2 * r + 3, hb, wp), jnp.float32),
           pltpu.SemaphoreType.DMA((4,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*coords, ctp)
    return out[:, :d, :h, :w]
