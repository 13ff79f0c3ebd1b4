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

from .warp import (LANE, _bit, _ceil_to, _floor_presence, _mask_bounds,
                   _pack_bits, _pad_last, _tent)  # noqa: F401


def _plane_meta(gz, gy, gx, *, d: int, h: int, w: int, r: int):
    """Per-receiver-plane SMEM tables for the splat kernel, computed on the
    UNPADDED coordinate fields (in-kernel min/max ranges see zero pad lanes
    that blow them to the full static bound — the dx range was always the
    worst case before this).

    Returns ``(plane, src)``:
      * ``plane`` (d, 8) int32 per receiver plane q:
        ``[mask_o, mask_dy, mask_dx, dy_lo, dy_hi, dx_lo, dx_hi, 0]`` —
        bit ``o + r + 1`` of mask_o: some voxel of plane q samples source
        plane ``q + o`` with nonzero z-tent; bit ``dv + r + 1`` of
        mask_dy/mask_dx: some voxel needs row/column offset ``dv``; the
        lo/hi are the masks' set-bit bounds (the kernel's loop ranges).
      * ``src`` (d, 2) int32 per source plane s: ``[q_lo, q_hi]`` — the
        receiver-plane span with any z-tent mass toward s (empty: (1, 0)).
    """
    nb = 2 * r + 3
    planes = jnp.arange(d, dtype=jnp.float32)[:, None, None]
    rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    po = _floor_presence(gz - planes, -(r + 1), nb, axes=(1, 2))
    pdy = _floor_presence(rows - gy, -(r + 1), nb, axes=(1, 2))
    pdx = _floor_presence(cols - gx, -(r + 1), nb, axes=(1, 2))
    dy_lo, dy_hi = _mask_bounds(pdy)
    dx_lo, dx_hi = _mask_bounds(pdx)
    zero = jnp.zeros((d,), jnp.int32)
    plane = jnp.stack([
        _pack_bits(po), _pack_bits(pdy), _pack_bits(pdx),
        dy_lo - (r + 1), dy_hi - (r + 1), dx_lo - (r + 1),
        dx_hi - (r + 1), zero], axis=1).astype(jnp.int32)

    # receivers of source plane s: q = s - o with bit (o + r + 1) set
    s_arr = jnp.arange(d, dtype=jnp.int32)[:, None]
    o_arr = jnp.arange(nb, dtype=jnp.int32)[None, :] - (r + 1)
    qq = s_arr - o_arr
    ok = (qq >= 0) & (qq < d)
    hit = po[jnp.clip(qq, 0, d - 1), jnp.arange(nb)[None, :]] & ok
    anyq = jnp.any(hit, axis=1)
    q_lo = jnp.min(jnp.where(hit, qq, d), axis=1)
    q_hi = jnp.max(jnp.where(hit, qq, -1), axis=1)
    src = jnp.stack([jnp.where(anyq, q_lo, 1),
                     jnp.where(anyq, q_hi, 0)], axis=1).astype(jnp.int32)
    return plane, src


def _splat_kernel(gz_ref, gy_ref, gx_ref, ct_ref, pres_ref, meta_ref,
                  smeta_ref, dvol_ref,
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

    # empty-cotangent skip: channels with no mass in the reachable output
    # window contribute nothing (linear op) — one-hot splats (f-hard branch
    # of the label-structured joint seg phase) only pay for the classes
    # present near this tile; dense cotangents always take the work branch
    # at the cost of one SMEM scalar read
    @pl.when(pres_ref[ci, zi] == 0)
    def _zero():
        dvol_ref[...] = jnp.zeros(dvol_ref.shape, dvol_ref.dtype)

    @pl.when(pres_ref[ci, zi] != 0)
    def _work():
        _splat_work(gz_s, gy_s, gx_s, ct_s, rtent_s, meta_ref, smeta_ref,
                    dvol_ref, d=d, h=h, w=w, wp=wp, tz=tz, r=r, t0=t0,
                    o0=o0)


def _splat_work(gz_s, gy_s, gx_s, ct_s, rtent_s, meta_ref, smeta_ref,
                dvol_ref, *, d, h, w, wp, tz, r, t0, o0):
    x_pad_lands = (wp - w) >= (r + 1)
    s_out = tz + 2 * (r + 1)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (h, wp), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (h, wp), 1)

    # all loop ranges and per-offset presence come from the precomputed
    # SMEM tables (_plane_meta): per receiver plane the offset spreads are
    # far tighter than the slab's (smooth fields), per-offset bits skip the
    # mass holes inside the range (saturated bimodal fields), and none of
    # it costs vector reductions in here — one scalar read per test
    for sl in range(tz):
        s_global = t0 + sl
        sf = s_global.astype(jnp.float32)
        k_lo = jnp.clip(smeta_ref[s_global, 0] - o0, 0, s_out - 1)
        k_hi = jnp.clip(smeta_ref[s_global, 1] - o0, 0, s_out - 1)

        def k_body(k, acc):
            q = o0 + k

            def k_work(acc):
                gzk = gz_s[k]
                wz = _tent(gzk - sf)
                f0 = ct_s[k].astype(jnp.float32) * wz
                if x_pad_lands:
                    f0 = jnp.where(cols2 <= w - 1, f0, 0.0)
                tyk = gy_s[k] - rows2.astype(jnp.float32)
                txk = gx_s[k] - cols2.astype(jnp.float32)
                mdy = meta_ref[q, 1]
                mdx = meta_ref[q, 2]
                dy_lo, dy_hi = meta_ref[q, 3], meta_ref[q, 4]
                dx_lo, dx_hi = meta_ref[q, 5], meta_ref[q, 6]

                # hoist the per-dx work that is invariant across dy: the
                # x-tent, its -dx lane roll, and the target-column validity
                # mask, staged once per receiver plane k into rtent_s
                # (rolls commute with elementwise products, so
                # roll(fy*tent, -dx) = roll(fy, -dx) * rtent[dx]) — the
                # (dy, dx) inner loop becomes roll + multiply-add
                def fill_dx(dx, _):
                    def dx_fill(_):
                        t = _tent(txk + dx.astype(jnp.float32))
                        g = pltpu.roll(t, jnp.mod(-dx, wp), 1)
                        if not x_pad_lands:
                            # lane j of the rolled plane reads receiver
                            # column j + dx — mask those outside [0, w)
                            cols_sh = cols2 + dx
                            x_ok = (cols_sh >= 0) & (cols_sh <= w - 1)
                            g = jnp.where(x_ok, g, 0.0)
                        rtent_s[dx + r + 1] = g
                        return 0

                    return jax.lax.cond(_bit(mdx, dx + r + 1) != 0,
                                        dx_fill, lambda _: 0, 0)

                jax.lax.fori_loop(dx_lo, dx_hi + 1, fill_dx, 0)

                def dy_body(dy, acc):
                    def dy_work(acc):
                        fy = f0 * _tent(tyk + dy.astype(jnp.float32))

                        # accumulate the x-offsets unshifted in y, then one
                        # row roll per dy (the row shift commutes with the
                        # lane work — saves dx_range-1 rolls per dy)
                        def dx_body(dx, acc_x):
                            def dx_work(acc_x):
                                g = pltpu.roll(fy, jnp.mod(-dx, wp), 1)
                                return acc_x + g * rtent_s[dx + r + 1]

                            return jax.lax.cond(_bit(mdx, dx + r + 1) != 0,
                                                dx_work, lambda a: a, acc_x)

                        acc_x = jax.lax.fori_loop(
                            dx_lo, dx_hi + 1, dx_body,
                            jnp.zeros((h, wp), jnp.float32))
                        g2 = pltpu.roll(acc_x, jnp.mod(-dy, h), 0)
                        rows_sh = rows2 + dy
                        y_ok = (rows_sh >= 0) & (rows_sh <= h - 1)
                        return acc + jnp.where(y_ok, g2, 0.0)

                    return jax.lax.cond(_bit(mdy, dy + r + 1) != 0, dy_work,
                                        lambda a: a, acc)

                return jax.lax.fori_loop(dy_lo, dy_hi + 1, dy_body, acc)

            o_bit = s_global - q + (r + 1)
            return jax.lax.cond(_bit(meta_ref[q, 0], o_bit) != 0, k_work,
                                lambda a: a, acc)

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

    from .warp import _channel_presence

    kern = functools.partial(_splat_kernel, d=d, h=hb, w=w, wp=wp, tz=tz,
                             r=r)
    pres = _channel_presence(ct, tz, r, n_tiles, d)
    meta, smeta = _plane_meta(gz, gy, gx, d=d, h=h, w=w, r=r)
    out = pl.pallas_call(
        kern,
        grid=(n_tiles, nc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
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
    )(*coords, ctp, pres, meta, smeta)
    return out[:, :d, :h, :w]
