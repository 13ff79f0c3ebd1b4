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

from .warp import (LANE, _DW, _JW, _ceil_to, _floor_presence, _ldecode,
                   _pack_list, _pad_last, _tent)


def _plane_meta(gz, gy, gx, *, d: int, h: int, w: int, r: int):
    """Packed-list SMEM tables for the splat kernel, computed on the
    UNPADDED coordinate fields (in-kernel min/max ranges see zero pad lanes
    that blow them to the full static bound — the dx range was always the
    worst case before this).

    Returns ``(plane, src)``:
      * ``plane`` (d, 3 + 2 * _DW) int32 per receiver plane q:
        ``[ndy, ndx, dy-list words, dx-list words, jtot]`` — the ascending
        packed lists (warp.py::_pack_list, 5-bit entries) of row/column
        offsets ``dv + r + 1`` some voxel of plane q needs with nonzero
        tent mass, plus ``jtot``, the plane's TOTAL joint (dy, dx) trip
        count (sum over dy of the joint dx-list lengths) — the kernel's
        static-sweep gate compares it against the full sweep's
        ``ndy * nb`` (gating on the marginal ``ndx`` regressed typical
        fields: outlier voxels fill the marginal list while every dy
        band's joint support stays thin, round-4 VERDICT next #4).
      * ``src`` (d, 1 + _DW) int32 per source plane s: ``[nq, o-list
        words]`` — packed z-offsets ``o = s - q + r + 1`` of the receiver
        planes q with any z-tent mass toward s.
      * ``jdx`` (d, nb * _JW) int32 per receiver plane q: for each row
        offset dy, the joint ``[ndx, dx-list words]`` at stride _JW
        (2-D on purpose — see the reshape note below).
    The kernel loops exactly these lists — zero-mass offsets cost nothing,
    not even a branch.
    """
    nb = 2 * r + 3
    planes = jnp.arange(d, dtype=jnp.float32)[:, None, None]
    rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    po = _floor_presence(gz - planes, -(r + 1), nb, axes=(1, 2))
    pdy = _floor_presence(rows - gy, -(r + 1), nb, axes=(1, 2))
    pdx = _floor_presence(cols - gx, -(r + 1), nb, axes=(1, 2))
    ndy, dyw = _pack_list(pdy, _DW)
    ndx, dxw = _pack_list(pdx, _DW)

    # receivers of source plane s: q = s - o with po[q] o-presence set
    s_arr = jnp.arange(d, dtype=jnp.int32)[:, None]
    o_arr = jnp.arange(nb, dtype=jnp.int32)[None, :] - (r + 1)
    qq = s_arr - o_arr
    ok = (qq >= 0) & (qq < d)
    hit = po[jnp.clip(qq, 0, d - 1), jnp.arange(nb)[None, :]] & ok
    nq, ow = _pack_list(hit, _DW)
    src = jnp.concatenate([nq[:, None], ow], axis=1).astype(jnp.int32)

    # per-(q, dy) JOINT dx lists: the saturated regime's per-plane marginal
    # dx list is full (the clamp transition band sweeps every offset), but
    # the voxels at a given dy form a thin band whose dx support is small —
    # the kernel's inner loop iterates exactly these (warp.py
    # _joint_sdy_meta rationale; census in tools/census_offsets.py).  One
    # small matmul per plane — scanned over planes so only one plane's
    # (nb, N) hit masks are live at a time.
    offs = jnp.arange(-(r + 1), r + 2, dtype=jnp.float32)[:, None]

    def plane_joint(carry, qmats):
        tyq, txq = qmats                                 # (h*w,) each
        yh = (jnp.abs(tyq[None, :] - offs) < 1.0).astype(jnp.float32)
        xh = (jnp.abs(txq[None, :] - offs) < 1.0).astype(jnp.float32)
        joint = jax.lax.dot(yh, xh.T,
                            preferred_element_type=jnp.float32) > 0.0
        jcnt, jwords = _pack_list(joint, _DW)
        row = jnp.concatenate([jcnt[:, None], jwords],
                              axis=1).astype(jnp.int32)
        return carry, (row, jnp.sum(jcnt).astype(jnp.int32))

    _, (jdx, jtot) = jax.lax.scan(
        plane_joint, 0,
        ((rows - gy).reshape(d, -1), (cols - gx).reshape(d, -1)))
    plane = jnp.concatenate([ndy[:, None], ndx[:, None], dyw, dxw,
                             jtot[:, None]], axis=1).astype(jnp.int32)
    # flatten to (d, nb * _JW): Mosaic tiles an SMEM window's trailing two
    # dims to (8, 128), so the 3-D (d, nb, words) layout would pad
    # words->128 (2 MiB at d=168) past the 1 MiB SMEM budget
    return plane, src, jdx.reshape(d, -1)


def _splat_kernel(gz_ref, gy_ref, gx_ref, ct_ref, pres_ref, meta_ref,
                  smeta_ref, jdx_ref, dvol_ref,
                  gz_s, gy_s, gx_s, ct_s, rtent_s, sem, *, d, h, w, wp, tz,
                  r, ct_sparse):
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
                    jdx_ref, dvol_ref, d=d, h=h, w=w, wp=wp, tz=tz, r=r,
                    t0=t0, o0=o0, ct_sparse=ct_sparse)


def _splat_work(gz_s, gy_s, gx_s, ct_s, rtent_s, meta_ref, smeta_ref,
                jdx_ref, dvol_ref, *, d, h, w, wp, tz, r, t0, o0,
                ct_sparse):
    x_pad_lands = (wp - w) >= (r + 1)
    s_out = tz + 2 * (r + 1)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (h, wp), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (h, wp), 1)

    # all loops iterate the packed offset lists of the precomputed SMEM
    # tables (_plane_meta): per receiver plane the lists are far tighter
    # than the slab's ranges (smooth fields) and skip the mass holes inside
    # the range (saturated bimodal fields), with no per-trip branch and no
    # in-kernel vector reductions
    for sl in range(tz):
        s_global = t0 + sl
        sf = s_global.astype(jnp.float32)
        nq = smeta_ref[s_global, 0]

        def k_body(j0, acc):
            # receiver plane q = s - o from the packed o-list
            o = _ldecode(smeta_ref, s_global, 1, j0) - (r + 1)
            q = s_global - o
            k = q - o0
            gzk = gz_s[k]
            wz = _tent(gzk - sf)
            f0 = ct_s[k].astype(jnp.float32) * wz
            if x_pad_lands:
                f0 = jnp.where(cols2 <= w - 1, f0, 0.0)
            tyk = gy_s[k] - rows2.astype(jnp.float32)
            txk = gx_s[k] - cols2.astype(jnp.float32)
            ndy = meta_ref[q, 0]
            ndx = meta_ref[q, 1]
            nb = 2 * r + 3

            def finish_dy(acc, acc_x, dy):
                # one row roll per dy (the row shift commutes with the
                # lane work — saves dx_range-1 rolls per dy)
                g2 = pltpu.roll(acc_x, jnp.mod(-dy, h), 0)
                rows_sh = rows2 + dy
                y_ok = (rows_sh >= 0) & (rows_sh <= h - 1)
                return acc + jnp.where(y_ok, g2, 0.0)

            def gated(fy, dy_work, acc):
                # ct-aware joint mass check: the packed lists are MARGINAL
                # (z x y product overshoots), and for one-hot cotangents
                # the joint mass with ct is far sparser still — one
                # reduction here skips the dx sweep.  For DENSE/constant
                # cotangents (soft-path probs, splat(ones)) the check
                # never fires and its full-plane reduction is pure per-dy
                # overhead — the caller disables it with ct_sparse=False.
                if not ct_sparse:
                    return dy_work(acc)
                return jax.lax.cond(jnp.max(jnp.abs(fy)) > 0.0, dy_work,
                                    lambda a: a, acc)

            def list_branch(acc):
                # hoist the per-dx work that is invariant across dy: the
                # x-tent, its -dx lane roll, and the target-column validity
                # mask, staged once per receiver plane k into rtent_s (rolls
                # commute with elementwise products, so roll(fy*tent, -dx) =
                # roll(fy, -dx) * rtent[dx]) — the (dy, dx) inner loop
                # becomes roll + multiply-add
                def fill_dx(j, _):
                    dx = _ldecode(meta_ref, q, 2 + _DW, j) - (r + 1)
                    t = _tent(txk + dx.astype(jnp.float32))
                    g = pltpu.roll(t, jnp.mod(-dx, wp), 1)
                    if not x_pad_lands:
                        # lane j of the rolled plane reads receiver column
                        # j + dx — mask those outside [0, w)
                        cols_sh = cols2 + dx
                        x_ok = (cols_sh >= 0) & (cols_sh <= w - 1)
                        g = jnp.where(x_ok, g, 0.0)
                    rtent_s[dx + r + 1] = g
                    return 0

                jax.lax.fori_loop(0, ndx, fill_dx, 0)

                def dy_body(j, acc):
                    dy = _ldecode(meta_ref, q, 2, j) - (r + 1)
                    fy = f0 * _tent(tyk + dy.astype(jnp.float32))
                    # the dx loop iterates the per-(q, dy) JOINT list
                    # (_plane_meta jdx): the marginal list may overshoot
                    # a given dy-band's thin dx support
                    dyi = dy + (r + 1)
                    ndx_j = jdx_ref[q, dyi * _JW]

                    def dy_work(acc):
                        def dx_body(j2, acc_x):
                            dx = (jax.lax.shift_right_logical(
                                jdx_ref[q, dyi * _JW + 1 + j2 // 6],
                                5 * (j2 % 6)) & 31) - (r + 1)
                            g = pltpu.roll(fy, jnp.mod(-dx, wp), 1)
                            return acc_x + g * rtent_s[dx + r + 1]

                        acc_x = jax.lax.fori_loop(
                            0, ndx_j, dx_body,
                            jnp.zeros((h, wp), jnp.float32))
                        return finish_dy(acc, acc_x, dy)

                    return gated(fy, dy_work, acc)

                return jax.lax.fori_loop(0, ndy, dy_body, acc)

            def full_branch(acc):
                # static-sweep fast path for near-full dx lists: the
                # saturated regime's clamp-transition band sweeps the
                # whole dx range (CENSUS_r04: joint ~ marginal ~ full
                # there), so the dynamic-offset machinery buys nothing
                # while its per-trip dynamic lane rotates + dynamic
                # scratch reads dominate the cost.  Here every shift and
                # scratch index is a compile-time constant and the dx
                # sweep advances by incremental roll-by-1 (rolls compose:
                # roll(fy, -(dx+1)) = roll(roll(fy, -dx), -1)).
                for dxi in range(nb):
                    dxc = dxi - (r + 1)
                    t = _tent(txk + float(dxc))
                    g = pltpu.roll(t, (-dxc) % wp, 1)
                    if not x_pad_lands:
                        x_ok = (cols2 + dxc >= 0) & (cols2 + dxc <= w - 1)
                        g = jnp.where(x_ok, g, 0.0)
                    rtent_s[dxi] = g

                def dy_body(j, acc):
                    dy = _ldecode(meta_ref, q, 2, j) - (r + 1)
                    fy = f0 * _tent(tyk + dy.astype(jnp.float32))

                    def dy_work(acc):
                        g = pltpu.roll(fy, (r + 1) % wp, 1)
                        acc_x = g * rtent_s[0]
                        for dxi in range(1, nb):
                            g = pltpu.roll(g, wp - 1, 1)
                            acc_x = acc_x + g * rtent_s[dxi]
                        return finish_dy(acc, acc_x, dy)

                    return gated(fy, dy_work, acc)

                return jax.lax.fori_loop(0, ndy, dy_body, acc)

            # branch on the plane's TOTAL joint trip count vs the static
            # sweep's ndy * nb: a static full sweep costs ndy * nb cheap
            # trips (const shifts/indices), the list path jtot expensive
            # ones (dynamic rolls + scratch reads + 5-bit decodes).  The
            # earlier marginal-ndx gate mis-fired on typical fields whose
            # outlier voxels fill the marginal dx list while the joint
            # bands stay thin (none|typical 3.07 -> 4.57 s/iter, round-4
            # VERDICT next #4) — the joint total is the actual list-path
            # trip count, so saturated transition bands (jtot ~ ndy * nb)
            # still take the sweep and smooth planes never do
            jtot = meta_ref[q, 2 + 2 * _DW]
            return jax.lax.cond(3 * jtot >= 2 * ndy * nb, full_branch,
                                list_branch, acc)

        acc = jax.lax.fori_loop(0, nq, k_body,
                                jnp.zeros((h, wp), jnp.float32))
        dvol_ref[0, sl] = acc.astype(dvol_ref.dtype)


def pallas_splat(ct: jnp.ndarray, gz, gy, gx, *, d: int, h: int, w: int,
                 tz: int = 4, r: int = 8, ct_sparse: bool = True,
                 interpret: bool = False) -> jnp.ndarray:
    """ct (C, D, H, W) cotangents + voxel coords (D, H, W) -> dvol (C,D,H,W).

    The adjoint of _fwd_single for displacements bounded by ``r`` voxels
    (all axes — x included, unlike the forward, whose x-gather is exact).

    ``ct_sparse=False`` drops the per-dy cotangent-mass skip (a full-plane
    reduction + cond per trip) — pass it when ``ct`` is dense or constant
    (soft-path probability cotangents, splat(ones)), keep the default for
    one-hot/blocky cotangents (the f-hard adjoint splat).  Results are
    identical either way.
    """
    from .warp import MAX_PACKED_DISP
    if r > MAX_PACKED_DISP:
        raise ValueError(
            f"r={r} exceeds the packed offset-list bound "
            f"(MAX_PACKED_DISP={MAX_PACKED_DISP}); use the XLA warp VJP "
            f"for wider displacement bounds")
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
                             r=r, ct_sparse=ct_sparse)
    pres = _channel_presence(ct, tz, r, n_tiles, d)
    meta, smeta, jdx = _plane_meta(gz, gy, gx, d=d, h=h, w=w, r=r)
    out = pl.pallas_call(
        kern,
        grid=(n_tiles, nc),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 4,
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
    )(*coords, ctp, pres, meta, smeta, jdx)
    return out[:, :d, :h, :w]
