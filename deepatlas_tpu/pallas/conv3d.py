"""Pallas TPU kernels: packed-layout 3-D convolution for small channel counts.

Why this exists.  The reference U-Nets (lib/network_factory/unets.py:70-280)
run 3x3x3 convolutions with 8-64 channels at full volume resolution.  XLA's
TPU convolution at those shapes places the channel axis on the 128-wide lane
dimension, padding every full-resolution temporary 8-64x (measured: the
168x200x168 seg train step holds 13.2 GiB of HLO temps of which ~80% is
layout padding, and a single bf16 16->16 conv runs 17.9 ms ~ 40x off the
HBM roofline).  The joint DeepAtlas seg phase OOMs purely from this padding.

The fix is a layout XLA cannot pick: channels are *packed into the lane
axis together with W* — activations live as ``(D, H, W*C)`` arrays whose
minor dimension is a multiple of 128, so they tile HBM/VMEM with no padding
at any C.  The convolution itself becomes dense MXU work:

  * reshape a plane ``(H, G*K) -> (H*G, K)`` (a pure lane-tile split, free in
    Mosaic) where ``K = w_blk * C_in`` and ``w_blk = 128/C_in`` aligned
    w-positions share one K-tile;
  * the 3x3 in-plane taps become 9 row-rolled, edge-masked copies of that
    matrix, concatenated along K;
  * the channel mixing of *all* taps is then ONE matmul against a banded
    block-Toeplitz weight matrix ``B (9K, 3N)`` (``N = w_blk * C_out``),
    whose three N-slices feed the three output planes this input plane
    touches (dz = +1, 0, -1) — a rotating accumulator finalizes one output
    plane per grid step.

Cost: the band structure bills 3x the true MACs of the conv, but the MXU
runs at full 128-lane occupancy on every operand, so a full-resolution
16->16 conv lands at ~3 ms vs XLA's 17.9 ms — and, more importantly, with
byte-exact unpadded memory traffic.

The backward pass reuses the same kernel: d/dx is the conv with the
spatially-flipped, channel-transposed bank; d/dB contracts the same
shift-variants against the output cotangents (one ``dot_general`` per
plane accumulated in VMEM).  ``build_band_bank`` is plain differentiable
jnp (kron with constant 0/1 Toeplitz masks), so the ``dB -> dk`` chain is
ordinary XLA autodiff — no hand-written weight-gradient math.

Reference op being replaced: torch Conv3d(k3 s1 p1) used by every conv
block (lib/network_factory/modules.py:28-60).  Equivalence vs
``lax.conv_general_dilated`` is asserted in tests/test_packed_conv.py
(interpret mode on CPU and on-device).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def choose_w_blk(c_in: int, c_out: int) -> int:
    """Smallest w-group so both K = w_blk*c_in and N = w_blk*c_out are
    multiples of the 128-lane tile."""
    if c_in & (c_in - 1) or c_out & (c_out - 1):
        raise ValueError(f"channel counts must be powers of two for lane "
                         f"packing; got {c_in}, {c_out} (pad channels)")
    return max(LANE // min(c_in, LANE), LANE // min(c_out, LANE), 1)


def packed_width(w: int, c_in: int, c_out: int) -> int:
    """Stored W (>= w) so that W*C lanes tile cleanly for this conv pair."""
    blk = choose_w_blk(c_in, c_out)
    return -(-w // blk) * blk


# ------------------------------------------------------------- weight bank

def build_band_bank(k: jnp.ndarray, c_in: int, c_out: int, w_blk: int,
                    transpose: bool = False) -> jnp.ndarray:
    """Lower a ``(3, 3, 3, c_in, c_out)`` conv kernel to the banded matmul
    bank ``B (9K, 3N)`` the packed kernel consumes.

    Rows are the 9 (dy, r) shift-variants stacked along K (dy outer, r
    inner); columns are the 3 dz output-plane slices stacked along N, in the
    kernel's convention ``out(o) += variants(i) @ B[:, dz]`` with
    ``dz = i - o + 1``.  ``transpose=True`` builds the bank of the adjoint
    convolution (spatial flip + channel transpose) for the d/dx pass.

    Pure jnp on top of constant 0/1 Toeplitz masks — differentiable, so
    the weight gradient of the packed conv is ordinary autodiff through
    this function.
    """
    if transpose:
        k = jnp.flip(k, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
        c_in, c_out = c_out, c_in
    K, N = w_blk * c_in, w_blk * c_out
    wi = np.arange(w_blk)[:, None]
    wo = np.arange(w_blk)[None, :]
    dz_cols = []
    for dz in range(3):
        rows = []
        for dy in range(3):
            for r in (-1, 0, 1):
                acc = jnp.zeros((K, N), k.dtype)
                for dx in range(3):
                    # variant r supplies w-positions wi + r*w_blk; tap dx
                    # couples input w_in = w_out + (dx - 1)
                    T = ((wi + r * w_blk - wo) == (dx - 1))
                    if not T.any():
                        continue
                    blk = jnp.asarray(T, k.dtype)[:, None, :, None] \
                        * k[dz, dy, dx][None, :, None, :]
                    acc = acc + blk.reshape(K, N)
                rows.append(acc)
        dz_cols.append(jnp.concatenate(rows, axis=0))        # (9K, N)
    return jnp.concatenate(dz_cols, axis=1)                  # (9K, 3N)


def build_point_bank(k: jnp.ndarray, c_in: int, c_out: int, w_blk: int,
                     transpose: bool = False) -> jnp.ndarray:
    """Bank for a 1x1x1 conv: block-diagonal ``(K, N)``."""
    if k.ndim == 5:  # (1,1,1,ci,co)
        k = k[0, 0, 0]
    if transpose:
        k = k.T
        c_in, c_out = c_out, c_in
    K, N = w_blk * c_in, w_blk * c_out
    eye = jnp.asarray(np.eye(w_blk, dtype=np.float32), k.dtype)
    blk = eye[:, None, :, None] * k[None, :, None, :]
    return blk.reshape(K, N)


# ------------------------------------------------------------ fwd kernel

def _variants(plane, *, h, g, K, n_seg_rows):
    """Build the (M, 9K) shift-variant matrix of one packed plane.

    Rolls run in f32 (tpu.dynamic_rotate is 32-bit only); the concat output
    is bf16 for the MXU.  Wrapped rows are zero-masked: dy pulls rows of
    h±1 (volume edge rows -> conv zero padding), r pulls the neighbouring
    w-group (group-edge rows -> handled by the band structure).
    """
    M = h * g
    out_dtype = plane.dtype if plane.dtype == jnp.float32 else jnp.bfloat16
    a32 = plane.reshape(M, K).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    j = row % g
    hh = row // g
    segs = []
    for dy in (-1, 0, 1):
        for r in (-1, 0, 1):
            shift = dy * g + r
            ar = pltpu.roll(a32, (-shift) % M, 0) if shift else a32
            conds = []
            if dy == 1:
                conds.append(hh < h - 1)
            elif dy == -1:
                conds.append(hh > 0)
            if r == 1:
                conds.append(j < g - 1)
            elif r == -1:
                conds.append(j > 0)
            if conds:
                m = conds[0]
                for c in conds[1:]:
                    m = m & c
                ar = jnp.where(m, ar, 0.0)
            segs.append(ar.astype(out_dtype))
    del n_seg_rows
    return jnp.concatenate(segs, axis=1)                     # (M, 9K)


def _conv_fwd_kernel(x_ref, b_ref, o_ref, xbuf, acc, sem, *,
                     d_tot, h, g, K, N, w_valid, h_valid, c_out):
    """Rotating-accumulator packed conv: one input plane per grid step."""
    i = pl.program_id(0)
    M = h * g

    @pl.when(i == 0)
    def _():                     # plane 0 has no dz=0 initializer
        acc[0] = jnp.zeros_like(acc[0])

    @pl.when(i < d_tot)
    def _():
        cp = pltpu.make_async_copy(x_ref.at[i], xbuf, sem)
        cp.start()
        cp.wait()
        big = _variants(xbuf[...], h=h, g=g, K=K, n_seg_rows=9)
        y = jnp.dot(big, b_ref[...].astype(big.dtype),
                    preferred_element_type=jnp.float32)
        # dz slices: out = i + 1 - dz
        for dz in range(3):
            out = i + 1 - dz
            for slot in range(3):
                @pl.when((out % 3 == slot) & (out >= 0) & (out < d_tot))
                def _(dz=dz, slot=slot, out=out):
                    ypart = y[:, dz * N:(dz + 1) * N]
                    if dz == 0:
                        acc[slot] = ypart
                    else:
                        acc[slot] += ypart

    # finalize plane i-1 (all three contributions received)
    fin = i - 1
    for slot in range(3):
        @pl.when((fin >= 0) & (fin % 3 == slot))
        def _(slot=slot):
            yfin = acc[slot].reshape(h, g * N)
            lane = jax.lax.broadcasted_iota(jnp.int32, yfin.shape, 1)
            rowi = jax.lax.broadcasted_iota(jnp.int32, yfin.shape, 0)
            # zero the W- and H-pad regions: the next conv's taps read them
            # as the volume's zero padding
            yfin = jnp.where((lane < w_valid * c_out) & (rowi < h_valid),
                             yfin, 0.0)
            o_ref[0] = yfin.astype(o_ref.dtype)


def _conv_point_kernel(x_ref, b_ref, o_ref, xbuf, sem, *,
                       h, g, K, N, w_valid, h_valid, c_out):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(x_ref.at[i], xbuf, sem)
    cp.start()
    cp.wait()
    M = h * g
    a = xbuf[...].reshape(M, K)
    a = a if a.dtype == jnp.float32 else a.astype(jnp.bfloat16)
    y = jnp.dot(a, b_ref[...].astype(a.dtype),
                preferred_element_type=jnp.float32)
    y = y.reshape(h, g * N)
    lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
    y = jnp.where((lane < w_valid * c_out) & (rowi < h_valid), y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _variants_nd(block, *, n_planes, h, g, K):
    """`_variants` over a STACK of ``n_planes`` packed planes at once.

    The block reshapes to ``((n_planes*h*g), K)`` and the 9 (dy, r) shifts
    become GLOBAL rolls: rows that would wrap across a plane boundary are
    exactly the rows the per-plane edge masks zero (``hh = (row//g) % h``
    hits h-1/0 at plane seams, ``j`` at w-group seams), so the masked
    global roll equals per-plane rolls.  Kept separate from `_variants`
    (identical math at n_planes=1) so the shipped single-plane kernels'
    jaxprs — and their compile-cache entries — are untouched."""
    M = h * g
    Mt = n_planes * M
    out_dtype = block.dtype if block.dtype == jnp.float32 else jnp.bfloat16
    a32 = block.reshape(Mt, K).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (Mt, 1), 0)
    j = row % g
    hh = (row // g) % h
    segs = []
    for dy in (-1, 0, 1):
        for r in (-1, 0, 1):
            shift = dy * g + r
            ar = pltpu.roll(a32, (-shift) % Mt, 0) if shift else a32
            conds = []
            if dy == 1:
                conds.append(hh < h - 1)
            elif dy == -1:
                conds.append(hh > 0)
            if r == 1:
                conds.append(j < g - 1)
            elif r == -1:
                conds.append(j > 0)
            if conds:
                m = conds[0]
                for c in conds[1:]:
                    m = m & c
                ar = jnp.where(m, ar, 0.0)
            segs.append(ar.astype(out_dtype))
    return jnp.concatenate(segs, axis=1)                     # (Mt, 9K)


def _conv_fwd_block_kernel(x_ref, b_ref, o_ref, xbuf, sem, *,
                           p_blk, h, g, K, N, w_valid, h_valid, c_out):
    """Multi-plane packed conv: ``p_blk`` OUTPUT planes per grid step.

    The input arrives pre-padded with one zero plane on each side (and the
    depth rounded up to a multiple of ``p_blk``), so step ``s`` DMAs the
    halo'd window of ``p_blk + 2`` planes ``[s*p_blk, s*p_blk + p_blk+2)``
    and every step is INDEPENDENT — no rotating accumulator, no cross-step
    data flow, one DMA + one `(p_blk+2)*M x 9K by 9K x 3N` matmul per
    step.  Each plane's shift-variants are built (p_blk+2)/p_blk times
    instead of once (the halo overlap) in exchange for amortizing the
    per-step launch/DMA/sync overhead — a win on the deep small-M U-Net
    levels that run latency-bound in the one-plane kernel (PERF.md
    round-4 roofline rows 3-9).  Experimental: forward-only entry
    ``packed_conv3d_block``; microbench `tools/bench_block_conv.py`."""
    s = pl.program_id(0)
    P = p_blk
    cp = pltpu.make_async_copy(x_ref.at[pl.ds(s * P, P + 2)], xbuf, sem)
    cp.start()
    cp.wait()
    M = h * g
    big = _variants_nd(xbuf[...], n_planes=P + 2, h=h, g=g, K=K)
    y = jnp.dot(big, b_ref[...].astype(big.dtype),
                preferred_element_type=jnp.float32)          # (Mt, 3N)
    y3 = y.reshape(P + 2, M, 3 * N)
    lane = jax.lax.broadcasted_iota(jnp.int32, (h, g * N), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (h, g * N), 0)
    keep = (lane < w_valid * c_out) & (rowi < h_valid)
    for lo in range(P):
        # out(o) += variants(i) @ B[:, dz], dz = i - o + 1; with the front
        # zero pad, local input index li = lo + dz
        o = y3[lo, :, 0:N] + y3[lo + 1, :, N:2 * N] \
            + y3[lo + 2, :, 2 * N:3 * N]
        o = o.reshape(h, g * N)
        o_ref[lo] = jnp.where(keep, o, 0.0).astype(o_ref.dtype)


def _conv_fwd_block_call(x, B, cfg, p_blk):
    c_in, c_out, w_blk, w_valid, h_valid, interpret = cfg
    d_tot, h, L = x.shape
    K = w_blk * c_in
    N = w_blk * c_out
    g = L // K
    Lout = g * N
    d_pad = -(-d_tot // p_blk) * p_blk
    xp = jnp.pad(x, [(1, d_pad - d_tot + 1), (0, 0), (0, 0)])
    kern = functools.partial(_conv_fwd_block_kernel, p_blk=p_blk, h=h, g=g,
                             K=K, N=N, w_valid=w_valid, h_valid=h_valid,
                             c_out=c_out)
    out = pl.pallas_call(
        kern,
        grid=(d_pad // p_blk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((p_blk, h, Lout), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_pad, h, Lout), x.dtype),
        scratch_shapes=[pltpu.VMEM((p_blk + 2, h, L), x.dtype),
                        pltpu.SemaphoreType.DMA],
        compiler_params=_VMEM,
        interpret=interpret,
    )(xp, B)
    return out[:d_tot]


def packed_conv3d_block(x: jnp.ndarray, k: jnp.ndarray, *, c_in: int,
                        w_valid: int, h_valid: int | None = None,
                        p_blk: int = 4,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Forward-only multi-plane variant of :func:`packed_conv3d` (k3 only).

    Experimental VERDICT-r4 #9 probe: amortizes per-grid-step overhead
    over ``p_blk`` output planes (see `_conv_fwd_block_kernel`).  Not yet
    differentiable — adoption would reuse the same call with the adjoint
    bank for d/dx, exactly like `_packed_conv_bwd`."""
    if interpret is None:
        interpret = _default_interpret()
    if h_valid is None:
        h_valid = x.shape[1]
    c_out = k.shape[-1]
    w_blk = choose_w_blk(c_in, c_out)
    cfg = (c_in, c_out, w_blk, w_valid, h_valid, interpret)
    B = build_band_bank(k.astype(jnp.float32), c_in, c_out, w_blk)
    return _conv_fwd_block_call(x, B, cfg, p_blk)


def _conv_wgrad_kernel(x_ref, g_ref, db_ref, xbuf, gbuf, sem, *,
                       d_tot, h, g, K, N, w_valid, h_valid, c_out):
    """dB (9K, 3N) = sum_i variants(x_i)^T @ [g_{i+1} | g_i | g_{i-1}]."""
    i = pl.program_id(0)
    cps = [pltpu.make_async_copy(x_ref.at[i], xbuf, sem.at[0])]
    for dz in range(3):
        p = jnp.clip(i + 1 - dz, 0, d_tot - 1)
        cps.append(pltpu.make_async_copy(g_ref.at[p], gbuf.at[dz],
                                         sem.at[dz + 1]))
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()
    M = h * g
    big = _variants(xbuf[...], h=h, g=g, K=K, n_seg_rows=9)
    gparts = []
    for dz in range(3):
        p = i + 1 - dz
        gp = gbuf[dz].reshape(M, N)
        valid = ((p >= 0) & (p < d_tot)).astype(jnp.float32)
        gparts.append((gp.astype(jnp.float32) * valid).astype(big.dtype))
    gcat = jnp.concatenate(gparts, axis=1)                    # (M, 3N)
    contrib = jax.lax.dot_general(
        big, gcat, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (9K, 3N)

    @pl.when(i == 0)
    def _():
        db_ref[...] = contrib

    @pl.when(i > 0)
    def _():
        db_ref[...] += contrib


# ------------------------------------------------------------ public ops

def _default_interpret() -> bool:
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _conv_fwd_call(x, B, cfg):
    c_in, c_out, w_blk, w_valid, h_valid, interpret = cfg
    d_tot, h, L = x.shape
    K = w_blk * c_in
    N = w_blk * c_out
    g = L // K
    Lout = g * N
    kern = functools.partial(_conv_fwd_kernel, d_tot=d_tot, h=h, g=g, K=K,
                             N=N, w_valid=w_valid, h_valid=h_valid,
                             c_out=c_out)
    return pl.pallas_call(
        kern,
        grid=(d_tot + 1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, Lout),
                               lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_tot, h, Lout), x.dtype),
        scratch_shapes=[pltpu.VMEM((h, L), x.dtype),
                        pltpu.VMEM((3, h * g, N), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=_VMEM,
        interpret=interpret,
    )(x, B)


def _wgrad_call(x, gout, cfg):
    c_in, c_out, w_blk, w_valid, h_valid, interpret = cfg
    d_tot, h, L = x.shape
    K = w_blk * c_in
    N = w_blk * c_out
    g = L // K
    kern = functools.partial(_conv_wgrad_kernel, d_tot=d_tot, h=h, g=g, K=K,
                             N=N, w_valid=w_valid, h_valid=h_valid,
                             c_out=c_out)
    return pl.pallas_call(
        kern,
        grid=(d_tot,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((9 * K, 3 * N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * K, 3 * N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, L), x.dtype),
                        pltpu.VMEM((3, h, g * N), gout.dtype),
                        pltpu.SemaphoreType.DMA((4,))],
        compiler_params=_VMEM,
        interpret=interpret,
    )(x, gout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _packed_conv(x, B, Bt, cfg):
    """x (D, H, W*c_in) x B (9K, 3N) -> (D, H, W*c_out).

    ``Bt`` is the adjoint bank (used only by the backward pass; the primal
    output does not depend on it, so its cotangent is zero)."""
    return _conv_fwd_call(x, B, cfg)


def _packed_conv_fwd(x, B, Bt, cfg):
    return _conv_fwd_call(x, B, cfg), (x, Bt)


def _packed_conv_bwd(cfg, res, gout):
    x, Bt = res
    c_in, c_out, w_blk, w_valid, h_valid, interpret = cfg
    cfg_t = (c_out, c_in, w_blk, w_valid, h_valid, interpret)
    dx = _conv_fwd_call(gout.astype(x.dtype), Bt, cfg_t).astype(x.dtype)
    dB = _wgrad_call(x, gout, cfg).astype(jnp.float32)
    return dx, dB, None


_packed_conv.defvjp(_packed_conv_fwd, _packed_conv_bwd)


def _point_call(x, B, cfg):
    c_in, c_out, w_blk, w_valid, h_valid, interpret = cfg
    d_tot, h, L = x.shape
    K = w_blk * c_in
    N = w_blk * c_out
    g = L // K
    Lout = g * N
    kern = functools.partial(_conv_point_kernel, h=h, g=g, K=K, N=N,
                             w_valid=w_valid, h_valid=h_valid, c_out=c_out)
    return pl.pallas_call(
        kern,
        grid=(d_tot,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, Lout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d_tot, h, Lout), x.dtype),
        scratch_shapes=[pltpu.VMEM((h, L), x.dtype),
                        pltpu.SemaphoreType.DMA],
        compiler_params=_VMEM,
        interpret=interpret,
    )(x, B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _packed_point(x, B, Bt, cfg):
    return _point_call(x, B, cfg)


def _packed_point_fwd(x, B, Bt, cfg):
    return _packed_point(x, B, Bt, cfg), (x, Bt)


def _packed_point_bwd(cfg, res, gout):
    x, Bt = res
    c_in, c_out, w_blk, w_valid, h_valid, interpret = cfg
    cfg_t = (c_out, c_in, w_blk, w_valid, h_valid, interpret)
    dx = _point_call(gout.astype(x.dtype), Bt, cfg_t).astype(x.dtype)
    # dB for the block-diagonal bank: contract planes on the fly in XLA —
    # the operands are (M, K) x (M, N); cheap enough without a dedicated
    # kernel (the 1x1 conv is ~4% of the network's MACs)
    d_tot, h, L = x.shape
    K = w_blk * c_in
    N = w_blk * c_out
    M = (L // K) * h * d_tot
    dB = jax.lax.dot_general(
        x.reshape(M, K), gout.reshape(M, N).astype(x.dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dx, dB, None


_packed_point.defvjp(_packed_point_fwd, _packed_point_bwd)


def packed_conv3d(x: jnp.ndarray, k: jnp.ndarray, *, c_in: int,
                  w_valid: int, h_valid: int | None = None,
                  kernel_size: int = 3,
                  interpret: bool | None = None) -> jnp.ndarray:
    """3-D convolution on a packed ``(D, H, W*c_in)`` activation.

    Args:
      x: packed activation; ``W = x.shape[-1] // c_in`` must be a multiple
        of the w-group for this channel pair.
      k: ``(3,3,3,c_in,c_out)`` or ``(1,1,1,c_in,c_out)`` kernel (torch
        Conv3d semantics: stride 1; padding 1 for k3, 0 for k1).
      c_in: channels packed in the lane axis.
      w_valid: logical W (lanes beyond ``w_valid*c_out`` are zeroed).

    Returns packed ``(D, H, W*c_out)``.
    """
    if interpret is None:
        interpret = _default_interpret()
    if h_valid is None:
        h_valid = x.shape[1]
    c_out = k.shape[-1]
    w_blk = choose_w_blk(c_in, c_out)
    w_stored = x.shape[-1] // c_in
    if w_stored % w_blk:
        raise ValueError(f"stored W {w_stored} not a multiple of w-group "
                         f"{w_blk} for {c_in}->{c_out}")
    cfg = (c_in, c_out, w_blk, w_valid, h_valid, interpret)
    kb = k.astype(jnp.float32)
    if kernel_size == 1 or k.shape[0] == 1:
        B = build_point_bank(kb, c_in, c_out, w_blk)
        Bt = build_point_bank(kb, c_in, c_out, w_blk, transpose=True)
        return _packed_point(x, B, Bt, cfg)
    B = build_band_bank(kb, c_in, c_out, w_blk)
    Bt = build_band_bank(kb, c_in, c_out, w_blk, transpose=True)
    return _packed_conv(x, B, Bt, cfg)


def pack_channels(x: jnp.ndarray, w_stored: int,
                  h_stored: int | None = None) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, D, H_stored, w_stored*C): pad W (and
    optionally H to a sublane multiple) and fold C into lanes."""
    b, d, h, w, c = x.shape
    if w_stored < w:
        raise ValueError(f"w_stored {w_stored} < W {w}")
    hp = (h_stored or h) - h
    if w_stored > w or hp:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, hp), (0, w_stored - w), (0, 0)])
    return x.reshape(b, d, h + hp, w_stored * c)


def unpack_channels(x: jnp.ndarray, c: int, w: int,
                    h: int | None = None) -> jnp.ndarray:
    """(B, D, H_stored, W_stored*C) -> (B, D, H, W, C)."""
    b, d, hs, L = x.shape
    return x.reshape(b, d, hs, L // c, c)[:, :, :h or hs, :w, :]
