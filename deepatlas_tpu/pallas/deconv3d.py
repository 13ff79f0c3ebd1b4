"""Packed-layout k2 s2 transposed convolution (the U-Net upsampler).

torch ConvTranspose3d(kernel=2, stride=2) has no output overlap: every
output voxel (2d+a, 2h+b, 2w+c) is a pointwise channel-mix of input voxel
(d, h, w) through tap (a, b, c) (lib/network_factory/modules.py:64-87,
unets.py:240-241).  In the packed ``(D, H, W*C)`` layout that is ONE matmul
per input plane against a four-way concatenated block bank — the (a, b)
row/plane halves ride the N axis, the (c, co) lane interleave rides inside
each N block — followed by a row interleave.

Parity vs ``lax.conv_transpose`` is asserted in tests/test_packed_conv.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def deconv_w_blk(c_in: int, c_out: int) -> int:
    if c_in & (c_in - 1) or c_out & (c_out - 1):
        raise ValueError(f"channel counts must be powers of two; got "
                         f"{c_in}, {c_out}")
    return max(LANE // min(c_in, LANE), LANE // min(2 * c_out, LANE), 1)


def build_deconv_bank(k: jnp.ndarray, c_in: int, c_out: int,
                      w_blk: int) -> jnp.ndarray:
    """k (2, 2, 2, c_in, c_out) -> bank (K, 4N): the four (a, b) output
    half-planes stacked along N; inside each, output lanes interleave
    (2w + c)*c_out + co."""
    K = w_blk * c_in
    N = 2 * w_blk * c_out
    cols = []
    for a in range(2):
        for b in range(2):
            acc = jnp.zeros((K, N), k.dtype)
            for c in range(2):
                # selector scatters input w onto output lane group 2w + c
                sel = np.zeros((w_blk, 2 * w_blk), np.float32)
                sel[np.arange(w_blk), 2 * np.arange(w_blk) + c] = 1.0
                blk = jnp.asarray(sel, k.dtype)[:, None, :, None] \
                    * k[a, b, c][None, :, None, :]
                acc = acc + blk.reshape(K, N)
            cols.append(acc)
    return jnp.concatenate(cols, axis=1)          # (K, 4N)


def _deconv_kernel(x_ref, b_ref, o_ref, xbuf, sem, *, h, g, K, N,
                   w_valid_out, c_out):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(x_ref.at[i], xbuf, sem)
    cp.start()
    cp.wait()
    M = h * g
    a = xbuf[...].reshape(M, K)
    a = a if a.dtype == jnp.float32 else a.astype(jnp.bfloat16)
    y = jnp.dot(a, b_ref[...].astype(a.dtype),
                preferred_element_type=jnp.float32)          # (M, 4N)
    lane = None
    for ai in range(2):
        y0 = y[:, (2 * ai) * N:(2 * ai + 1) * N].reshape(h, g * N)
        y1 = y[:, (2 * ai + 1) * N:(2 * ai + 2) * N].reshape(h, g * N)
        inter = jnp.stack([y0, y1], axis=1).reshape(2 * h, g * N)
        if lane is None:
            lane = jax.lax.broadcasted_iota(jnp.int32, inter.shape, 1)
        inter = jnp.where(lane < w_valid_out * c_out, inter, 0.0)
        o_ref[ai] = inter.astype(o_ref.dtype)


def _deconv_call(x, B, cfg):
    c_in, c_out, w_blk, w_valid_out, interpret = cfg
    d_tot, h, L = x.shape
    K = w_blk * c_in
    N = 2 * w_blk * c_out
    g = L // K
    Lout = g * N                                  # = 2*W_stored*c_out
    kern = functools.partial(_deconv_kernel, h=h, g=g, K=K, N=N,
                             w_valid_out=w_valid_out, c_out=c_out)
    return pl.pallas_call(
        kern,
        grid=(d_tot,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, 2 * h, Lout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * d_tot, 2 * h, Lout), x.dtype),
        scratch_shapes=[pltpu.VMEM((h, L), x.dtype),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, B)


def packed_deconv2x(x: jnp.ndarray, k: jnp.ndarray, *, c_in: int,
                    w_valid_out: int,
                    interpret: bool | None = None) -> jnp.ndarray:
    """k2 s2 transposed conv on packed ``(D, H, W*c_in)`` ->
    ``(2D, 2H, 2W*c_out)``.  Differentiable w.r.t. both x and k (the bank
    build and the adjoint run through jnp/autodiff; only the forward plane
    matmul is a Pallas kernel wrapped in a linear-op custom JVP-free path).
    """
    if interpret is None:
        try:
            interpret = jax.default_backend() not in ("tpu", "axon")
        except Exception:  # pragma: no cover
            interpret = True
    c_out = k.shape[-1]
    w_blk = deconv_w_blk(c_in, c_out)
    if (x.shape[-1] // c_in) % w_blk:
        raise ValueError(f"stored W {x.shape[-1] // c_in} not a multiple "
                         f"of w-group {w_blk} for deconv {c_in}->{c_out}")
    cfg = (c_in, c_out, w_blk, w_valid_out, interpret)
    B = build_deconv_bank(k.astype(jnp.float32), c_in, c_out, w_blk)

    @jax.custom_vjp
    def op(x, B):
        return _deconv_call(x, B, cfg)

    def op_fwd(x, B):
        return _deconv_call(x, B, cfg), (x, B)

    def op_bwd(res, gout):
        x, B = res
        d_tot, h, L = x.shape
        K = w_blk * c_in
        N = 2 * w_blk * c_out
        g = L // K
        M = d_tot * h * g
        go = gout.reshape(d_tot, 2, 2 * h, g, N)
        go = go.reshape(d_tot, 2, h, 2, g, N)
        go = go.transpose(0, 2, 4, 1, 3, 5).reshape(M, 4 * N)
        dx = jax.lax.dot_general(
            go.astype(x.dtype), B.astype(x.dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        dx = dx.reshape(d_tot, h, L)
        dB = jax.lax.dot_general(
            x.reshape(M, K), go.astype(x.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(B.dtype)
        return dx, dB

    op.defvjp(op_fwd, op_bwd)
    return op(x, B)
