"""Separable windowed sums over 3D volumes.

The reference computes local sums for LNCC with dense ``F.conv3d`` against a
ones kernel (loss.py:540-564, 602-606) — O(k^3) MACs per output.  On TPU we
decompose the cubic box filter into three 1-D reduce-windows (O(3k) adds, no
MXU pressure, fuses on the VPU), supporting the strided/dilated variants the
multi-scale LNCC needs (loss.py:538-542).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOr3 = Union[int, Sequence[int]]


def _as3(v: IntOr3) -> tuple:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(int(x) for x in v)
    if len(t) != 3:
        raise ValueError(f"expected int or length-3 sequence, got {v!r}")
    return t


@partial(jax.jit, static_argnames=("window", "stride", "dilation"))
def window_sum(x: jnp.ndarray, window: IntOr3, stride: IntOr3 = 1,
               dilation: IntOr3 = 1) -> jnp.ndarray:
    """Valid-padding box-filter sum over the spatial axes of (B, D, H, W, C).

    Equivalent to ``F.conv3d(x, ones(1,1,k,k,k), padding=0, stride=s,
    dilation=d)`` applied per channel, but separable.

    Returns (B, D', H', W', C) with D' = floor((D - d*(k-1) - 1)/s) + 1 etc.
    """
    win = _as3(window)
    st = _as3(stride)
    dil = _as3(dilation)
    out = x
    for axis, (k, s, dl) in enumerate(zip(win, st, dil)):
        wdims = [1] * out.ndim
        wstrides = [1] * out.ndim
        wdil = [1] * out.ndim
        wdims[axis + 1] = k
        wstrides[axis + 1] = s
        wdil[axis + 1] = dl
        out = lax.reduce_window(out, jnp.zeros((), out.dtype), lax.add,
                                window_dimensions=wdims,
                                window_strides=wstrides,
                                padding="VALID",
                                window_dilation=wdil)
    return out
