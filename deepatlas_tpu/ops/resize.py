"""Volume resizing matching PyTorch ``F.interpolate`` semantics.

The reference's VoxelMorph decoder upsamples with ``F.interpolate(x, size=...)``
and *no mode argument* — i.e. nearest-neighbour (voxel_morph.py:72-80; the
trilinear ``nn.Upsample`` defined at voxel_morph.py:40 is never used).  Parity
requires torch's exact index rule: ``src = floor(dst * in_size / out_size)``.

``trilinear_resize`` covers the ``mode='trilinear'`` cases (UNet_generator's
``upsample=True`` option, unets.py:237) with both align_corners conventions.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_shape",))
def nearest_resize(vol: jnp.ndarray, out_shape: Sequence[int]) -> jnp.ndarray:
    """Nearest-neighbour resize of a (B, D, H, W, C) volume to ``out_shape``.

    Uses torch's nearest rule ``src_idx = floor(dst_idx * in / out)``.
    """
    b, d, h, w, c = vol.shape
    od, oh, ow = out_shape
    out = vol
    for axis, (n_in, n_out) in zip((1, 2, 3), ((d, od), (h, oh), (w, ow))):
        if n_in == n_out:
            continue
        idx = jnp.floor(jnp.arange(n_out) * (n_in / n_out)).astype(jnp.int32)
        idx = jnp.clip(idx, 0, n_in - 1)
        out = jnp.take(out, idx, axis=axis)
    return out


@partial(jax.jit, static_argnames=("out_shape", "align_corners"))
def trilinear_resize(vol: jnp.ndarray, out_shape: Sequence[int],
                     align_corners: bool = False) -> jnp.ndarray:
    """Trilinear resize of a (B, D, H, W, C) volume to ``out_shape``.

    align_corners=False uses torch's half-pixel rule
    ``src = (dst + 0.5) * in/out - 0.5`` with edge clamping;
    align_corners=True uses ``src = dst * (in-1)/(out-1)``.

    Separable per-axis linear interpolation (exact, and cheaper than a dense
    gather: 3 passes of 2-tap blends instead of one 8-corner gather).
    """
    out = vol
    for axis, n_out in zip((1, 2, 3), out_shape):
        n_in = out.shape[axis]
        if n_in == n_out:
            continue
        if align_corners and n_out > 1:
            src = jnp.arange(n_out) * ((n_in - 1) / (n_out - 1))
        elif align_corners:
            src = jnp.zeros((n_out,))
        else:
            src = (jnp.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        src = jnp.clip(src, 0.0, n_in - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        frac = (src - lo).astype(vol.dtype)
        shape = [1] * out.ndim
        shape[axis] = n_out
        frac = frac.reshape(shape)
        out = (jnp.take(out, lo, axis=axis) * (1 - frac)
               + jnp.take(out, hi, axis=axis) * frac)
    return out
