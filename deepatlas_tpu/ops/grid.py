"""Identity sampling grids for dense deformable transforms.

Reference parity: lib/utils.py:78-102 builds a ``(3, D, H, W)`` tensor by
``stack([zz, yy, xx])`` over an ij-indexed meshgrid of (D, H, W) — i.e. channel 0
is the normalized coordinate along W (fastest axis), channel 1 along H, channel 2
along D.  After the reference permutes it to ``(D, H, W, 3)`` for
``F.grid_sample`` (voxel_morph.py:90), the last axis is ordered ``(x, y, z)``.

We natively produce the channel-last ``(D, H, W, 3)`` layout with last axis
``(x, y, z)``; ``normalize=True`` maps voxel index ``i`` on an axis of size ``n``
to ``-1 + 2 * i / (n - 1)`` (align_corners=True convention).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax.numpy as jnp


def identity_grid(shape: Sequence[int], normalize: bool = True,
                  dtype=jnp.float32) -> jnp.ndarray:
    """Identity sampling grid for a (D, H, W) volume.

    Args:
      shape: spatial shape ``(D, H, W)``.
      normalize: if True, coordinates are in ``[-1, 1]`` with align-corners
        semantics; otherwise raw voxel indices.
      dtype: output dtype.

    Returns:
      ``(D, H, W, 3)`` array; last axis is ``(x, y, z)`` where x indexes W,
      y indexes H, z indexes D.
    """
    d, h, w = shape

    def axis_coords(n):
        c = jnp.arange(n, dtype=dtype)
        if normalize:
            if n > 1:
                c = c / (n - 1) * 2.0 - 1.0
            else:
                c = c * 0.0 - 1.0  # single-voxel axis: reference maps index 0 -> -1
        return c

    x = jnp.broadcast_to(axis_coords(w)[None, None, :], (d, h, w))
    y = jnp.broadcast_to(axis_coords(h)[None, :, None], (d, h, w))
    z = jnp.broadcast_to(axis_coords(d)[:, None, None], (d, h, w))
    return jnp.stack([x, y, z], axis=-1)


def identity_grid_batch(batch_shape: Sequence[int], normalize: bool = True,
                        dtype=jnp.float32) -> jnp.ndarray:
    """Identity grid broadcast over a batch.

    Args:
      batch_shape: ``(B, D, H, W, ...)`` — only the first four entries are used
        (mirrors lib/utils.py:78-86 which takes the NxCxDxHxW size tuple).

    Returns:
      ``(B, D, H, W, 3)`` array (broadcasted view; no extra memory).
    """
    b = batch_shape[0]
    grid = identity_grid(batch_shape[1:4], normalize=normalize, dtype=dtype)
    return jnp.broadcast_to(grid[None], (b,) + grid.shape)


def normalize_displacement(disp_voxels: jnp.ndarray) -> jnp.ndarray:
    """Convert a displacement field in voxel units to normalized [-1,1] units.

    Args:
      disp_voxels: ``(..., D, H, W, 3)`` displacement in voxel units,
        last axis ``(x, y, z)``.
    """
    d, h, w = disp_voxels.shape[-4:-1]
    scale = jnp.asarray(
        [2.0 / max(w - 1, 1), 2.0 / max(h - 1, 1), 2.0 / max(d - 1, 1)],
        dtype=disp_voxels.dtype)
    return disp_voxels * scale
