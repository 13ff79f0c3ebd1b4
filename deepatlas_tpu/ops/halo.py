"""Halo exchange for depth-sharded volumes.

The spatial-parallel tier (parallel/spatial.py) shards the volume's D axis
over a mesh axis so volumes larger than one chip's HBM can train; 3x3x3
convolutions then need each shard to see its neighbours' boundary planes.
``halo_exchange_d`` fetches them with ``jax.lax.ppermute`` over ICI — the
canonical TPU halo pattern (one bidirectional neighbour shift, no host).

The reference has no multi-device execution at all (SURVEY.md §2: the
whole repo is single-GPU); its answer to memory pressure is border
cropping + patch training (lib/transforms.py:124-158, 322-494).  Spatial
sharding is the TPU-native alternative that keeps whole-volume semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_exchange_d(x: jnp.ndarray, axis_name: str,
                    halo: int = 1) -> jnp.ndarray:
    """Append ``halo`` neighbour planes on each side of the D axis.

    ``x`` is a local shard ``(B, D_loc, H, W, C)`` inside ``shard_map``
    over mesh axis ``axis_name``; returns ``(B, D_loc + 2*halo, H, W, C)``.
    Edge shards receive ZEROS where no neighbour exists (``ppermute`` drops
    terms without a source), which is exactly the zero padding a
    ``padding=halo`` convolution would apply at the global volume boundary
    — so a k=2h+1 conv on the exchanged block with VALID depth padding
    equals the unsharded SAME-padded conv.
    """
    n = jax.lax.axis_size(axis_name)
    if x.shape[1] < halo:
        raise ValueError(
            f"shard depth {x.shape[1]} < halo {halo}; use fewer shards")
    if n == 1:
        pad = [(0, 0), (halo, halo)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, pad)
    # planes flowing "down" (shard i -> i+1): my last planes become the
    # neighbour's leading halo; "up" symmetric
    down = jax.lax.ppermute(x[:, -halo:], axis_name,
                            [(i, i + 1) for i in range(n - 1)])
    up = jax.lax.ppermute(x[:, :halo], axis_name,
                          [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([down, x, up], axis=1)


def shard_identity_grid(local_shape, axis_name: str,
                        dtype=jnp.float32) -> jnp.ndarray:
    """The GLOBAL normalized identity grid, sliced to this D-shard.

    ``ops.grid.identity_grid_batch`` built from a local shard shape would
    place [-1, 1] across the shard, not the volume; registration fields
    and warps need global coordinates.  ``local_shape`` is the shard's
    (B, D_loc, H, W[, C]); D_global = D_loc * axis size.
    """
    b, d_loc, h, w = local_shape[:4]
    n = jax.lax.axis_size(axis_name)
    d = d_loc * n
    idx = jax.lax.axis_index(axis_name)
    z0 = idx * d_loc
    zs = (z0 + jnp.arange(d_loc, dtype=jnp.float32)) * (2.0 / (d - 1)) - 1.0
    ys = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)
    xs = jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32)
    zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    grid = jnp.stack([xx, yy, zz], axis=-1).astype(dtype)
    return jnp.broadcast_to(grid[None], (b, d_loc, h, w, 3))


def spatial_grid_sample(vol: jnp.ndarray, deform: jnp.ndarray,
                        axis_name: str, max_disp: int = 8) -> jnp.ndarray:
    """Depth-sharded trilinear warp: each shard warps its output voxels
    from its own planes plus a ``max_disp + 1``-plane halo.

    ``vol``/``deform`` are local shards inside ``shard_map``; ``deform``
    holds GLOBAL normalized (x, y, z) coordinates (shard_identity_grid +
    displacement).  Displacements clamp to ±``max_disp`` voxels per axis —
    the same bounded semantics as the Pallas warp's ``bound_mode='clamp'``
    (ops/warp.py::clamp_displacement); matching the exact-everywhere XLA
    warp would need a full all-gather.  Global-edge samples hit the zero
    halos, reproducing zero padding.
    """
    from .warp import grid_sample
    b, d_loc, h, w = vol.shape[:4]
    n = jax.lax.axis_size(axis_name)
    d = d_loc * n
    hp = max_disp + 1
    idx = jax.lax.axis_index(axis_name)

    ident = shard_identity_grid(vol.shape, axis_name)
    scale = jnp.array([2.0 / (w - 1), 2.0 / (h - 1), 2.0 / (d - 1)],
                      jnp.float32)
    disp = jnp.clip(deform.astype(jnp.float32) - ident, -max_disp * scale,
                    max_disp * scale)
    grid = ident + disp

    volh = halo_exchange_d(vol, axis_name, hp)
    # remap global z to the halo'd local frame: gz_local = gz - z0 + hp,
    # renormalized over the halo'd depth
    gz = (grid[..., 2] + 1.0) * ((d - 1) / 2.0)
    gz_loc = gz - (idx * d_loc).astype(jnp.float32) + hp
    dh = d_loc + 2 * hp
    grid_loc = jnp.stack([grid[..., 0], grid[..., 1],
                          gz_loc * (2.0 / (dh - 1)) - 1.0], axis=-1)
    return grid_sample(volh, grid_loc, mode="trilinear")
