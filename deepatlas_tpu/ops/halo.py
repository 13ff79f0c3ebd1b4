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
