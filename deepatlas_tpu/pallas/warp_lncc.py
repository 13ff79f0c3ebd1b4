"""Fused spatial-transformer warp + windowed LNCC similarity.

The BASELINE.json north star calls for the trilinear warp
(voxel_morph.py:90-91) fused with the windowed LNCC loss (loss.py:589-617)
on the TPU hot path.  The profiled decomposition of that path:

  * the *gather* was the bottleneck (~576 ms per warp under XLA's generic
    TPU gather lowering) — eliminated by the Pallas warp kernel
    (pallas/warp.py, ~87 ms fwd / ~66 ms fwd+bwd-grid);
  * the *window sums* were next (~1.08 s fwd+bwd as ones-kernel conv3d) —
    eliminated by prefix-sum box filters (ops/window.py, ~184 ms fwd+bwd);
  * the remaining elementwise algebra XLA fuses on its own.

``warp_lncc_loss`` is therefore one jit program combining the Pallas warp
with the prefix-sum LNCC: a hand-written monolithic kernel would save only
the single HBM round-trip of the warped volume (~0.1 ms at v5e bandwidth)
while forfeiting XLA's scheduling of the cumsum chains, so the fusion lives
at the XLA level by design.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..losses.similarity import lncc_loss
from .warp import pallas_grid_sample


@partial(jax.jit, static_argnames=("filter_size", "max_disp", "z_tile",
                                   "interpret"))
def warp_lncc_loss(moving: jnp.ndarray, fixed: jnp.ndarray,
                   grid: jnp.ndarray, filter_size: int = 9,
                   eps: float = 1e-6, max_disp: int = 8, z_tile: int = 4,
                   interpret: bool | None = None) -> jnp.ndarray:
    """1 - mean local CC² between ``warp(moving, grid)`` and ``fixed``.

    Args:
      moving, fixed: ``(B, D, H, W, C)`` volumes.
      grid: ``(B, D, H, W, 3)`` normalized sample grid (x, y, z),
        align_corners=True.
    """
    warped = pallas_grid_sample(moving.astype(jnp.float32), grid,
                                max_disp=max_disp, z_tile=z_tile,
                                ct_sparse=False,  # image ct: dense
                                interpret=interpret)
    return lncc_loss(warped, fixed.astype(jnp.float32),
                     filter_size=filter_size, eps=eps)
