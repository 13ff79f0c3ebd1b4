"""Jacobian-determinant statistics of dense deformation fields.

Eval capability required by BASELINE.json ("Jacobian-determinant folding
stats") that the reference lacks.  The deformation field is the normalized
``(B, D, H, W, 3)`` grid (identity + displacement, last axis (x, y, z) as in
ops/grid.py); determinants are computed in *voxel* units so the identity
deformation has det == 1 everywhere.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def jacobian_determinant(deform: jnp.ndarray) -> jnp.ndarray:
    """Per-voxel Jacobian determinant via central differences.

    Args:
      deform: ``(B, D, H, W, 3)`` normalized deformation field, last axis
        (x, y, z) where x indexes W, y indexes H, z indexes D; [-1, 1]
        align-corners units.

    Returns:
      ``(B, D-2, H-2, W-2)`` determinant of d(phi)/d(voxel).
    """
    b, d, h, w, _ = deform.shape
    # convert normalized coords to voxel units so identity has unit gradients
    scale = jnp.asarray([(w - 1) / 2.0, (h - 1) / 2.0, (d - 1) / 2.0],
                        dtype=deform.dtype)
    phi = deform * scale

    # central differences along D (z index), H (y index), W (x index)
    d_z = (phi[:, 2:, 1:-1, 1:-1, :] - phi[:, :-2, 1:-1, 1:-1, :]) / 2.0
    d_y = (phi[:, 1:-1, 2:, 1:-1, :] - phi[:, 1:-1, :-2, 1:-1, :]) / 2.0
    d_x = (phi[:, 1:-1, 1:-1, 2:, :] - phi[:, 1:-1, 1:-1, :-2, :]) / 2.0

    # rows: d(phi_x, phi_y, phi_z); columns: d/dx, d/dy, d/dz
    j00, j01, j02 = d_x[..., 0], d_y[..., 0], d_z[..., 0]
    j10, j11, j12 = d_x[..., 1], d_y[..., 1], d_z[..., 1]
    j20, j21, j22 = d_x[..., 2], d_y[..., 2], d_z[..., 2]

    det = (j00 * (j11 * j22 - j12 * j21)
           - j01 * (j10 * j22 - j12 * j20)
           + j02 * (j10 * j21 - j11 * j20))
    return det


@jax.jit
def folding_stats(deform: jnp.ndarray) -> dict:
    """Folding statistics of a deformation: fraction of voxels with
    non-positive Jacobian determinant, plus det mean/std/min."""
    det = jacobian_determinant(deform)
    return {
        "folding_fraction": jnp.mean((det <= 0).astype(jnp.float32)),
        "det_mean": det.mean(),
        "det_std": det.std(),
        "det_min": det.min(),
    }
