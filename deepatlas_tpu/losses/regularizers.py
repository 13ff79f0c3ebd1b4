"""Deformation-field regularizers.

Reference parity: ``gradientLoss`` (loss.py:625-671) and ``BendingEnergyLoss``
(loss.py:674-730), operating on displacement fields.  Our fields are
channel-last ``(B, D, H, W, 3)``; the reference's are ``(N, 3, D, H, W)`` —
the math is identical with spatial axes (1, 2, 3).

Documented divergence from the reference: loss.py:661-663 computes the H- and
W-axis first differences with a ``+`` instead of ``-`` (the comment at
loss.py:658 states the intended central difference ``f(x+h) - f(x-h)``).  We
implement the *intended* central difference on all three axes.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def _prep_spacing(spacing: Sequence[float], normalize: bool) -> jnp.ndarray:
    s = jnp.asarray(spacing, dtype=jnp.float32)
    if normalize:
        s = s / s.min()
    return s


def _spatial_dims(field: jnp.ndarray, normalize: bool) -> jnp.ndarray:
    dims = jnp.asarray(field.shape[1:4], dtype=jnp.float32)
    if normalize:
        dims = dims / dims.min()
    return dims


def gradient_loss(field: jnp.ndarray, norm: str = "L2",
                  spacing: Sequence[float] = (1.0, 1.0, 1.0),
                  normalize: bool = True) -> jnp.ndarray:
    """First-order (central-difference) smoothness penalty.

    Args:
      field: ``(B, D, H, W, 3)`` displacement field.
    """
    sp = _prep_spacing(spacing, normalize)
    dims = _spatial_dims(field, normalize)
    b = field.shape[0]
    c = field.shape[-1]

    d0 = jnp.abs(field[:, 2:, :, :, :] - field[:, :-2, :, :, :]).reshape(b, -1, c)
    d1 = jnp.abs(field[:, :, 2:, :, :] - field[:, :, :-2, :, :]).reshape(b, -1, c)
    d2 = jnp.abs(field[:, :, :, 2:, :] - field[:, :, :, :-2, :]).reshape(b, -1, c)

    if norm == "L2":
        d0 = (d0 ** 2).mean(axis=1) * (dims * sp / sp[0]) ** 2
        d1 = (d1 ** 2).mean(axis=1) * (dims * sp / sp[1]) ** 2
        d2 = (d2 ** 2).mean(axis=1) * (dims * sp / sp[2]) ** 2
    return (d0.mean() + d1.mean() + d2.mean()) / 3.0


def bending_energy_loss(field: jnp.ndarray, norm: str = "L2",
                        spacing: Sequence[float] = (1.0, 1.0, 1.0),
                        normalize: bool = True,
                        axis_name: str | None = None) -> jnp.ndarray:
    """Second-order bending-energy penalty (3 diagonal + 3 cross second
    derivatives, spacing-normalized; loss.py:687-730).

    ``axis_name``: when the field's D axis is depth-sharded over a mesh
    axis (parallel/spatial.py), the second differences read one halo plane
    from the neighbours; global-edge planes (which the unsharded version
    crops) are masked out, and the interior means psum over the axis —
    the sharded loss equals the single-device one exactly.
    """
    sp = _prep_spacing(spacing, normalize)
    b = field.shape[0]
    c = field.shape[-1]
    if axis_name is None:
        dims = _spatial_dims(field, normalize)
        f = field
        mask = None
        d_glob = field.shape[1]
    else:
        import jax

        from ..ops.halo import halo_exchange_d
        n = jax.lax.axis_size(axis_name)
        idx = jax.lax.axis_index(axis_name)
        d_loc, h, w = field.shape[1:4]
        d_glob = d_loc * n
        dims = jnp.asarray((d_glob, h, w), dtype=jnp.float32)
        if normalize:
            dims = dims / dims.min()
        f = halo_exchange_d(field, axis_name, 1)
        g = idx * d_loc + jnp.arange(d_loc)
        mask = ((g >= 1) & (g <= d_glob - 2)).astype(
            jnp.float32)[None, :, None, None, None]
    inner = f[:, 1:-1, 1:-1, 1:-1, :]

    def term(x):
        # masked interior mean over (D-2, H-2, W-2) global voxels -> (b, c)
        if mask is None:
            return (x ** 2 if norm == "L2" else jnp.abs(x)).reshape(
                b, -1, c).mean(axis=1)
        v = (x ** 2 if norm == "L2" else jnp.abs(x)) * mask
        s = jnp.sum(v, axis=(1, 2, 3))
        import jax
        s = jax.lax.psum(s, axis_name)
        cnt = (d_glob - 2) * (x.shape[2]) * (x.shape[3])
        return s / cnt

    dd0 = term(jnp.abs(f[:, 2:, 1:-1, 1:-1, :] + f[:, :-2, 1:-1, 1:-1, :]
                       - 2 * inner))
    dd1 = term(jnp.abs(f[:, 1:-1, 2:, 1:-1, :] + f[:, 1:-1, :-2, 1:-1, :]
                       - 2 * inner))
    dd2 = term(jnp.abs(f[:, 1:-1, 1:-1, 2:, :] + f[:, 1:-1, 1:-1, :-2, :]
                       - 2 * inner))
    d01 = term(jnp.abs(f[:, 2:, 2:, 1:-1, :] + f[:, :-2, :-2, 1:-1, :]
                       - f[:, 2:, :-2, 1:-1, :] - f[:, :-2, 2:, 1:-1, :]))
    d12 = term(jnp.abs(f[:, 1:-1, 2:, 2:, :] + f[:, 1:-1, :-2, :-2, :]
                       - f[:, 1:-1, 2:, :-2, :] - f[:, 1:-1, :-2, 2:, :]))
    d02 = term(jnp.abs(f[:, 2:, 1:-1, 2:, :] + f[:, :-2, 1:-1, :-2, :]
                       - f[:, 2:, 1:-1, :-2, :] - f[:, :-2, 1:-1, 2:, :]))

    if norm == "L2":
        dd0 = dd0 * (dims * sp / sp[0] ** 2) ** 2
        dd1 = dd1 * (dims * sp / sp[1] ** 2) ** 2
        dd2 = dd2 * (dims * sp / sp[2] ** 2) ** 2
        d01 = d01 * (dims * sp / (sp[0] * sp[1])) ** 2
        d12 = d12 * (dims * sp / (sp[1] * sp[2])) ** 2
        d02 = d02 * (dims * sp / (sp[2] * sp[0])) ** 2

    return (dd0.mean() + dd1.mean() + dd2.mean()
            + 2 * d01.mean() + 2 * d12.mean() + 2 * d02.mean()) / 9.0


def l2_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Mean squared magnitude (loss.py:733-736)."""
    return jnp.mean(x ** 2)
