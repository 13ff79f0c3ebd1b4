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
                        normalize: bool = True) -> jnp.ndarray:
    """Second-order bending-energy penalty (3 diagonal + 3 cross second
    derivatives, spacing-normalized; loss.py:687-730).
    """
    sp = _prep_spacing(spacing, normalize)
    dims = _spatial_dims(field, normalize)
    b = field.shape[0]
    c = field.shape[-1]
    f = field
    inner = f[:, 1:-1, 1:-1, 1:-1, :]

    def flat(x):
        return x.reshape(b, -1, c)

    dd0 = flat(jnp.abs(f[:, 2:, 1:-1, 1:-1, :] + f[:, :-2, 1:-1, 1:-1, :]
                       - 2 * inner))
    dd1 = flat(jnp.abs(f[:, 1:-1, 2:, 1:-1, :] + f[:, 1:-1, :-2, 1:-1, :]
                       - 2 * inner))
    dd2 = flat(jnp.abs(f[:, 1:-1, 1:-1, 2:, :] + f[:, 1:-1, 1:-1, :-2, :]
                       - 2 * inner))
    d01 = flat(jnp.abs(f[:, 2:, 2:, 1:-1, :] + f[:, :-2, :-2, 1:-1, :]
                       - f[:, 2:, :-2, 1:-1, :] - f[:, :-2, 2:, 1:-1, :]))
    d12 = flat(jnp.abs(f[:, 1:-1, 2:, 2:, :] + f[:, 1:-1, :-2, :-2, :]
                       - f[:, 1:-1, 2:, :-2, :] - f[:, 1:-1, :-2, 2:, :]))
    d02 = flat(jnp.abs(f[:, 2:, 1:-1, 2:, :] + f[:, :-2, 1:-1, :-2, :]
                       - f[:, 2:, 1:-1, :-2, :] - f[:, :-2, 1:-1, 2:, :]))

    if norm == "L2":
        dd0 = (dd0 ** 2).mean(axis=1) * (dims * sp / sp[0] ** 2) ** 2
        dd1 = (dd1 ** 2).mean(axis=1) * (dims * sp / sp[1] ** 2) ** 2
        dd2 = (dd2 ** 2).mean(axis=1) * (dims * sp / sp[2] ** 2) ** 2
        d01 = (d01 ** 2).mean(axis=1) * (dims * sp / (sp[0] * sp[1])) ** 2
        d12 = (d12 ** 2).mean(axis=1) * (dims * sp / (sp[1] * sp[2])) ** 2
        d02 = (d02 ** 2).mean(axis=1) * (dims * sp / (sp[2] * sp[0])) ** 2

    return (dd0.mean() + dd1.mean() + dd2.mean()
            + 2 * d01.mean() + 2 * d12.mean() + 2 * d02.mean()) / 9.0


def l2_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Mean squared magnitude (loss.py:733-736)."""
    return jnp.mean(x ** 2)
