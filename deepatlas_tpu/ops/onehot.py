"""One-hot encoding of segmentation masks.

Replaces the reference's scatter-based ``mask_to_one_hot``
(lib/transforms.py:675-689) with ``jax.nn.one_hot`` in channel-last layout
(class axis last, TPU lane-friendly for class counts near 128).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_classes", "dtype"))
def one_hot(mask: jnp.ndarray, n_classes: int,
            dtype=jnp.float32) -> jnp.ndarray:
    """One-hot encode an integer mask.

    Args:
      mask: integer array of any shape, values in [0, n_classes).
      n_classes: number of classes.

    Returns:
      ``mask.shape + (n_classes,)`` array of the given dtype.
    """
    return jax.nn.one_hot(mask.astype(jnp.int32), n_classes, dtype=dtype)
