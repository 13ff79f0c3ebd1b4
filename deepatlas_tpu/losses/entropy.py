"""Cross-entropy family: CE, soft CE, focal.

Reference parity notes:
  * ``cross_entropy`` — torch ``nn.CrossEntropyLoss`` semantics (mean over all
    voxels of -log softmax at the target class).
  * ``SoftCrossEntropy`` (loss.py:96-132) — probabilistic targets.
  * ``FocalLoss`` (loss.py:136-207).  Documented divergence: the reference
    computes ``probs = F.nll_loss(P, targets)`` which is ``-p_t``, so its
    modulating factor is ``(1 + p_t)^gamma`` instead of the paper's
    ``(1 - p_t)^gamma`` (loss.py:198-200).  We implement the *intended*
    standard focal loss -alpha_t (1-p_t)^gamma log(p_t).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops import one_hot


def cross_entropy_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over all voxels; logits (B, D, H, W, C), target int (B, D, H, W)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, target[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]
    return -picked.mean()


def soft_cross_entropy_loss(pred: jnp.ndarray, target: jnp.ndarray,
                            n_class: Optional[int] = None,
                            softmax: bool = False) -> jnp.ndarray:
    """CE with probabilistic targets: mean over voxels of sum_c -t_c log p_c.

    Args:
      pred: ``(B, D, H, W, C)`` logits (softmax=True) or probabilities.
      target: ``(B, D, H, W)`` integer labels or ``(B, D, H, W, C)`` probs.
    """
    if target.ndim == pred.ndim - 1:
        if n_class is None:
            n_class = pred.shape[-1]
        target = one_hot(target, n_class, dtype=pred.dtype)
    if softmax:
        logp = jax.nn.log_softmax(pred, axis=-1)
    else:
        logp = jnp.log(jnp.clip(pred, 1e-8, None))
    return jnp.mean(jnp.sum(-target * logp, axis=-1))


def focal_loss(logits: jnp.ndarray, target: jnp.ndarray,
               class_num: int, alpha: Optional[Sequence[float]] = None,
               gamma: float = 2.0, size_average: bool = True) -> jnp.ndarray:
    """Standard focal loss: -alpha_t (1 - p_t)^gamma log(p_t)."""
    t = target.astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    logp_t = jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    p_t = jnp.exp(logp_t)
    if alpha is None:
        alpha_t = jnp.ones_like(p_t)
    else:
        alpha_vec = jnp.asarray(alpha, dtype=logits.dtype).reshape(-1)
        alpha_t = alpha_vec[t]
    loss = -alpha_t * (1.0 - p_t) ** gamma * logp_t
    return loss.mean() if size_average else loss.sum()
