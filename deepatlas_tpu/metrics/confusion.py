"""Confusion-matrix metrics, computed on device.

One pass builds an ``(n, n)`` confusion matrix via a bf16 one-hot matmul on
the MXU (exact: 0/1 values, f32 accumulation, counts < 2^24), scanned over
depth slices to bound the one-hot working set.  Every per-class metric
(dice, iou, recall, precision) is then O(n^2) arithmetic — versus the
reference's per-(volume, class) host loops (evalMetrics.py:35-100, called
from segmentation.py:190-194).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_class",))
def confusion_matrix(pred: jnp.ndarray, truth: jnp.ndarray,
                     n_class: int) -> jnp.ndarray:
    """Confusion counts.

    Args:
      pred, truth: integer masks of identical shape (any rank).
      n_class: number of classes.

    Returns:
      ``(n_class, n_class)`` float32 matrix; entry [t, p] counts voxels with
      truth t predicted as p.
    """
    p = pred.reshape(-1).astype(jnp.int32)
    t = truth.reshape(-1).astype(jnp.int32)
    total = p.shape[0]
    # chunk the one-hot working set to ~n_class * 2^16 bf16 elements
    chunk = 65536
    n_chunks = -(-total // chunk)
    pad = n_chunks * chunk - total
    # pad with an out-of-range class that one_hot maps to all-zero rows
    p = jnp.pad(p, (0, pad), constant_values=n_class)
    t = jnp.pad(t, (0, pad), constant_values=n_class)
    p = p.reshape(n_chunks, chunk)
    t = t.reshape(n_chunks, chunk)

    def body(acc, pt):
        pc, tc = pt
        oh_p = jax.nn.one_hot(pc, n_class, dtype=jnp.bfloat16)
        oh_t = jax.nn.one_hot(tc, n_class, dtype=jnp.bfloat16)
        acc = acc + jnp.dot(oh_t.T, oh_p,
                            preferred_element_type=jnp.float32)
        return acc, None

    init = jnp.zeros((n_class, n_class), jnp.float32)
    cm, _ = jax.lax.scan(body, init, (p, t))
    return cm


def dice_from_confusion(cm: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Per-class dice 2tp/(2tp+fn+fp) — matches scipy.spatial dice on binary
    masks (evalMetrics.py:58-68)."""
    tp = jnp.diag(cm)
    fn = cm.sum(axis=1) - tp
    fp = cm.sum(axis=0) - tp
    return (2 * tp) / (2 * tp + fn + fp + eps)


def iou_from_confusion(cm: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    tp = jnp.diag(cm)
    union = cm.sum(axis=1) + cm.sum(axis=0) - tp
    return tp / (union + eps)


def recall_from_confusion(cm: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    tp = jnp.diag(cm)
    return tp / (cm.sum(axis=1) + eps)


def precision_from_confusion(cm: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    tp = jnp.diag(cm)
    return tp / (cm.sum(axis=0) + eps)


@partial(jax.jit, static_argnames=("n_class",))
def per_class_metrics(pred: jnp.ndarray, truth: jnp.ndarray, n_class: int):
    """All four per-class metrics from one confusion pass.

    Returns a dict {dice, iou, recall, precision} of (n_class,) arrays.
    Classes absent from both pred and truth get dice/iou = 0 (0/0 guarded
    with eps in the denominator only when tp==0 would divide by zero).
    """
    cm = confusion_matrix(pred, truth, n_class)
    eps = 1e-11
    return {
        "dice": dice_from_confusion(cm, eps),
        "iou": iou_from_confusion(cm, eps),
        "recall": recall_from_confusion(cm, eps),
        "precision": precision_from_confusion(cm, eps),
    }


def metric_eval(metric: str, pred: jnp.ndarray, truth: jnp.ndarray,
                n_class: int = 2) -> jnp.ndarray:
    """Binary-metric shim matching ``metricEval`` (evalMetrics.py:17-33):
    evaluates the foreground class of a binary problem."""
    res = per_class_metrics(pred.astype(jnp.int32), truth.astype(jnp.int32),
                            n_class)
    if metric not in res:
        raise ValueError(f"Invalid evaluation metric {metric!r}")
    return res[metric][1]


@partial(jax.jit, static_argnames=("n_class",))
def multiclass_dice(pred: jnp.ndarray, truth: jnp.ndarray,
                    n_class: int, eps: float = 1e-11) -> jnp.ndarray:
    """Per-class foreground dice for a batch, matching
    ``get_multiclass_dice`` (evalMetrics.py:184-217): classes 1..n-1.

    Args:
      pred, truth: ``(B, D, H, W)`` integer masks.

    Returns:
      ``(B, n_class - 1)`` dice scores.
    """
    def one(p, t):
        cm = confusion_matrix(p, t, n_class)
        return dice_from_confusion(cm, eps)[1:]

    return jax.vmap(one)(pred, truth)
