"""On-device evaluation metrics.

Replaces the reference's host-side numpy/scipy evaluation
(lib/evalMetrics.py: one ``scipy.spatial.distance.dice`` call per
(volume, class), segmentation.py:190-194) with a single confusion-matrix
program on device: full MindBoggle/OAI eval epochs never round-trip logits to
the host (BASELINE.json north star).

Also adds Jacobian-determinant folding statistics of deformation fields — an
eval capability the BASELINE metric requires that the reference lacks.
"""
from .confusion import (confusion_matrix, dice_from_confusion,
                        iou_from_confusion, metric_eval, multiclass_dice,
                        per_class_metrics, precision_from_confusion,
                        recall_from_confusion)
from .jacobian import jacobian_determinant, folding_stats

__all__ = [
    "confusion_matrix", "per_class_metrics", "dice_from_confusion",
    "iou_from_confusion", "recall_from_confusion", "precision_from_confusion",
    "metric_eval", "multiclass_dice", "jacobian_determinant", "folding_stats",
]
