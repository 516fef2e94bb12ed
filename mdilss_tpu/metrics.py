"""Streaming mIoU via an on-device confusion matrix.

Replaces the reference iouEval's per-batch one-hot expansion (iouEval.py:33-47
allocates B x C x H x W one-hot tensors — flagged in SURVEY.md §3 as a known
inefficiency) with a single bincount-style scatter-add into a C x C confusion
matrix computed on device, then derives tp/fp/fn with the reference's exact
ignore semantics:

  * `ignore_index` (the last class by convention, iouEval.py:10-12) is dropped
    from the per-class IoU;
  * pixels *predicted* as the ignore class count as false negatives of their
    true class, never as false positives (the reference drops the pred one-hot
    channel, iouEval.py:51);
  * pixels whose *target* is the ignore class count nowhere (iouEval.py:63).

IoU_c = tp / (tp + fp + fn + 1e-15); mIoU = mean over non-ignore classes
(iouEval.py:72-77).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(preds: jax.Array, targets: jax.Array, *, num_classes: int) -> jax.Array:
    """[N,H,W] int preds/targets -> [C, C] int32 counts, cm[target, pred]."""
    idx = targets.reshape(-1).astype(jnp.int32) * num_classes + preds.reshape(-1).astype(jnp.int32)
    return jnp.bincount(idx, length=num_classes * num_classes).reshape(num_classes, num_classes)


def iou_from_confusion(cm: np.ndarray, ignore_index: int | None):
    """Per-class IoU + mean, reference-exact ignore semantics (float64 host math)."""
    cm = np.asarray(cm, dtype=np.float64)
    tp = np.diag(cm)
    row = cm.sum(axis=1)
    col = cm.sum(axis=0)
    fn = row - tp
    if ignore_index is not None:
        fp = col - tp - cm[ignore_index, :]
        keep = np.arange(cm.shape[0]) != ignore_index
    else:
        fp = col - tp
        keep = np.ones(cm.shape[0], dtype=bool)
    iou = tp[keep] / (tp[keep] + fp[keep] + fn[keep] + 1e-15)
    return float(iou.mean()), iou


class IoUEvaluator:
    """Streaming evaluator; drop-in behavioral equivalent of iouEval.

    Matches iouEval(nClasses, ignoreIndex): ignoreIndex >= nClasses means "no
    ignore class" (iouEval.py:12). Per-batch counts are computed on device as
    int32 (a full 512x1024 batch is ~5e5 pixels, far from overflow); the
    running total accumulates on host in int64.
    """

    def __init__(self, num_classes: int, ignore_index: int | None = None):
        self.num_classes = num_classes
        if ignore_index is not None and ignore_index >= num_classes:
            ignore_index = None
        self.ignore_index = ignore_index
        self.reset()

    def reset(self):
        self._cm = np.zeros((self.num_classes, self.num_classes), dtype=np.int64)

    def add_batch(self, preds, targets):
        """preds/targets: [N,H,W] (or broadcastable) integer class maps."""
        self._cm += np.asarray(confusion_matrix(preds, targets, num_classes=self.num_classes))

    def add_confusion(self, cm):
        """Accumulate a precomputed [C,C] confusion matrix (e.g. from a jitted
        eval step that fuses argmax + bincount on device)."""
        self._cm += np.asarray(cm, dtype=np.int64)

    def get_iou(self):
        """Returns (mean IoU, per-class IoU over non-ignore classes)."""
        return iou_from_confusion(self._cm, self.ignore_index)
