"""Semantic-segmentation metrics as jit-compiled XLA ops.

Replaces chainercv.evaluations.calc_semantic_segmentation_confusion / _iou
(reference batch_spalign_kmeans.py:398-405, train_segnet.py:136-143) with a
bincount-style confusion matrix that runs on device.  Ground-truth pixels
with label < 0 ('void', reference create_label_mask
batch_spalign_kmeans.py:279-296) are ignored.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_class",))
def confusion_matrix(pred: jnp.ndarray, gt: jnp.ndarray,
                     n_class: int = 2) -> jnp.ndarray:
    """(n_class, n_class) int32 confusion with rows = gt, cols = pred.

    Matches chainercv's convention: confusion[gt, pred], gt < 0 ignored.
    Accepts any leading shape (single image or a batch).
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    gt = gt.reshape(-1).astype(jnp.int32)
    valid = gt >= 0
    idx = jnp.where(valid, gt * n_class + pred, n_class * n_class)
    if n_class * n_class <= 64:
        # one-hot compare + column sums: scatter-add lowers to a
        # serialized scatter on TPU (tens of ms over a 2 MP image),
        # while this reduction fuses into one vectorized pass
        cells = jnp.arange(n_class * n_class, dtype=jnp.int32)
        counts = jnp.sum(idx[:, None] == cells[None, :], axis=0,
                         dtype=jnp.int32)
        return counts.reshape(n_class, n_class)
    counts = jnp.zeros((n_class * n_class + 1,), jnp.int32).at[idx].add(1)
    return counts[: n_class * n_class].reshape(n_class, n_class)


def iou_from_confusion(conf: jnp.ndarray) -> jnp.ndarray:
    """Per-class IoU: diag / (rowsum + colsum - diag).

    chainercv's calc_semantic_segmentation_iou equivalent; classes absent
    from both gt and pred yield NaN (as upstream does via 0/0)."""
    conf = conf.astype(jnp.float64 if jax.config.jax_enable_x64
                       else jnp.float32)
    diag = jnp.diagonal(conf)
    denom = conf.sum(axis=0) + conf.sum(axis=1) - diag
    return diag / denom


def precision_recall_from_confusion(conf: jnp.ndarray):
    """Binary road precision/recall from a 2x2 confusion
    (reference batch_spalign_kmeans.py:400-404):
    TP = conf[1,1], FP = conf[0,1], FN = conf[1,0]."""
    conf = conf.astype(jnp.float32)
    tp = conf[1, 1]
    fp = conf[0, 1]
    fn = conf[1, 0]
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    return precision, recall


def segmentation_scores(pred, gt, n_class: int = 2) -> dict:
    """Host-friendly per-image record with the reference's result.json
    fields (road_iou, non_road_iou, precision, recall, TP, FP, FN)."""
    conf = confusion_matrix(jnp.asarray(pred), jnp.asarray(gt), n_class)
    conf_np = jax.device_get(conf)
    tp = int(conf_np[1, 1])
    fp = int(conf_np[0, 1])
    fn = int(conf_np[1, 0])
    iou = jax.device_get(iou_from_confusion(conf))
    return {
        "road_iou": float(iou[1]),
        "non_road_iou": float(iou[0]),
        "precision": float(tp / (tp + fp)) if tp + fp > 0 else None,
        "recall": float(tp / (tp + fn)) if tp + fn > 0 else None,
        "TP": tp,
        "FP": fp,
        "FN": fn,
    }
