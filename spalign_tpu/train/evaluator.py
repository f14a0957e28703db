"""Sharded evaluation: road IoU / precision / recall on a validation set.

Replaces the reference's two ChainerMN multi-node evaluators
(SemanticSegmentationEvaluator + PrecisionRecallEvaluator,
train_segnet.py:268-275): predictions run batch-sharded over the mesh,
scores are resized to eval_shape (1024x2048) on device, and only the
summed 2x2 confusion leaves the chip.
"""

from __future__ import annotations


from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from spalign_tpu.ops.metrics import confusion_matrix
from spalign_tpu.ops.resize import bilinear_resize
from spalign_tpu.parallel import shard_batch


def make_eval_step(model, eval_shape, n_class: int = 2):
    @jax.jit
    def eval_step(variables, images, labels):
        score = model.apply(variables, images, train=False)
        if tuple(score.shape[1:3]) != tuple(eval_shape):
            score = bilinear_resize(score, eval_shape, spatial_axes=(1, 2))
        pred = jnp.argmax(score, axis=-1)
        # val/main/loss analog (train_segnet.py:291-293 plots it): hard
        # softmax CE of the full-res score vs gt, ignore label < 0.
        # Returned as (sum over valid pixels, valid count) so batches of
        # any size aggregate to the exact dataset-wide mean.
        logp = jax.nn.log_softmax(score, axis=-1)
        valid = labels >= 0
        safe = jnp.where(valid, labels, 0).astype(jnp.int32)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        nll_sum = jnp.sum(jnp.where(valid, nll, 0.0))
        return (confusion_matrix(pred, labels, n_class), nll_sum,
                jnp.sum(valid))

    return eval_step


def summarize_confusion(conf: np.ndarray) -> dict:
    conf = np.asarray(conf, np.float64)
    tp, fp, fn, tn = conf[1, 1], conf[0, 1], conf[1, 0], conf[0, 0]
    return {
        "main/iou/road": tp / max(tp + fp + fn, 1),
        "main/iou/non_road": tn / max(tn + fp + fn, 1),
        "main/precision": tp / max(tp + fp, 1),
        "main/recall": tp / max(tp + fn, 1),
        "main/class_accuracy/road": tp / max(tp + fn, 1),
        "main/class_accuracy/non_road": tn / max(tn + fp, 1),
        "main/pixel_accuracy": (tp + tn) / max(conf.sum(), 1),
        # raw counts, reported alongside precision/recall like the
        # reference's PrecisionRecallEvaluator (train_segnet.py:138-141)
        "main/FP": float(fp),
        "main/FN": float(fn),
    }


class Evaluator:
    """Callable evaluator(variables) -> metrics dict over a val loader."""

    def __init__(self, model, batches_fn: Callable[[], Iterable],
                 eval_shape, mesh=None, n_class: int = 2):
        self.eval_step = make_eval_step(model, eval_shape, n_class)
        self.batches_fn = batches_fn
        self.mesh = mesh
        self.n_class = n_class

    def __call__(self, variables) -> dict:
        total = np.zeros((self.n_class, self.n_class), np.int64)
        nll_sum = 0.0
        n_valid = 0
        for images, labels in self.batches_fn():
            batch = (jnp.asarray(images, jnp.float32), jnp.asarray(labels))
            if self.mesh is not None and (
                    images.shape[0] % self.mesh.shape["data"] == 0):
                # ragged tail batches (drop_last=False) run unsharded
                batch = shard_batch(self.mesh, batch)
            conf, s, v = self.eval_step(variables, *batch)
            total += np.asarray(conf)
            nll_sum += float(s)
            n_valid += int(v)
        out = summarize_confusion(total)
        out["main/loss"] = nll_sum / max(n_valid, 1)
        return out
