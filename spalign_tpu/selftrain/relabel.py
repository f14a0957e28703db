"""Relabeling: a trained SegNet re-predicts pseudo-labels for the train
set (the reference's labels_from_segnet.py + run_train_rounds write
pipeline).

Reference architecture: one process per GPU predicting image-by-image,
results funneled through a multiprocessing.Queue to a writer process that
buffers EVERYTHING in RAM and emits one np.savez at the end
(run_train_rounds.py:191-235).  Here: predictions run batched (optionally
batch-sharded over the mesh), and a background writer streams each
(pred, score) pair straight into the output zip as .npy members — memory
stays bounded at the queue depth, no process tree.
"""

from __future__ import annotations

import os
import queue
import threading
import zipfile
from io import BytesIO
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spalign_tpu.eval.results import ResultWriter
from spalign_tpu.models.segnet import predict_labels
from spalign_tpu.ops.metrics import confusion_matrix
from spalign_tpu.parallel import shard_batch


class NpzShardWriter:
    """Streamed .npz-compatible writer: a zip of .npy members, written
    one at a time from a background thread (readable by numpy's np.load
    and by data.estimated._NpyZipStore)."""

    def __init__(self, path: str, depth: int = 16):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._zf = zipfile.ZipFile(path, "w", zipfile.ZIP_STORED)
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def put(self, name: str, array: np.ndarray):
        if self._err:
            raise self._err
        self._q.put((name, array))

    def _run(self):
        try:
            while True:
                item = self._q.get()
                if item is None:
                    return
                name, arr = item
                buf = BytesIO()
                np.lib.format.write_array(buf, np.asarray(arr),
                                          allow_pickle=False)
                self._zf.writestr(name + ".npy", buf.getvalue())
        except Exception as e:  # surfaced on next put/close
            self._err = e

    def close(self):
        self._q.put(None)
        self._thread.join()
        self._zf.close()
        if self._err:
            raise self._err


def relabel_dataset(model, variables, dataset, out_zip: str,
                    eval_shape=(1024, 2048), batch_size: int = 8,
                    soft_label: bool = True, mesh=None,
                    out_dir: Optional[str] = None,
                    score_dtype=np.float32,
                    save_panels: bool = False):
    """Predict labels for every image in ``dataset`` and stream them into
    ``out_zip``.

    dataset[i] must return (standardized image at input res, full-res gt
    label in {-1,0,1} or None); dataset.image_name(i) names the outputs.

    save_panels: write the reference's 1x3 diagnostic panel per image
    (overlay / GT / prediction, labels_from_segnet.py:97-119) into
    ``out_dir``.  Needs ``dataset.full_images`` for the raw overlay image
    (the reference reloads it from disk via PIL); panels are skipped with
    a warning when the dataset cannot provide it.

    Returns the list of per-image eval records (empty metrics when no gt).
    """
    apply_fn = lambda v, im, train: model.apply(v, im, train=train)

    def _predict(v, im):
        labels, score = predict_labels(apply_fn, v, im,
                                       pred_shape=eval_shape,
                                       return_score=True)
        # n_class=2 labels travel the (slow) downlink as uint8 — 4x
        # smaller than int32, lossless; scoring stays on device anyway
        return labels.astype(jnp.uint8), score

    predict = jax.jit(_predict)
    conf_fn = jax.jit(lambda p, g: jax.vmap(
        lambda pp, gg: confusion_matrix(pp, gg, 2))(p, g))

    writer = NpzShardWriter(out_zip)
    results = ResultWriter(out_dir) if out_dir else None
    if save_panels and not (out_dir and hasattr(dataset, "full_images")):
        import warnings

        warnings.warn("save_panels needs out_dir and a dataset with "
                      "full_images(); skipping panels")
        save_panels = False
    records = []
    n = len(dataset)
    try:
        for i in range(0, n, batch_size):
            idx = list(range(i, min(i + batch_size, n)))
            # static shapes under jit: pad the tail batch
            pad = batch_size - len(idx)
            items = [dataset[j] for j in idx]
            imgs = np.stack([it[0] for it in items])
            if pad:
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
            batch = jnp.asarray(imgs, jnp.float32)
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            preds, scores = predict(variables, batch)

            gts = None
            if items[0][1] is not None:
                gts = np.stack([it[1] for it in items])
                gt_dev = jnp.asarray(np.concatenate(
                    [gts, np.repeat(gts[-1:], pad, 0)]) if pad else gts)
                confs = np.asarray(conf_fn(preds, gt_dev))

            preds_np = np.asarray(preds, np.int32)
            scores_np = np.asarray(scores) if soft_label else None
            for b, j in enumerate(idx):
                base = os.path.splitext(
                    os.path.basename(dataset.image_name(j)))[0]
                writer.put(base, preds_np[b].astype(bool))
                if soft_label:
                    # CHW float scores, the reference's on-disk layout
                    # (labels_from_segnet.py:86-95).  Unlike the
                    # reference (which always writes both), hard-label
                    # rounds skip the score members — they are never
                    # read and dominate the zip size.
                    writer.put(base + "_scores",
                               scores_np[b].transpose(2, 0, 1).astype(
                                   score_dtype))
                rec = {"img_fn": dataset.image_name(j)}
                if gts is not None:
                    rec.update(_scores_from_conf(confs[b]))
                records.append(rec)
                if save_panels:
                    from spalign_tpu.utils.viz import save_prediction_panel

                    save_prediction_panel(
                        out_dir, dataset.image_name(j),
                        dataset.full_images([j])[0],
                        preds_np[b].astype(bool),
                        gts[b] if gts is not None else None)
            if results:
                results.append_many(records[-len(idx):])
    finally:
        writer.close()
    return records


def _scores_from_conf(conf) -> dict:
    tp, fp, fn = int(conf[1, 1]), int(conf[0, 1]), int(conf[1, 0])
    tn = int(conf[0, 0])
    return {
        "road_iou": tp / (tp + fp + fn) if tp + fp + fn else float("nan"),
        "non_road_iou": tn / (tn + fp + fn) if tn + fp + fn
        else float("nan"),
        "precision": tp / (tp + fp) if tp + fp else None,
        "recall": tp / (tp + fn) if tp + fn else None,
        "TP": tp, "FP": fp, "FN": fn,
    }
