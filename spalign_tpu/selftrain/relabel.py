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
                    save_panels: bool = False,
                    save_each: bool = False,
                    prefetch: int = 2, in_flight: int = 2):
    """Predict labels for every image in ``dataset`` and stream them into
    ``out_zip``.

    dataset[i] must return (standardized image at input res, full-res gt
    label in {-1,0,1} or None); dataset.image_name(i) names the outputs.

    Software pipeline (mirrors pipeline.label_gen.process_dataset): ONE
    producer thread host-prepares ``prefetch`` batches ahead, and up to
    ``in_flight`` batches are dispatched before the oldest one's results
    are fetched — the per-batch downlink (the dominant cost for soft
    labels) overlaps the next batches' decode + device time instead of
    serializing with them (the reference funnels per-image results
    through a writer process instead, run_train_rounds.py:191-235).

    Downlink discipline: predictions are bit-packed ON DEVICE (8x
    smaller than bool; n_class=2 everywhere here) and soft scores are
    cast to ``score_dtype`` ON DEVICE before the fetch — float16 halves
    the transfer AND the zip, not just the zip.

    save_panels: write the reference's 1x3 diagnostic panel per image
    (overlay / GT / prediction, labels_from_segnet.py:97-119) into
    ``out_dir``.  Needs ``dataset.full_images`` for the raw overlay image
    (the reference reloads it from disk via PIL); panels are skipped with
    a warning when the dataset cannot provide it.

    save_each: per-image .npy files instead of the zip (reference
    --save_each, run_train_rounds.py:36 + labels_from_segnet.py:90-93),
    written next to ``out_zip`` (or into ``out_dir``).  NOTE the
    reference's own save_each writes the PRED array under the _scores
    name (:93) — a bug deliberately not reproduced: here _scores gets
    the scores.

    Returns the list of per-image eval records (empty metrics when no gt).
    """
    from spalign_tpu.pipeline.label_gen import (pack_mask_bits,
                                                unpack_mask_bits)

    apply_fn = lambda v, im, train: model.apply(v, im, train=train)
    score_jnp = jnp.dtype(np.dtype(score_dtype))

    def _predict(v, im, gt):
        labels, score = predict_labels(apply_fn, v, im,
                                       pred_shape=eval_shape,
                                       return_score=True)
        out = {"packed": pack_mask_bits(labels.astype(bool))}
        if soft_label:
            # CHW layout + target dtype ON DEVICE: the fetch moves the
            # final bytes (labels_from_segnet.py:86-95 disk layout)
            out["score"] = jnp.transpose(score, (0, 3, 1, 2)).astype(
                score_jnp)
        if gt is not None:
            out["conf"] = jax.vmap(
                lambda p, g: confusion_matrix(p, g, 2))(labels, gt)
        return out

    predict = jax.jit(_predict)

    each_dir = None
    if save_each:
        each_dir = out_dir or (os.path.dirname(out_zip) or ".")
        os.makedirs(each_dir, exist_ok=True)
        writer = None
    else:
        writer = NpzShardWriter(out_zip)
    results = ResultWriter(out_dir) if out_dir else None
    if save_panels and not (out_dir and hasattr(dataset, "full_images")):
        import warnings

        warnings.warn("save_panels needs out_dir and a dataset with "
                      "full_images(); skipping panels")
        save_panels = False
    records = []
    n = len(dataset)
    slices = [(i, min(i + batch_size, n)) for i in range(0, n, batch_size)]

    def load(sl):
        i, j = sl
        idx = list(range(i, j))
        pad = batch_size - len(idx)  # static shapes: pad the tail batch
        items = [dataset[jj] for jj in idx]
        imgs = np.stack([it[0] for it in items])
        if pad:
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
        gts = None
        if items[0][1] is not None:
            gts = np.stack([it[1] for it in items])
            if pad:
                gts = np.concatenate([gts, np.repeat(gts[-1:], pad, 0)])
        return idx, imgs, gts

    def dispatch(loaded):
        idx, imgs, gts = loaded
        batch = jnp.asarray(imgs, jnp.float32)
        # gt rides the uplink as int8 ({-1,0,1}; 4x smaller than int32)
        gt_dev = (jnp.asarray(gts.astype(np.int8))
                  if gts is not None else None)
        if mesh is not None:
            batch = shard_batch(mesh, batch)
            if gt_dev is not None:
                gt_dev = shard_batch(mesh, gt_dev)
        return predict(variables, batch, gt_dev)

    def finish(loaded, handles):
        idx, imgs, gts = loaded
        preds_np = unpack_mask_bits(np.asarray(handles["packed"]),
                                    eval_shape[1])
        scores_np = (np.asarray(handles["score"]) if soft_label else None)
        confs = (np.asarray(handles["conf"]) if "conf" in handles
                 else None)
        batch_recs = []
        for b, j in enumerate(idx):
            base = os.path.splitext(
                os.path.basename(dataset.image_name(j)))[0]
            if save_each:
                np.save(os.path.join(each_dir, base), preds_np[b])
                if soft_label:
                    np.save(os.path.join(each_dir, base + "_scores"),
                            scores_np[b])
            else:
                writer.put(base, preds_np[b])
                if soft_label:
                    # hard-label rounds skip the score members (unlike
                    # the reference, which always writes both) — they
                    # are never read and dominate the zip size
                    writer.put(base + "_scores", scores_np[b])
            rec = {"img_fn": dataset.image_name(j)}
            if confs is not None:
                rec.update(_scores_from_conf(confs[b]))
            batch_recs.append(rec)
            if save_panels:
                from spalign_tpu.utils.viz import save_prediction_panel

                save_prediction_panel(
                    out_dir, dataset.image_name(j),
                    dataset.full_images([j])[0],
                    preds_np[b],
                    gts[b] if gts is not None else None)
        records.extend(batch_recs)
        if results:
            results.append_many(batch_recs)

    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    pending = deque()
    try:
        if prefetch > 0 and len(slices) > 1:
            with ThreadPoolExecutor(max_workers=1) as ex:
                futures = deque()
                it = iter(slices)

                def submit_next():
                    sl = next(it, None)
                    if sl is not None:
                        futures.append(ex.submit(load, sl))

                for _ in range(max(1, prefetch)):
                    submit_next()
                while futures:
                    loaded = futures.popleft().result()
                    submit_next()
                    pending.append((loaded, dispatch(loaded)))
                    if len(pending) > in_flight:
                        finish(*pending.popleft())
        else:
            for sl in slices:
                loaded = load(sl)
                pending.append((loaded, dispatch(loaded)))
                if len(pending) > in_flight:
                    finish(*pending.popleft())
        while pending:
            finish(*pending.popleft())
    finally:
        if writer is not None:
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
