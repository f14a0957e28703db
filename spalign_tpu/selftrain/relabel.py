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
from spalign_tpu.parallel import shard_batch

# jitted predict programs, shared across relabel_dataset calls: the
# rounds driver relabels once per round with the same model/shapes, and
# every recompile costs ~10s through the remote tunnel
_PREDICT_CACHE: dict = {}


def _host_confusion_remapped(pred_bool: np.ndarray,
                             gt: np.ndarray) -> np.ndarray:
    """2x2 confusion conf[gt][pred] for gt in {-1,0,1}.  Any gt outside
    {0,1} is void/ignored (the device confusion_matrix this replaces
    masked every gt < 0).  Runs on the HOST from the already-downloaded
    preds: shipping 2 MB/img of gt UP the scarce uplink for a 2x2
    result back is the wrong direction (same reasoning as
    label_gen.host_confusion).  Native one-pass C++ count (~3 ms per
    2 MP image); numpy add+bincount fallback (~26 ms)."""
    from spalign_tpu import native

    conf = native.confusion_remapped(pred_bool, gt)
    if conf is not None:
        return conf
    gt_i = np.clip(gt.astype(np.int64), -1, 2)  # void rows: -1 and 2
    idx = ((gt_i + 1) * 2 + pred_bool.astype(np.int64)).ravel()
    c = np.bincount(idx, minlength=8)
    return np.array([[c[2], c[3]], [c[4], c[5]]], np.int64)


def _one_minus(a: np.ndarray) -> np.ndarray:
    """``1 - a`` preserving dtype; f16 goes through the native 64K-LUT
    pass (bit-exact vs the numpy chain, which scalarizes f16 casts at
    ~145 ms per 2 MP plane)."""
    if a.dtype == np.float16:
        from spalign_tpu import native

        return native.one_minus_f16(a)
    return (1.0 - a.astype(np.float32)).astype(a.dtype)


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
                    prefetch: int = 2, in_flight: int = 2,
                    input_wire: str = "auto", standardize=None,
                    score_store: str = "eval"):
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

    Wire discipline (the pass is wire-bound end to end; the remote
    tunnel moves ~25-45 MB/s each way):
      * uplink (``input_wire``): the standardized float images the
        dataset hands over came from uint8 pixels via
        ``(x - mean) / std`` — so ``"u8"`` inverts that on the host,
        ships the ORIGINAL uint8 pixels (4x fewer bytes than the
        reference's float32), and re-standardizes in float32 on device:
        same math, one ulp of reassociation at most.  ``"auto"``
        (default) verifies the inversion on the first batch against
        ``standardize`` (defaults to the Cityscapes mean/std every
        dataset in this package uses) and falls back to ``"f32"`` when
        the dataset standardized differently.  ``"f16"`` is the lossy
        halfway house (measured: up to ~0.09 score shift through an
        untrained net — opt-in only).  ``"yuv420"`` recovers the uint8
        pixels like ``"u8"`` then ships BT.601 YCbCr with 2x2-subsampled
        chroma (1.5 B/px — HALF the u8 wire; pipeline/wire.py) and
        decodes + standardizes on device.  Chroma subsampling is lossy,
        so it is opt-in and gated by a prediction-agreement test vs the
        exact u8 wire (tests/test_selftrain.py) — the measured lever for
        a pass whose budget is ~85 ms/img of uplink out of ~86 total
        (docs/perf_playbook.md §5);
      * downlink: predictions are bit-packed ON DEVICE (8x smaller than
        bool) and soft scores cast to ``score_dtype`` ON DEVICE — and
        for the binary case only CHANNEL 0 is fetched: softmax scores
        sum to one, so channel 1 is reconstructed host-side as
        ``1 - ch0`` (equal to the device value up to one f16 ulp; the
        zip still stores the full (2,H,W) array the reference format
        prescribes, labels_from_segnet.py:91-95);
      * one combined device_get per batch (each separate fetch costs a
        full tunnel round trip).

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

    score_store: resolution of the stored ``*_scores`` members.
      ``"eval"`` (default) replicates the reference's disk format —
      (n_class, *eval_shape) per image (labels_from_segnet.py:91-95).
      ``"network"`` stores them at the network output resolution
      instead: the eval-res array is a deterministic bilinear upsample
      of it (pure presentation — zero information — and the training
      reader resizes scores back to the input resolution anyway,
      data/estimated.py), yet materializing it costs ~210 ms/img of
      host time on this 1-core box (upsample + f16 cast + 4x the zip
      bytes, tools/relabel_probe.py) — the difference between ~4 and
      ~8+ img/s for the whole pass.  The PRED members are identical in
      both modes.  The self-training rounds loop uses "network"
      (RoundsConfig.score_store).

    Returns the list of per-image eval records (empty metrics when no gt).
    """
    from spalign_tpu.pipeline.label_gen import (pack_mask_bits,
                                                unpack_mask_bits)

    apply_fn = lambda v, im, train: model.apply(v, im, train=train)
    score_jnp = jnp.dtype(np.dtype(score_dtype))
    n_class = 2  # binary road/non-road everywhere in this workload
    if standardize is None:
        from spalign_tpu.data.cityscapes import (CITYSCAPES_MEAN,
                                                 CITYSCAPES_STD)

        standardize = (CITYSCAPES_MEAN, CITYSCAPES_STD)
    std_mean = np.asarray(standardize[0], np.float32)
    std_std = np.asarray(standardize[1], np.float32)
    if input_wire not in ("auto", "u8", "f32", "f16", "yuv420"):
        raise ValueError(f"unknown input_wire {input_wire!r}")
    if score_store not in ("eval", "network"):
        raise ValueError(f"unknown score_store {score_store!r}")
    wire = {"mode": None if input_wire == "auto" else input_wire}

    def _resolve_wire(imgs_std: np.ndarray) -> str:
        """'auto': adopt 'u8' iff this dataset's standardization inverts
        exactly (checked once; all batches share the transform)."""
        if wire["mode"] is None:
            u8 = _to_u8(imgs_std)
            recon = (u8.astype(np.float32) - std_mean) / std_std
            err = float(np.max(np.abs(recon - imgs_std)))
            wire["mode"] = "u8" if err <= 1e-4 else "f32"
        return wire["mode"]

    def _to_u8(imgs_std: np.ndarray) -> np.ndarray:
        from spalign_tpu import native

        # one C++ pass (rint/clip/cast, bit-equal to the numpy chain it
        # falls back to; ~23 -> ~5 ms per 0.5 MP image on this host)
        return native.standardize_invert_u8(imgs_std, std_mean, std_std)

    def _predict(v, im, input_hw=None):
        if im.ndim == 2:  # yuv420 wire: packed planes, decode on device
            from spalign_tpu.pipeline.wire import decode_yuv420

            im = decode_yuv420(im, input_hw)
        if im.dtype == jnp.uint8:  # u8/yuv420 wire: standardize on device
            im = (im.astype(jnp.float32) - std_mean) / std_std
        labels, score = predict_labels(apply_fn, v, im.astype(jnp.float32),
                                       pred_shape=eval_shape,
                                       return_score=True,
                                       return_small_score=True)
        score, score_small = score
        out = {"packed": pack_mask_bits(labels.astype(bool))}
        if soft_label:
            # CHW layout + target dtype ON DEVICE: the fetch moves the
            # final bytes (labels_from_segnet.py:86-95 disk layout).
            # Binary case: channel 0 only (ch1 = 1-ch0 on the host) AND
            # at NETWORK-OUTPUT resolution — the bilinear upsample to
            # eval_shape (pure interpolation, no new information) moves
            # to the host, so the downlink carries the score's actual
            # information content, not its presentation format.  The
            # device still resizes in-program for the argmax, so the
            # stored PREDS are untouched.
            small = (score_small.shape[1:3] != score.shape[1:3])
            src = score_small if small else score
            chw = jnp.transpose(src, (0, 3, 1, 2)).astype(score_jnp)
            out["score"] = chw[:, :1] if src.shape[-1] == 2 else chw
        return out

    try:
        cache_key = (hash(model), type(model).__name__,
                     tuple(eval_shape), bool(soft_label), str(score_jnp),
                     std_mean.tobytes(), std_std.tobytes(), mesh is None)
    except TypeError:
        # an unhashable model cannot be keyed safely (id() can be
        # recycled by a later, different model) — skip caching
        cache_key = None

    # per-call fallback cache: an unhashable model cannot use the
    # module-level cache safely (recycled id()), but the program must
    # still be built ONCE PER CALL, not once per batch — each fresh
    # jax.jit wrapper has an empty trace cache and a recompile costs
    # ~10 s through the tunnel
    local_cache: dict = {}

    def _get_predict(hw):
        """The jitted program for one input resolution: the yuv420 wire
        bakes H,W into the program (the packed planes are 1-D, so the
        decode cannot infer them from the operand shape)."""
        hw = hw if wire["mode"] == "yuv420" else None
        key = cache_key + (hw,) if cache_key else hw
        store = _PREDICT_CACHE if cache_key else local_cache
        fn = store.get(key)
        if fn is None:
            fn = jax.jit(lambda v, im: _predict(v, im, input_hw=hw))
            store[key] = fn
        return fn

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
        mode = _resolve_wire(imgs)  # host wire conversion on the
        hw = imgs.shape[1:3]  # producer thread
        if mode == "yuv420":
            from spalign_tpu.pipeline.wire import pack_yuv420

            imgs_wire = pack_yuv420(_to_u8(imgs))
        else:
            imgs_wire = (_to_u8(imgs) if mode == "u8"
                         else imgs.astype(np.float16) if mode == "f16"
                         else imgs.astype(np.float32))
        gts = None
        if items[0][1] is not None:
            gts = np.stack([it[1] for it in items])
            if pad:
                gts = np.concatenate([gts, np.repeat(gts[-1:], pad, 0)])
        # hw rides the loaded tuple: a shared mutable cell here would
        # race — with prefetch>0 the producer thread loads batch k+2
        # while the main thread dispatches batch k, and the yuv420
        # program must be traced for THIS batch's resolution
        return idx, imgs_wire, gts, hw

    def dispatch(loaded):
        idx, imgs_wire, gts, hw = loaded
        batch = jnp.asarray(imgs_wire)
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        return _get_predict(hw)(variables, batch)

    def finish(loaded, got):
        idx, imgs, gts, _hw = loaded
        # drop the static-shape padding rows BEFORE the host-side work
        # below (a 1-image tail batch must not pay batch_size-1 wasted
        # full-res resizes on this 1-core host)
        preds_np = unpack_mask_bits(got["packed"],
                                    eval_shape[1])[:len(idx)]
        scores_np = (got.get("score")[:len(idx)]
                     if soft_label else None)
        if (scores_np is not None and score_store == "eval"
                and scores_np.shape[2:] != tuple(eval_shape)):
            # the device sent the network-resolution score; replicate
            # its bilinear upsample on the host (cv2 INTER_LINEAR uses
            # the same half-pixel-center convention as
            # jax.image.resize('linear'); differences are float-rounding
            # scale, below the f16 storage quantum).  score_store=
            # "network" skips this materialization entirely.
            import cv2

            scores_np = np.stack([
                np.stack([cv2.resize(scores_np[b, c].astype(np.float32),
                                     (eval_shape[1], eval_shape[0]),
                                     interpolation=cv2.INTER_LINEAR)
                          for c in range(scores_np.shape[1])])
                for b in range(scores_np.shape[0])]).astype(
                scores_np.dtype)
        if scores_np is not None and scores_np.shape[1] == 1 < n_class:
            # binary: the device sent ch0 only; ch1 = 1 - ch0 (softmax
            # sums to one; bilinear resize preserves affine sums)
            scores_np = np.concatenate(
                [scores_np, _one_minus(scores_np)], axis=1)
        confs = None
        if gts is not None:
            confs = np.stack([
                _host_confusion_remapped(preds_np[b], gts[b])
                for b in range(len(idx))])
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

    # The runtime's transfers are PULL-model: the downlink only moves
    # while a device_get is blocked on it.  Fetching on a dedicated
    # thread (ONE combined device_get per batch, submitted right after
    # dispatch) lets batch N+1's ~10 MB score downlink stream while the
    # main thread does batch N's host work (upsample, ch1, confusion,
    # zip) — device_get releases the GIL during the socket wait, so the
    # overlap is real even on this 1-core host.
    pending = deque()
    try:
        with ThreadPoolExecutor(max_workers=1) as fetcher:

            def enqueue(loaded):
                handles = dispatch(loaded)
                pending.append((loaded,
                                fetcher.submit(jax.device_get, handles)))

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
                        enqueue(loaded)
                        if len(pending) > in_flight:
                            loaded0, fut = pending.popleft()
                            finish(loaded0, fut.result())
            else:
                for sl in slices:
                    enqueue(load(sl))
                    if len(pending) > in_flight:
                        loaded0, fut = pending.popleft()
                        finish(loaded0, fut.result())
            while pending:
                loaded0, fut = pending.popleft()
                finish(loaded0, fut.result())
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
