"""Label generation: the whole-image road-mask program, TPU-first.

Reference pipeline (batch_spalign_kmeans.py): DRN features -> CPU
superpixels -> per-superpixel Python align loop -> host prior -> GPU
k-means -> host upsample/score/save, with HOST<->GPU transfers at every
stage (SURVEY.md §3.1).

Here everything between image batch and per-image confusion matrix is ONE
jit-compiled device program:

    images (B,h,w,3) ----> DRN-C-26 -> concat maps     (MXU convs)
    superpixels (B,h,w) -> align -> prior -> joint weighted k-means
                        -> painted masks -> (optional) full-res confusion

Only the superpixel frontend may touch the host (felzenszwalb mode, or
SLIC with the skimage-parity connectivity pass); in the TPU-native fast
path (slic_enforce_connectivity=False) even SLIC runs INSIDE the fused
program and the only upload is the uint8 image batch.  Scoring
downloads the small clustering-resolution masks BIT-PACKED
(pack_mask_bits; the downlink is the next-scarcest resource after the
uplink) and runs on the host.  Saving masks/images is optional and off
the hot path.

The host loop is a three-thread software pipeline: a producer thread
prepares (decodes, segments, uploads) `prefetch` batches ahead, the
consumer keeps `in_flight` batches of device programs dispatched before
blocking on the oldest batch's results, and a fetcher thread issues each
unit's ONE combined device_get right after its dispatch — transfers are
PULL-model on this runtime (the downlink only moves while a device_get
blocks on it), so the dedicated fetch lets unit N+1's mask downlink
stream under unit N's host scoring/save work (perf_playbook §7).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spalign_tpu.config import LabelGenConfig, flatten
from spalign_tpu.data.labels import create_label_mask
from spalign_tpu.eval.results import ResultWriter
from spalign_tpu.models.drn import DRN_FACTORIES, preprocess_imagenet
from spalign_tpu.ops.align import superpixel_align
from spalign_tpu.ops.kmeans import (paint_clusters, weighted_kmeans,
                                    weighted_kmeans_dynamic)
from spalign_tpu.ops.metrics import confusion_matrix
from spalign_tpu.ops.prior import pixel_prior
from spalign_tpu.ops.resize import nn_resize_cv2
from spalign_tpu.ops.segments import segment_mean
from spalign_tpu.pipeline.superpixels import compute_superpixels
from spalign_tpu.utils.timers import StageTimer


def build_feature_fn(model, variables, use_maps):
    """(B,h,w,3) float RGB 0..255 -> (B,hf,wf,C) concatenated DRN maps."""

    def features(images):
        x = preprocess_imagenet(images)
        _, maps = model.apply(variables, x, train=False)
        return jnp.concatenate([maps[i] for i in use_maps], axis=-1)

    return features


def _align_and_prior(feature_maps, superpixels, key, n_anchors, s,
                     append_pos, prior_params, pos_scale=1.0):
    """Shared prefix of the fused programs: per-superpixel aligned
    features + segment-mean Gaussian prior.  Returns (feats (B,S,C'),
    valid (B,S), prior (B,S), k_seed).  pos_scale: image pixels per
    superpixel-map pixel (d when the map is at 1/d resolution)."""
    b, h, w = superpixels.shape
    k_align, k_seed = jax.random.split(key)
    align_keys = jax.random.split(k_align, b)
    feats, valid = jax.vmap(
        lambda fm, sp, kk: superpixel_align(
            fm, sp, kk, n_anchors, s, append_pos, pos_scale)
    )(feature_maps, superpixels, align_keys)  # (B,S,C'), (B,S)

    prior_pix = pixel_prior(h, w, *prior_params)  # (h,w) static
    prior = jax.vmap(
        lambda sp: segment_mean(prior_pix.reshape(-1), sp.reshape(-1), s)
    )(superpixels)  # (B,S)
    return feats, valid, prior, k_seed


def _paint(superpixels, res, b, s, max_id):
    assign = res.assignment.reshape(b, s)
    cluster_maps = paint_clusters(superpixels, assign, max_id=max_id)
    return cluster_maps == 0, cluster_maps, assign


@partial(jax.jit, static_argnames=("n_anchors", "num_segments",
                                   "append_pos", "k", "n_iter",
                                   "prior_params", "pos_scale"))
def spalign_cluster(feature_maps, superpixels, key, *, n_anchors: int,
                    num_segments: int, append_pos: bool, k: int,
                    n_iter: int, prior_params, pos_scale: float = 1.0):
    """The fused align+prior+k-means device program (no feature extractor;
    composable with any feature fn so baselines share it).

    Args:
      feature_maps: (B, hf, wf, C) float.
      superpixels: (B, h, w) int32, per-image contiguous ids.  May be at
        1/d of the image resolution (fused-SLIC downscale) — pass
        pos_scale=d so the appended center of mass stays in image units.
      key: PRNG key (anchor sampling + k-means seeding shuffle).
      prior_params: (y_rel_pos, x_rel_pos, y_rel_sigma, x_rel_sigma).

    Returns: road_masks (B,h,w) bool, cluster_maps (B,h,w) int32,
      assignment (B,S) int32, kmeans diagnostics.
    """
    superpixels = superpixels.astype(jnp.int32)  # may arrive narrower
    b = superpixels.shape[0]
    s = num_segments
    feats, valid, prior, k_seed = _align_and_prior(
        feature_maps, superpixels, key, n_anchors, s, append_pos,
        prior_params, pos_scale)
    res = weighted_kmeans(feats.reshape(b * s, -1), prior.reshape(-1),
                          valid.reshape(-1), k_seed, k=k, n_iter=n_iter)
    road_masks, cluster_maps, assign = _paint(superpixels, res, b, s, k)
    return road_masks, cluster_maps, assign, res


@partial(jax.jit, static_argnames=("n_anchors", "num_segments",
                                   "append_pos", "k_max", "n_iter",
                                   "prior_params", "pos_scale"))
def spalign_cluster_dynamic(feature_maps, superpixels, key, k, *,
                            n_anchors: int, num_segments: int,
                            append_pos: bool, k_max: int, n_iter: int,
                            prior_params, pos_scale: float = 1.0):
    """``spalign_cluster`` with a RUNTIME cluster count ``k`` (traced
    scalar <= k_max): one compiled program serves a whole k-ablation
    sweep (reference utils/dmux/run_exp_fig-7.sh re-ran the pipeline per
    k; here only the first value compiles)."""
    superpixels = superpixels.astype(jnp.int32)
    b = superpixels.shape[0]
    s = num_segments
    feats, valid, prior, k_seed = _align_and_prior(
        feature_maps, superpixels, key, n_anchors, s, append_pos,
        prior_params, pos_scale)
    res = weighted_kmeans_dynamic(
        feats.reshape(b * s, -1), prior.reshape(-1), valid.reshape(-1),
        k_seed, k, k_max=k_max, n_iter=n_iter)
    road_masks, cluster_maps, assign = _paint(superpixels, res, b, s,
                                              k_max)
    return road_masks, cluster_maps, assign, res


@partial(jax.jit, static_argnames=("full_hw",))
def score_full_res(road_masks, label_ids_full, full_hw):
    """Upsample masks NN (cv2 convention) to full resolution and compute
    per-image 2x2 confusion matrices on device.

    label_ids_full: RAW Cityscapes labelIds (uint8) — remapped to
    {-1, 0, 1} on device, so only compact uint8 labels go up and (B,2,2)
    ints come down."""
    from spalign_tpu.data.labels import remap_label_ids

    up = nn_resize_cv2(road_masks.astype(jnp.int32), full_hw)  # (B,H,W)
    gt = remap_label_ids(label_ids_full)
    return jax.vmap(lambda p, g: confusion_matrix(p, g, 2))(up, gt)


# labelIds -> confusion code: void (0..6) -> 0, road (7) -> 2, other -> 1
_CONF_LUT = np.zeros(256, np.uint8)
_CONF_LUT[8:] = 1
_CONF_LUT[7] = 2


def host_confusion(road_mask: np.ndarray,
                   label_ids_full: np.ndarray) -> np.ndarray:
    """Host-side equivalent of one image of :func:`score_full_res`
    (bit-identical: nn_resize_cv2 implements the cv2 NN convention).

    On remote-attached TPUs, uploads dominate (~40 ms fixed + limited
    bandwidth) while downloads are cheap — so shipping 2 MB/img of raw
    labelIds up just to get a 2x2 matrix back is the wrong direction.
    The hot loop downloads the small clustering-resolution masks and
    scores here instead, off the serialized device channel.

    Implementation: the native one-pass C++ scorer
    (native.confusion_vs_labelids — fused NN-upsample + remap + count,
    ~4 ms per 2 MP image); numpy fallback: uint8 LUT gather + bincount
    over ``code*2 + pred`` (~22 ms — this was the bottleneck of every
    GT-scored run: 41 img/s scored vs 560 unscored before the C++ op).
    """
    from spalign_tpu import native

    conf = native.confusion_vs_labelids(road_mask, label_ids_full)
    if conf is not None:
        return conf
    import cv2

    h, w = label_ids_full.shape
    pred = road_mask.astype(np.uint8)
    if pred.shape != (h, w):
        pred = cv2.resize(pred, (w, h), interpolation=cv2.INTER_NEAREST)
    idx = _CONF_LUT[label_ids_full] * 2 + pred  # uint8, values 0..5
    c = np.bincount(idx.ravel(), minlength=6)
    return np.array([[c[2], c[3]], [c[4], c[5]]], np.int64)


def pack_mask_bits(mask_bool: jnp.ndarray) -> jnp.ndarray:
    """(..., W) bool -> (..., ceil(W/8)) uint8, np.unpackbits bit order.

    Masks leave the chip 8x smaller: on remote-attached TPUs the
    downlink runs ~25 MB/s, so a 30-image bool batch costs ~60 ms —
    packed it is ~8 ms.  Host side: ``unpack_mask_bits``."""
    w = mask_bool.shape[-1]
    pad = (-w) % 8
    if pad:
        mask_bool = jnp.pad(
            mask_bool, [(0, 0)] * (mask_bool.ndim - 1) + [(0, pad)])
    m = mask_bool.reshape(*mask_bool.shape[:-1], -1, 8).astype(jnp.int32)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return jnp.sum(m * weights, axis=-1).astype(jnp.uint8)


def unpack_mask_bits(packed: np.ndarray, w: int) -> np.ndarray:
    """Host inverse of :func:`pack_mask_bits` -> (..., w) bool."""
    bits = np.unpackbits(packed, axis=-1)
    return bits[..., :w].astype(bool)


class LabelGeneratorBase:
    """Shared host loop for the three label-generation modes
    (spalign / direct / overlaps).  Subclasses implement run_batch."""

    needs_full_images = False
    in_flight = 2  # batches dispatched ahead of the blocking fetch
    fetch_ahead = True  # combined device_get on a dedicated thread

    def __init__(self, cfg: LabelGenConfig, variables=None,
                 model_name: str = "drn_c_26", seed: Optional[int] = None,
                 mesh=None, dynamic_k: Optional[int] = None):
        """mesh: optional jax.sharding.Mesh with a 'data' axis — the
        clustering batch shards over it (images, superpixels, aligned
        features); the joint k-means' reductions become cross-chip
        collectives under jit.  Replaces the reference's index-range GPU
        fan-out scripts (utils/create_val_labels.sh) with one sharded
        program.

        dynamic_k: compile the k-means for up to ``dynamic_k`` clusters
        with the actual count a RUNTIME value — ``set_n_clusters`` then
        switches k without recompiling (the fig-7 sweep lever)."""
        self.cfg = cfg
        self.mesh = mesh
        self.dynamic_k = dynamic_k
        self._validate_wire(cfg)
        if dynamic_k is not None and cfg.kmeans.n_clusters > dynamic_k:
            raise ValueError(
                f"n_clusters={cfg.kmeans.n_clusters} > dynamic_k bound "
                f"{dynamic_k}")
        # model_dtype='bfloat16' runs the conv stack on the MXU in bf16
        # (params stay f32; k-means always accumulates in f32)
        dtype = _effective_model_dtype(cfg)
        self._model_name = model_name
        self.model = DRN_FACTORIES[model_name](out_map=True,
                                               out_middle=True, dtype=dtype)
        if variables is None:
            variables = self.model.init(
                jax.random.key(0),
                jnp.zeros((1, *cfg.resize_shape, 3), jnp.float32))
        self.variables = variables
        self.features = jax.jit(build_feature_fn(
            self.model, self.variables, cfg.use_feature_maps))
        self._fused = None  # built lazily by subclasses
        # per-batch PRNG seeds are drawn on the HOST and folded into a
        # jax key inside the fused program: a host integer rides the
        # dispatch for free, while jax.random.split on a device-resident
        # key would be one extra device round trip per batch
        self._seed_rng = np.random.RandomState(
            cfg.kmeans.seed if seed is None else seed)
        # bit-parity mode's replicas of the reference's process-global
        # RNGs (random.seed/np.random.seed(1111),
        # batch_spalign_kmeans.py:33-35): numpy stream = k-means init
        # (:148), python stream = per-superpixel anchor shuffle (:232)
        self._parity_rng = np.random.RandomState(
            cfg.kmeans.seed if seed is None else seed)
        import random as _pyrandom

        self._parity_pyrng = _pyrandom.Random(
            cfg.kmeans.seed if seed is None else seed)
        p = cfg.prior
        self._prior_params = (p.y_rel_pos, p.x_rel_pos, p.y_rel_sigma,
                              p.x_rel_sigma)
        # set by process_dataset while its fetcher thread is live
        self._fetcher = None

    def _put(self, host_array):
        """Upload a batch-leading array, sharded over the mesh when one
        is configured."""
        arr = np.ascontiguousarray(host_array)
        if self.mesh is None:
            return jnp.asarray(arr)
        from spalign_tpu.parallel import data_sharding

        return jax.device_put(arr, data_sharding(self.mesh))

    def _put_images(self, images_uint8):
        """Upload a resized image batch in the configured wire format
        (pipeline/wire.py): yuv420 halves the bytes on the scarce
        uplink; the device program inverts it via _wire_decode."""
        if self.cfg.upload_format == "yuv420":
            from spalign_tpu.pipeline.wire import pack_yuv420

            return self._put(pack_yuv420(np.ascontiguousarray(
                images_uint8)))
        return self._put(images_uint8)

    def _wire_decode(self, imgs):
        """In-program inverse of _put_images (identity for rgb8)."""
        if self.cfg.upload_format == "yuv420":
            from spalign_tpu.pipeline.wire import decode_yuv420

            return decode_yuv420(imgs, self.cfg.resize_shape)
        return imgs

    def _validate_wire(self, cfg):
        if cfg.upload_format == "rgb8":
            return
        if cfg.upload_format != "yuv420":
            raise ValueError(f"unknown upload_format {cfg.upload_format}")
        h, w = cfg.resize_shape
        fused_sp = (cfg.mode == "spalign" and _fused_superpixels(cfg))
        if h % 2 or w % 2:
            raise ValueError("yuv420 needs even resize_shape")
        if cfg.kmeans.init == "reference":
            raise ValueError("parity mode is bit-exact from raw RGB; "
                             "yuv420 is lossy — use rgb8")
        if cfg.mode == "spalign" and not fused_sp:
            raise ValueError(
                "yuv420 on the spalign path needs the fused-SLIC "
                "frontend (host superpixel engines consume the raw "
                "device images)")

    def _next_seed(self) -> np.uint32:
        return np.uint32(self._seed_rng.randint(0, 2 ** 31))

    def _unit_seeds(self, prepared) -> np.ndarray:
        """One seed per clustering group, drawn in group order from the
        sequential stream — the same seeds G single-group dispatches
        would have consumed."""
        g = int(prepared.get("n_groups", 1))
        return np.asarray([self._next_seed() for _ in range(g)],
                          np.uint32)

    # --- sweep support: swap config values without rebuilding programs ---

    def _program_fields(self, cfg):
        """The config fields BAKED INTO the compiled programs; a
        reconfigure that changes none of them keeps every compiled
        program (host-side fields — superpixel engine parameters,
        batchsize, output paths, overlap_threshold — are free to vary)."""
        sp = cfg.superpixel
        # the fused program bakes the SLIC grid size, which depends on
        # BOTH the segment request and the image shape (slic_grid_size)
        sp_baked = ((sp.method, sp.n_slic_segments, sp.slic_compactness,
                     sp.slic_iters, cfg.resize_shape,
                     _fused_downscale(cfg))
                    if _fused_superpixels(cfg) else (sp.max_superpixels,))
        # n_clusters is a runtime value ONLY on the dynamic-k device
        # path; the parity path (init='reference') always bakes it into
        # stage_b's closure, so it must invalidate programs there
        k_baked = (None if (self.dynamic_k is not None
                            and cfg.kmeans.init == "device")
                   else cfg.kmeans.n_clusters)
        return (cfg.mode, cfg.use_feature_maps, cfg.align,
                cfg.kmeans.n_iter, cfg.kmeans.init, cfg.prior,
                sp_baked, _effective_model_dtype(cfg), k_baked,
                cfg.upload_format)

    def reconfigure(self, cfg: LabelGenConfig):
        """Adopt a new config, invalidating compiled programs only when a
        program-baked field changed.  Replaces the reference's one-
        process-per-configuration sweep scripts (utils/dmux/*): with
        minutes-long tunnel compiles, sharing the compiled program across
        a sweep is the difference between minutes and hours."""
        if (self.dynamic_k is not None
                and cfg.kmeans.n_clusters > self.dynamic_k):
            raise ValueError(
                f"n_clusters={cfg.kmeans.n_clusters} > dynamic_k bound "
                f"{self.dynamic_k}")
        self._validate_wire(cfg)
        if self._program_fields(cfg) != self._program_fields(self.cfg):
            self._fused = None
            self._parity = None
            if (_effective_model_dtype(cfg)
                    != _effective_model_dtype(self.cfg)):
                # the feature extractor's compute dtype is fixed at
                # module construction — rebuild it (params are shared;
                # they stay f32 in both modes)
                self.model = DRN_FACTORIES[self._model_name](
                    out_map=True, out_middle=True,
                    dtype=_effective_model_dtype(cfg))
                self.features = jax.jit(build_feature_fn(
                    self.model, self.variables, cfg.use_feature_maps))
        self.cfg = cfg
        p = cfg.prior
        self._prior_params = (p.y_rel_pos, p.x_rel_pos, p.y_rel_sigma,
                              p.x_rel_sigma)

    def set_n_clusters(self, k: int):
        """Change the k-means cluster count.  Free (no recompile) when
        the generator was built with ``dynamic_k``."""
        import dataclasses

        self.reconfigure(dataclasses.replace(
            self.cfg,
            kmeans=dataclasses.replace(self.cfg.kmeans, n_clusters=k)))

    def n_program_traces(self) -> int:
        """Number of times the fused program has been traced/compiled
        (sweep logging; -1 when unavailable)."""
        try:
            return int(self._fused._cache_size()) if self._fused else 0
        except Exception:
            return -1

    def _host_prepare(self, images_uint8, full_images, timers) -> dict:
        """Host+transfer work for one batch (image upload, superpixels,
        ...).  Runs on the PREFETCH thread in process_dataset, so it
        overlaps the device programs of the previous batch."""
        return {"imgs_dev": self._put_images(images_uint8)}

    def dispatch_batch(self, prepared, timers) -> dict:
        """Enqueue this batch's device programs WITHOUT blocking; returns
        a dict of device-array handles for finish_batch.  The
        dispatch/finish split keeps multiple batches in flight on the
        device (see process_dataset)."""
        raise NotImplementedError

    def finish_batch(self, prepared, handles, timers):
        """Block on this batch's results (rare retries happen here).

        Returns (road_masks device (B,h,w) bool, cluster_maps device
        (B,h,w) int32, diagnostics dict)."""
        raise NotImplementedError

    def _build_fetch(self, handles):
        """The unit's ONE combined device_get: (arrays, extra_names,
        n_scalars).  got[:n_scalars] are the diag/retry scalars;
        got[n_scalars:] land in handles under extra_names."""
        raise NotImplementedError

    def _submit_fetch(self, handles):
        """Submit the combined device_get on the fetcher thread right
        after dispatch.  Transfers are PULL-model on this runtime — the
        downlink only moves while a device_get blocks on it — so a
        dedicated fetch thread lets unit N+1's mask downlink stream
        underneath unit N's host scoring/save work (device_get releases
        the GIL on the socket wait; real even on a 1-core host).
        Measured on relabel: 3.3 -> 4.2 img/s (perf_playbook §7)."""
        if self._fetcher is None or not self.fetch_ahead:
            return
        fetch, extra, n_scalars = self._build_fetch(handles)
        handles["_fetch"] = (extra, n_scalars,
                             self._fetcher.submit(jax.device_get, fetch))

    def _landed_fetch(self, handles):
        """Resolve the unit's combined fetch: the pre-submitted future
        when process_dataset's fetcher is live, a synchronous device_get
        otherwise (run_batch path, and retry re-dispatches)."""
        pre = handles.pop("_fetch", None)
        if pre is not None:
            extra, n_scalars, fut = pre
            return fut.result(), extra, n_scalars
        fetch, extra, n_scalars = self._build_fetch(handles)
        return jax.device_get(fetch), extra, n_scalars

    def run_batch(self, images_uint8, timers=None, full_images=None,
                  prepared=None):
        """Synchronous single-batch API: host-prepare + dispatch + finish.

        images_uint8: (B,h,w,3) RGB at cfg.resize_shape.
        Returns (road_masks (B,h,w) bool, cluster_maps int32,
        diagnostics dict, StageTimer)."""
        timers = timers or StageTimer()
        if prepared is None:
            prepared = self._host_prepare(images_uint8, full_images,
                                          timers)
        handles = self.dispatch_batch(prepared, timers)
        road, cluster, diag = self.finish_batch(prepared, handles, timers)
        per_group = diag.pop("_per_group", None)
        if per_group:
            # single-batch API: scalar diagnostics for the one group
            diag.update({k: (v[0] if len(v) == 1 else v)
                         for k, v in per_group.items()})
        return road, cluster, diag, timers

    def process_dataset(self, dataset, start_index: int = 0,
                        end_index: Optional[int] = None,
                        save: Optional[bool] = None,
                        writer: Optional[ResultWriter] = None,
                        prefetch: int = 2,
                        skip_done: Optional[set] = None):
        """Iterate a dataset of (img_uint8_full, label_ids) pairs in
        clustering batches, mirroring the reference main loop (including
        its keep-the-batchsize tail overlap, :538-544).

        Batches are host-prepared (decode, superpixels, uploads) on a
        background thread `prefetch` batches ahead, so host stages of
        batch N+1 hide behind device programs of batch N — the software
        pipeline replacing the reference's process-per-GPU fan-out.

        Returns the list of per-image records."""
        cfg = self.cfg
        n = len(dataset)
        end_index = n if end_index is None else min(end_index, n)
        save = cfg.save_masks if save is None else save
        if writer is None and (save or cfg.save_images):
            writer = ResultWriter(cfg.out_dir)

        slices = []
        bs = cfg.batchsize
        i = start_index
        while i < end_index:
            if i + bs >= end_index and end_index - bs >= 0:
                i = max(start_index, end_index - bs)
                j = end_index
            else:
                j = min(i + bs, end_index)
            slices.append((i, j))
            i = j

        if skip_done:
            # crash-restart support: drop batches whose images were all
            # processed in a previous run (reference restarts relied on
            # manual --start_index bookkeeping)
            slices = [
                (i, j) for i, j in slices
                if not all(_name(dataset, "image_name", idx) in skip_done
                           for idx in range(i, j))]

        # Fuse up to groups_per_dispatch consecutive clustering batches
        # into one device dispatch (per-group semantics and the seed
        # stream match G separate dispatches exactly).  Parity init
        # stays one group per dispatch: its host-side seed-1111 init
        # consumes the reference's sequential RNG stream per batch.
        groups = max(1, cfg.groups_per_dispatch)
        if cfg.kmeans.init == "reference":
            groups = 1
        units = [slices[x:x + groups]
                 for x in range(0, len(slices), groups)]

        # Software pipeline, two overlapping windows:
        #   * `prefetch` units of HOST lookahead (decode, superpixels,
        #     uploads) on the producer thread;
        #   * `in_flight` units of DEVICE lookahead: dispatch unit N+1's
        #     programs before blocking on unit N's results, so the
        #     per-unit fetch round-trip (the retry predicate + scores)
        #     never leaves the device channel idle.
        records = []
        # finish_batch rides the small cluster maps on its combined
        # fetch only when the save path will consume them
        self._want_cluster_np = bool(save or cfg.save_images)
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        pending = deque()
        try:
            # dedicated fetch thread: each unit's combined device_get is
            # submitted right after its dispatch (see _submit_fetch)
            with ThreadPoolExecutor(max_workers=1) as fetcher:
                self._fetcher = fetcher
                for item in self._prefetched(dataset, units, prefetch):
                    handles = self.dispatch_batch(item[4], item[5])
                    self._submit_fetch(handles)
                    pending.append((item, handles))
                    if len(pending) > self.in_flight:
                        records.extend(self._finish_loaded(
                            dataset, *pending.popleft(), save=save,
                            writer=writer))
                while pending:
                    records.extend(self._finish_loaded(
                        dataset, *pending.popleft(), save=save,
                        writer=writer))
        finally:
            self._fetcher = None
        return records

    def _load_unit(self, dataset, unit):
        """Load one dispatch unit (a list of clustering-batch slices)."""
        indices = [idx for (i, j) in unit for idx in range(i, j)]
        timers = StageTimer()
        with timers.stage("load"):
            imgs, labels = _load_batch(dataset, indices,
                                       self.cfg.resize_shape)
            full_images = (_load_full_images(dataset, indices)
                           if self.needs_full_images else None)
        prepared = self._host_prepare(imgs, full_images, timers)
        prepared["n_groups"] = len(unit)
        return (indices, imgs, labels, full_images, prepared, timers)

    def _prefetched(self, dataset, slices, depth):
        """Host-prepare batches up to ``depth`` ahead on one background
        thread (results consumed in order).  Host preparation —
        superpixels, union-find, transfers — is the pipeline's critical
        path (~0.5 s/batch vs ~0.15 s of device programs on v5e), so
        hiding it behind the consumer's device waits is the main
        throughput lever."""
        if depth <= 0 or len(slices) <= 1:
            for unit in slices:
                yield self._load_unit(dataset, unit)
            return
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        # ONE producer thread with `depth` units of lookahead: measured
        # on the v5e tunnel, concurrent producers contend on the
        # serialized device channel and are strictly slower
        with ThreadPoolExecutor(max_workers=1) as ex:
            it = iter(slices)
            futures = deque()

            def submit_next():
                try:
                    unit = next(it)
                except StopIteration:
                    return
                futures.append(ex.submit(self._load_unit, dataset, unit))

            for _ in range(depth):
                submit_next()
            while futures:
                item = futures.popleft().result()
                submit_next()
                yield item

    def _finish_loaded(self, dataset, item, handles, *, save, writer):
        cfg = self.cfg
        indices, imgs, labels, full_images, prepared, timers = item
        road, cluster, diag = self.finish_batch(prepared, handles, timers)
        per_group = diag.pop("_per_group", None)
        group_size = len(indices) // int(prepared.get("n_groups", 1))

        records = []
        road_np = None
        if labels is not None or save:
            # the small clustering-resolution masks come DOWN
            # (bit-packed when the program provides them) and everything
            # downstream — scoring AND full-res saving — derives from
            # them on the host
            # packed masks may ride the wire at 1/u resolution (overlaps
            # slic_device_downscale: they are u x u block-constant, so
            # host np.repeat reconstructs the full-res mask bit-equal at
            # u^2 fewer downlink bytes)
            u = int(handles.get("packed_upscale", 1))
            if "road_packed_np" in handles:
                # already landed by finish_batch's combined fetch
                road_np = unpack_mask_bits(handles["road_packed_np"],
                                           road.shape[-1] // u)
            elif "road_np" in handles:  # landed unpacked (direct mode)
                road_np = handles["road_np"]
            elif "road_packed" in handles:
                road_np = unpack_mask_bits(
                    np.asarray(handles["road_packed"]),
                    road.shape[-1] // u)
            else:
                road_np = np.asarray(road)
            if u > 1 and road_np.shape[-1] != road.shape[-1]:
                road_np = road_np.repeat(u, axis=1).repeat(u, axis=2)
        if labels is not None:
            # labels are RAW labelIds (dataset convention) — uploading
            # 2 MB/img of labelIds for a 2x2 result would eat the scarce
            # up-link (see host_confusion)
            with timers.stage("score"):
                # serial on purpose: the LUT+bincount kernel is
                # GIL-bound, measured slower under a thread pool
                confs = [host_confusion(r, l)
                         for r, l in zip(road_np, labels)]
        else:
            confs = [None] * len(indices)

        if save:
            import cv2

            out_hw = (tuple(labels.shape[1:]) if labels is not None
                      else tuple(road_np.shape[1:]))
            # full-res masks are a deterministic NN upsample of the
            # small masks already on the host: replicate it with cv2
            # (nn_resize_cv2 IS the cv2 convention, bit-identical —
            # tests/test_ops_core.py) instead of downloading ~4 MB/img
            # of device-upsampled uint8 (the old save path's dominant
            # cost: ~120 MB/batch on a ~25 MB/s downlink)
            cluster_np = handles.get("cluster_np")
            if cluster_np is None:
                cluster_np = np.asarray(handles.get("cluster", cluster))

            def _up(arr):  # road may be full-res already (overlaps)
                if tuple(arr.shape[1:]) == out_hw:
                    return arr.astype(np.uint8)
                return np.stack([cv2.resize(
                    a.astype(np.uint8), (out_hw[1], out_hw[0]),
                    interpolation=cv2.INTER_NEAREST) for a in arr])

            up_road, up_cluster = _up(road_np), _up(cluster_np)
            os.makedirs(cfg.out_dir, exist_ok=True)

        times = timers.finish()
        cfg_flat = flatten(cfg)  # invariant across the unit; hoisted
        for b, idx in enumerate(indices):
            img_fn = _name(dataset, "image_name", idx)
            rec = {"img_fn": img_fn,
                   "label_fn": _name(dataset, "label_name", idx)}
            if confs[b] is not None:
                rec.update(_confusion_record(confs[b]))
            rec.update(cfg_flat)
            rec.update(times)
            rec.update(diag)
            if per_group:
                gi = min(b // group_size, len(next(iter(
                    per_group.values()))) - 1)
                rec.update({k: v[gi] for k, v in per_group.items()})
            records.append(rec)
            if save:
                base = os.path.splitext(os.path.basename(img_fn))[0]
                np.save(os.path.join(cfg.out_dir, base),
                        up_road[b].astype(np.uint8))
                np.save(os.path.join(cfg.out_dir, base + "_all_cluster"),
                        up_cluster[b].astype(np.uint8))
                if labels is None:
                    # no-GT mode also writes the raw 0/1 mask as a PNG,
                    # the format the demo-video compositor consumes
                    # (reference utils/apply_spalign_kmeans.py:70-71)
                    import cv2

                    cv2.imwrite(
                        os.path.join(cfg.out_dir,
                                     os.path.basename(img_fn)),
                        up_road[b].astype(np.uint8))
                if cfg.save_images and labels is not None:
                    # panel shares the mask PNG's filename, so it only
                    # exists in the GT mode — exactly the reference split
                    # (batch_spalign_kmeans.py:361-387 writes panels,
                    # apply_spalign_kmeans.py writes raw masks)
                    from spalign_tpu.utils.viz import save_diagnostic_panel

                    panel_img = _load_full_images(dataset, [idx])[0]
                    save_diagnostic_panel(
                        cfg.out_dir, img_fn, panel_img,
                        up_road[b], up_cluster[b],
                        create_label_mask(np.asarray(labels[b])))
        if writer is not None:
            writer.append_many(records)
        return records


def _effective_model_dtype(cfg: LabelGenConfig):
    """Feature-extractor compute dtype (flax ``dtype=``; None = f32).

    Bit-parity mode (kmeans.init='reference') pins f32 regardless of
    cfg.model_dtype: its contract is bit-equality with the reference's
    f32/f64 host math, which bf16 convs cannot honor."""
    if cfg.kmeans.init == "reference":
        return None
    return {"float32": None, "bfloat16": jnp.bfloat16}[cfg.model_dtype]


def _fused_superpixels(cfg: LabelGenConfig) -> bool:
    """True when SLIC runs INSIDE the fused program (TPU-native fast
    path): one dispatch per batch, zero host superpixel work.  Requires
    slic_enforce_connectivity=False (the host union-find is the only
    host stage of the SLIC frontend) and the fully fused device init
    (parity mode needs host superpixel maps for its float64 prior)."""
    return (cfg.superpixel.method == "slic"
            and not cfg.superpixel.slic_enforce_connectivity
            and cfg.kmeans.init == "device")


def _fused_downscale(cfg: LabelGenConfig) -> int:
    """Superpixel-map downscale d of the fused spalign program (1 =
    full resolution).  At d>1 SLIC and everything downstream of the
    superpixel map — anchors, prior, painting, the mask product — run
    at 1/d resolution while the DRN keeps the full-resolution frames.
    The dense SLIC sweep is HBM-bound on its (HW, K) materialization at
    ~95% of the v5e's bandwidth peak (docs/label_profile.md §2), so
    shrinking HW is the only remaining lever; quality-gated like the
    overlaps-mode downscale (tests/test_pipeline_e2e.py)."""
    d = cfg.superpixel.slic_device_downscale
    return d if (cfg.mode == "spalign" and _fused_superpixels(cfg)
                 and d > 1) else 1


class SpalignLabelGenerator(LabelGeneratorBase):
    """End-to-end label generation over a dataset (reference
    batch_spalign_kmeans.py main loop :533-548 + estimate_road_mask).

    The retry-on-degenerate-clustering path fixes the reference's broken
    recursion (:201-205, result discarded): if any image in the batch has
    an all-empty road mask, the k-means re-runs with a fresh fold of the
    key, up to cfg.kmeans.max_retries times.
    """

    def _host_prepare(self, images_uint8, full_images, timers) -> dict:
        """Upload the batch once (uint8; the feature extractor and the
        device SLIC engine share it), compute superpixels, and upload
        the maps — all off the critical path when prefetched."""
        cfg = self.cfg
        if _fused_superpixels(cfg):
            # superpixels are computed inside the fused program; the
            # count is the static SLIC grid size (at the possibly
            # downscaled superpixel resolution)
            from spalign_tpu.kernels.slic import slic_grid_size

            d = _fused_downscale(cfg)
            k_grid = slic_grid_size(cfg.resize_shape[0] // d,
                                    cfg.resize_shape[1] // d,
                                    cfg.superpixel.n_slic_segments)
            return {"imgs_dev": self._put_images(images_uint8),
                    "counts": np.full(len(images_uint8), k_grid,
                                      np.int32)}
        imgs_dev = self._put(images_uint8)
        with timers.stage("superpixel"):
            sps, counts = compute_superpixels(images_uint8, cfg.superpixel,
                                              device_images=imgs_dev)
        # narrowest int width (upload bandwidth is scarce on
        # remote-attached TPUs); widened on device.  The map ships as a
        # HOST array: its transfer rides the fused program's dispatch,
        # one fewer producer-side round trip.
        sps_host = sps
        if counts.max() < 2 ** 8:
            sps = sps.astype(np.uint8)
        elif counts.max() < 2 ** 15:
            sps = sps.astype(np.int16)
        if self.mesh is not None:
            sps = self._put(sps)
        return {"imgs_dev": imgs_dev, "sps_dev": sps, "counts": counts,
                "sps_host": sps_host}

    def _group_cluster(self, fmaps, sps, seeds, k, num_segments,
                       pos_scale=1.0):
        """vmap the align+prior+k-means core over INDEPENDENT clustering
        groups: seeds is (G,), the flat batch splits into G groups of
        imgs.shape[0]//G images, and each group runs the reference-exact
        joint clustering with its own seed — bit-identical to G separate
        dispatches (the vmapped while_loop masks per-group carries, so
        every group stops at its own convergence point).

        Amortizes the fixed per-dispatch tax of remote-attached TPUs
        (~40 ms upload + round trip) over G clustering batches —
        replaces the reference's one-process-per-GPU fan-out throughput
        lever (utils/create_val_labels.sh) within a single chip."""
        cfg = self.cfg
        g = seeds.shape[0]
        n = sps.shape[0]
        b = n // g

        def group(fm, sp, seed):
            key = jax.random.key(seed)
            if self.dynamic_k is None:
                return spalign_cluster(
                    fm, sp, key, n_anchors=cfg.align.n_anchors,
                    num_segments=num_segments,
                    append_pos=cfg.align.append_pos,
                    k=cfg.kmeans.n_clusters, n_iter=cfg.kmeans.n_iter,
                    prior_params=self._prior_params,
                    pos_scale=pos_scale)
            return spalign_cluster_dynamic(
                fm, sp, key, k, n_anchors=cfg.align.n_anchors,
                num_segments=num_segments,
                append_pos=cfg.align.append_pos, k_max=self.dynamic_k,
                n_iter=cfg.kmeans.n_iter,
                prior_params=self._prior_params,
                pos_scale=pos_scale)

        road, cluster, assign, res = jax.vmap(group)(
            fmaps.reshape(g, b, *fmaps.shape[1:]),
            sps.reshape(g, b, *sps.shape[1:]), seeds)
        road = road.reshape(n, *road.shape[2:])
        cluster = cluster.reshape(n, *cluster.shape[2:])
        assign = assign.reshape(n, assign.shape[-1])
        # per-GROUP retry predicate: a group is ok when every one of its
        # images has a non-empty road mask
        ok = jnp.all(jnp.any(road, axis=(1, 2)).reshape(g, b), axis=1)
        return road, cluster, assign, res, ok

    def _fused_program(self):
        """One jit program: DRN features + align + prior + k-means +
        painting + the retry predicate — a single dispatch per unit of
        G independent clustering batches (dispatch round-trips are
        expensive on remote-attached TPUs; ``seeds`` is (G,) and the
        group count is derived from shapes, never baked)."""
        if self._fused is not None:
            return self._fused
        cfg = self.cfg
        feature_fn = build_feature_fn(self.model, self.variables,
                                      cfg.use_feature_maps)
        if _fused_superpixels(cfg):
            from spalign_tpu.kernels.slic import slic, slic_grid_size

            spcfg = cfg.superpixel
            d = _fused_downscale(cfg)
            sp_hw = (cfg.resize_shape[0] // d, cfg.resize_shape[1] // d)
            s_grid = slic_grid_size(*sp_hw, spcfg.n_slic_segments)

            @jax.jit
            def fused_all(imgs, seeds, k):
                # images -> SLIC -> DRN -> align -> prior -> k-means ->
                # masks, ONE device program: the only upload is the
                # uint8 batch (possibly wire-packed), the only downloads
                # are masks + scalars
                imgs = self._wire_decode(imgs)
                if d > 1:
                    # superpixel-map resolution is a compute format: the
                    # dense SLIC sweep is HBM-bound on (HW, K), so a d x d
                    # box mean cuts it ~d^2; the DRN keeps full res
                    n = imgs.shape[0]
                    imgs_sp = imgs.astype(jnp.float32).reshape(
                        n, sp_hw[0], d, sp_hw[1], d, 3).mean(axis=(2, 4))
                else:
                    imgs_sp = imgs
                sps = jax.vmap(lambda im: slic(
                    im, n_segments=spcfg.n_slic_segments,
                    compactness=spcfg.slic_compactness,
                    n_iter=spcfg.slic_iters))(imgs_sp)
                fmaps = feature_fn(imgs)
                road, cluster, assign, res, ok = self._group_cluster(
                    fmaps, sps, seeds, k, s_grid, pos_scale=float(d))
                return (road, pack_mask_bits(road), cluster, assign, res,
                        ok)

            self._fused = fused_all
            return fused_all
        s = cfg.superpixel.max_superpixels

        @jax.jit
        def program(imgs, sps, seeds, k):
            # keys derive ON DEVICE from host integer seeds — plain
            # scalars ride the dispatch, where a device-side
            # jax.random.split would cost a round trip per batch
            fmaps = feature_fn(imgs)
            road, cluster, assign, res, ok = self._group_cluster(
                fmaps, sps, seeds, k, s)
            return (road, pack_mask_bits(road), cluster, assign, res, ok)

        self._fused = program
        return program

    def dispatch_batch(self, prepared, timers) -> dict:
        if self.cfg.kmeans.init == "reference":
            return self._dispatch_parity(prepared, timers)
        seeds = self._unit_seeds(prepared)
        if "sps_dev" not in prepared:  # fused-superpixel fast path
            road, packed, cluster, assign, res, ok = self._fused_program()(
                prepared["imgs_dev"], seeds,
                np.int32(self.cfg.kmeans.n_clusters))
        else:
            road, packed, cluster, assign, res, ok = self._fused_program()(
                prepared["imgs_dev"], prepared["sps_dev"],
                seeds, np.int32(self.cfg.kmeans.n_clusters))
        return {"road": road, "road_packed": packed, "cluster": cluster,
                "assign": assign, "res": res, "ok": ok}

    def _parity_programs(self):
        """Bit-parity mode keeps only the Lloyd loop + painting on
        device: features come from ``self.features``, and the anchor
        sampling/align runs on the HOST as an exact replay of the
        reference's python-``random``-seeded per-superpixel shuffle
        (ops/parity.py reference_superpixel_align) — full-stream bit
        parity from raw images, anchors included."""
        if getattr(self, "_parity", None) is not None:
            return self._parity
        cfg = self.cfg
        s = cfg.superpixel.max_superpixels

        @jax.jit
        def stage_b(sps, feats, prior, valid, assign0):
            from spalign_tpu.ops.kmeans import weighted_kmeans_from_init

            sps = sps.astype(jnp.int32)
            b = sps.shape[0]
            res = weighted_kmeans_from_init(
                feats.reshape(b * s, -1), prior.reshape(-1),
                valid.reshape(-1), assign0.reshape(-1),
                k=cfg.kmeans.n_clusters, n_iter=cfg.kmeans.n_iter)
            assign = res.assignment.reshape(b, s)
            cluster = paint_clusters(sps, assign,
                                     max_id=cfg.kmeans.n_clusters)
            road = cluster == 0
            ok = jnp.all(jnp.any(road, axis=(1, 2)))
            return road, cluster, assign, res, ok

        self._parity = stage_b
        return self._parity

    def _dispatch_parity(self, prepared, timers) -> dict:
        """Reference-RNG pipeline, full-stream: device DRN features ->
        HOST anchor shuffle + align replaying the reference's
        python-``random`` seed-1111 stream -> float64 host prior + exact
        numpy-seed-1111 init -> device Lloyd + painting.  Every random
        draw of the reference (batch_spalign_kmeans.py:33-35 seeds;
        consumers :232 anchors, :148 init) is replayed bit-for-bit.  The
        host round trips make this a fidelity mode, not the fast path.

        The align/prior stage is cached in ``prepared``: a degenerate-
        clustering retry re-runs ONLY the init + Lloyd (the reference's
        retry re-calls weighted_kmeans, which redraws the numpy init
        stream but never the anchor stream, :201-205)."""
        from spalign_tpu.ops.parity import (reference_seed_assignment,
                                            reference_superpixel_align,
                                            superpixel_prior_host)

        cfg = self.cfg
        s = cfg.superpixel.max_superpixels
        stage_b = self._parity_programs()
        counts = prepared["counts"]
        b = len(counts)
        if "parity_feats" not in prepared:
            fmaps = np.asarray(self.features(prepared["imgs_dev"]),
                               np.float32)
            with timers.stage("align"):
                compact_feats = [reference_superpixel_align(
                    fmaps[i], prepared["sps_host"][i], self._parity_pyrng,
                    n_select=cfg.align.n_anchors,
                    n_neighbor=cfg.align.n_neighbors,
                    append_pos=cfg.align.append_pos) for i in range(b)]
            p = cfg.prior
            with timers.stage("prior"):
                compact_prior = [superpixel_prior_host(
                    prepared["sps_host"][i], p.y_rel_pos, p.x_rel_pos,
                    p.y_rel_sigma, p.x_rel_sigma) for i in range(b)]
            c = compact_feats[0].shape[1]
            feats = np.zeros((b, s, c), np.float32)
            prior = np.zeros((b, s), np.float32)
            valid = np.zeros((b, s), bool)
            for i, n_i in enumerate(counts):
                feats[i, :n_i] = compact_feats[i]
                prior[i, :n_i] = compact_prior[i]
                valid[i, :n_i] = True
            prepared["parity_feats"] = feats
            prepared["parity_prior"] = (prior, compact_prior)
            prepared["parity_valid"] = valid
        feats = prepared["parity_feats"]
        prior, compact_prior = prepared["parity_prior"]
        valid = prepared["parity_valid"]
        a_cat = reference_seed_assignment(
            np.concatenate(compact_prior), cfg.kmeans.n_clusters,
            self._parity_rng)
        assign0 = np.full((b, s), -1, np.int32)
        o = 0
        for i, n_i in enumerate(counts):
            assign0[i, :n_i] = a_cat[o:o + n_i]
            o += int(n_i)
        road, cluster, assign, res, ok = stage_b(
            prepared["sps_dev"], feats, prior, valid, assign0)
        return {"road": road, "cluster": cluster, "assign": assign,
                "res": res, "ok": ok}

    def _build_fetch(self, handles):
        # ONE transfer for everything the host needs from this unit: the
        # retry/diag scalars AND the bit-packed masks (when the program
        # provides them).  Each extra device_get costs a full tunnel
        # round trip (~30-60 ms) on remote-attached TPUs — fetching the
        # masks together with the scalars halves the per-unit fetch
        # latency of the scoring path.
        res = handles["res"]
        fetch = [res.n_iter, res.converged, res.empty_stop,
                 handles["ok"]]
        extra = []
        if "road_packed" in handles:
            extra.append("road_packed_np")
            fetch.append(handles["road_packed"])
        if getattr(self, "_want_cluster_np", False):
            extra.append("cluster_np")  # save path consumes it
            fetch.append(handles["cluster"])
        return fetch, extra, 4

    def finish_batch(self, prepared, handles, timers):
        """Fetch the batch's results; on the (rare) degenerate-clustering
        signal, retry with a fresh seed — the optimistic dispatch means
        the common path pays no extra round trip."""
        cfg = self.cfg
        with timers.stage("kmeans"):
            for attempt in range(max(1, cfg.kmeans.max_retries)):
                got, extra, ns = self._landed_fetch(handles)
                n_it, conv, empty, ok_np = got[:4]
                for name, val in zip(extra, got[ns:]):
                    handles[name] = val
                if bool(np.all(ok_np)) or attempt + 1 >= max(
                        1, cfg.kmeans.max_retries):
                    break
                # update IN PLACE: the caller holds this dict and reads
                # e.g. road_packed from it after we return.  Degenerate
                # clustering is rare, so the whole unit re-runs (every
                # group gets a fresh seed).
                handles.update(self.dispatch_batch(prepared, timers))
        diag = {
            "n_superpixels": prepared["counts"].tolist(),
            # per-GROUP diagnostics: scalars when the unit holds one
            # clustering group (the single-dispatch shape), lists
            # otherwise; _finish_loaded distributes them per image
            "_per_group": {
                "kmeans_iters": np.atleast_1d(n_it).astype(int).tolist(),
                "kmeans_converged": np.atleast_1d(conv).astype(
                    bool).tolist(),
                "kmeans_empty_stop": np.atleast_1d(empty).astype(
                    bool).tolist(),
            },
        }
        return handles["road"], handles["cluster"], diag


def _confusion_record(conf) -> dict:
    tp, fp, fn = int(conf[1, 1]), int(conf[0, 1]), int(conf[1, 0])
    tn = int(conf[0, 0])
    road_den = tp + fp + fn
    non_den = tn + fp + fn
    return {
        "road_iou": tp / road_den if road_den else float("nan"),
        "non_road_iou": tn / non_den if non_den else float("nan"),
        "precision": tp / (tp + fp) if tp + fp > 0 else None,
        "recall": tp / (tp + fn) if tp + fn > 0 else None,
        "TP": tp, "FP": fp, "FN": fn,
    }


def _name(dataset, attr, idx):
    fn = getattr(dataset, attr, None)
    return fn(idx) if callable(fn) else f"img_{idx:06d}.png"


def _load_full_images(dataset, indices):
    """(B, H, W, 3) uint8 original-resolution images (the overlaps mode
    computes its superpixels at full resolution —
    superpixel_overlaps.py:322-323)."""
    if hasattr(dataset, "full_images"):
        return np.stack(dataset.full_images(list(indices)))
    return np.stack([np.asarray(dataset[i][0], np.uint8)
                     for i in indices])


def _load_batch(dataset, indices, resize_hw):
    """Fetch (B,h,w,3) uint8 resized images + full-res labels (or None)."""
    if hasattr(dataset, "resized_batch"):
        return dataset.resized_batch(list(indices), resize_hw)
    import cv2

    imgs, labels = [], []
    for idx in indices:
        item = dataset[idx]
        img, lab = item if isinstance(item, tuple) else (item, None)
        if img.shape[:2] != tuple(resize_hw):
            img = cv2.resize(img, (resize_hw[1], resize_hw[0]),
                             interpolation=cv2.INTER_CUBIC)
        imgs.append(img)
        labels.append(lab)
    labels = None if labels[0] is None else np.stack(labels)
    return np.stack(imgs), labels
