"""Baseline pipelines: direct pixel clustering + superpixel overlaps.

- 'direct' (reference direct_clustering.py): weighted k-means directly on
  feature-map PIXELS — features = flattened (B*hf*wf, C) map with integer
  (x, y) cell coordinates appended (:300-303), per-pixel Gaussian prior
  at feature-map resolution (:307-309), joint k-means over the whole
  batch (:314); road mask = cluster 0 upsampled nearest (:329-332).

- 'overlaps' (reference superpixel_overlaps.py, the Distantly-Supervised
  Road Segmentation baseline, arXiv 1708.06118): direct clustering, then
  the coarse road mask is snapped to FULL-RESOLUTION superpixels — a
  superpixel is marked road when overlap / n_predicted_road_pixels >
  overlap_threshold (:359-369; defaults: felzenszwalb scale 500 sigma
  0.9, threshold 0.01).

Both run as fused device programs; overlaps' refinement is a segment-sum
over the full-resolution superpixel map on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from spalign_tpu.ops.kmeans import weighted_kmeans, weighted_kmeans_dynamic
from spalign_tpu.ops.prior import pixel_prior
from spalign_tpu.ops.resize import nn_resize_cv2
from spalign_tpu.pipeline.label_gen import LabelGeneratorBase
from spalign_tpu.pipeline.superpixels import compute_superpixels


def _pixel_features(feature_maps, prior_params):
    """Flattened per-pixel rows + tiled feature-resolution prior
    (reference direct_clustering.py:300-309)."""
    b, h, w, c = feature_maps.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    coords = jnp.stack([xs, ys], axis=-1)  # (hw, 2) in (x, y) order
    coords = jnp.tile(coords, (b, 1))
    X = jnp.concatenate(
        [feature_maps.reshape(b * h * w, c), coords], axis=-1)
    prior = pixel_prior(h, w, *prior_params).reshape(-1)
    return X, jnp.tile(prior, (b,))


@partial(jax.jit, static_argnames=("k", "n_iter", "prior_params"))
def direct_cluster(feature_maps, key, *, k: int, n_iter: int,
                   prior_params):
    """(B, hf, wf, C) -> road/cluster maps at feature resolution."""
    b, h, w, _ = feature_maps.shape
    X, prior = _pixel_features(feature_maps, prior_params)
    valid = jnp.ones((b * h * w,), bool)
    res = weighted_kmeans(X, prior, valid, key, k=k, n_iter=n_iter)
    cluster_maps = res.assignment.reshape(b, h, w)
    return cluster_maps == 0, cluster_maps, res


@partial(jax.jit, static_argnames=("k_max", "n_iter", "prior_params"))
def direct_cluster_dynamic(feature_maps, key, k, *, k_max: int,
                           n_iter: int, prior_params):
    """``direct_cluster`` with a runtime cluster count (<= k_max); one
    compiled program covers a k-sweep (see ops/kmeans.py)."""
    b, h, w, _ = feature_maps.shape
    X, prior = _pixel_features(feature_maps, prior_params)
    valid = jnp.ones((b * h * w,), bool)
    res = weighted_kmeans_dynamic(X, prior, valid, key, k, k_max=k_max,
                                  n_iter=n_iter)
    cluster_maps = res.assignment.reshape(b, h, w)
    return cluster_maps == 0, cluster_maps, res


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _refine_packed_program(num_segments: int, upscale: int = 1):
    """Module-cached jit: overlaps refine + bit-packed downlink form of
    the full-res masks (8x less of the ~25 MB/s downlink; threshold is
    a traced arg so sweeps share the compile).

    ``upscale`` > 1: the superpixel maps were computed at 1/upscale
    scale (SuperpixelConfig.slic_device_downscale); the refine runs at
    that scale — the refined mask is per-superpixel constant, so
    NN-upsampling it equals upsampling the label map first.  The PACKED
    downlink ships the 1/upscale-resolution mask (upscale^2 fewer bytes
    on the second-scarcest resource; the host replicates it back with
    np.repeat, bit-equal); only the in-program full-resolution array —
    what run_batch hands to device-side consumers — is replicated on
    device."""
    from spalign_tpu.pipeline.label_gen import pack_mask_bits

    @jax.jit
    def refine(road_small, superpixels_full, threshold):
        refined = overlaps_refine(road_small, superpixels_full,
                                  threshold, num_segments=num_segments)
        packed = pack_mask_bits(refined)
        if upscale > 1:
            refined = jnp.repeat(jnp.repeat(refined, upscale, axis=1),
                                 upscale, axis=2)
        return refined, packed

    return refine


@partial(jax.jit, static_argnames=("num_segments",))
def overlaps_refine(road_small, superpixels_full, threshold: float,
                    num_segments: int):
    """Snap a coarse road mask to full-resolution superpixels.

    road_small: (B, hf, wf) bool; superpixels_full: (B, H, W) int32.
    Returns (B, H, W) bool refined masks."""
    full_hw = superpixels_full.shape[1:]
    road_up = nn_resize_cv2(road_small.astype(jnp.int32), full_hw)

    def one(road, sp):
        flat_sp = sp.reshape(-1)
        overlap = jax.ops.segment_sum(
            road.reshape(-1).astype(jnp.float32), flat_sp,
            num_segments=num_segments)
        n_pred = jnp.sum(road).astype(jnp.float32)
        keep = jnp.where(n_pred > 0, overlap / jnp.maximum(n_pred, 1.0)
                         > threshold, False)
        return keep[flat_sp].reshape(sp.shape)

    return jax.vmap(one)(road_up, superpixels_full)


class DirectLabelGenerator(LabelGeneratorBase):
    """direct_clustering.py equivalent."""

    def _fused_program(self):
        """Feature extractor + pixel clustering as ONE dispatch (keys
        derive on device from host seed scalars — see the spalign
        generator).  ``seeds`` is (G,): the batch splits into G
        independent clustering groups, each reference-exact (the
        multi-group dispatch lever, see LabelGenConfig)."""
        if self._fused is not None:
            return self._fused
        from spalign_tpu.pipeline.label_gen import build_feature_fn

        cfg = self.cfg
        feature_fn = build_feature_fn(self.model, self.variables,
                                      cfg.use_feature_maps)

        @jax.jit
        def program(imgs, seeds, k):
            fmaps = feature_fn(self._wire_decode(imgs))
            g = seeds.shape[0]
            n = imgs.shape[0]

            def group(fm, seed):
                key = jax.random.key(seed)
                if self.dynamic_k is None:
                    return direct_cluster(
                        fm, key, k=cfg.kmeans.n_clusters,
                        n_iter=cfg.kmeans.n_iter,
                        prior_params=self._prior_params)
                return direct_cluster_dynamic(
                    fm, key, k, k_max=self.dynamic_k,
                    n_iter=cfg.kmeans.n_iter,
                    prior_params=self._prior_params)

            road, cluster, res = jax.vmap(group)(
                fmaps.reshape(g, n // g, *fmaps.shape[1:]), seeds)
            return (road.reshape(n, *road.shape[2:]),
                    cluster.reshape(n, *cluster.shape[2:]), res)

        self._fused = program
        return program

    def dispatch_batch(self, prepared, timers) -> dict:
        road, cluster, res = self._fused_program()(
            prepared["imgs_dev"], self._unit_seeds(prepared),
            np.int32(self.cfg.kmeans.n_clusters))
        handles = {"road": road, "cluster": cluster, "res": res}
        if "full_sps" in prepared:
            # async dispatch; time_refine records enqueue cost only (the
            # execution overlaps the next batch — see PARITY.md timing
            # notes)
            with timers.stage("refine"):
                upscale = prepared.get("sps_upscale", 1)
                handles["road"], handles["road_packed"] = \
                    _refine_packed_program(
                        self.cfg.superpixel.max_superpixels, upscale)(
                        road, prepared["full_sps"],
                        self.cfg.overlap_threshold)
                if upscale > 1:
                    # packed downlink carries the 1/upscale-res mask
                    handles["packed_upscale"] = upscale
        return handles

    def _build_fetch(self, handles):
        # everything the host consumes rides ONE device_get (each
        # separate fetch costs a full tunnel round trip): the diag
        # scalars, the masks the scoring path reads (bit-packed for
        # overlaps' full-res output, tiny feature-res bools here),
        # and — when the save path will need them — the cluster maps
        res = handles["res"]
        fetch = [res.n_iter, res.converged, res.empty_stop]
        extra = []
        if "road_packed" in handles:
            extra.append("road_packed_np")
            fetch.append(handles["road_packed"])
        else:
            extra.append("road_np")
            fetch.append(handles["road"])
        if getattr(self, "_want_cluster_np", False):
            extra.append("cluster_np")
            fetch.append(handles["cluster"])
        return fetch, extra, 3

    def finish_batch(self, prepared, handles, timers):
        with timers.stage("kmeans"):
            got, extra, ns = self._landed_fetch(handles)
            n_it, conv, empty = got[:3]
            for name, val in zip(extra, got[ns:]):
                handles[name] = val
        diag = {"_per_group": {
            "kmeans_iters": np.atleast_1d(n_it).astype(int).tolist(),
            "kmeans_converged": np.atleast_1d(conv).astype(bool).tolist(),
            "kmeans_empty_stop": np.atleast_1d(empty).astype(
                bool).tolist(),
        }}
        if "counts" in prepared:
            diag["n_superpixels"] = prepared["counts"].tolist()
        return handles["road"], handles["cluster"], diag


class OverlapsLabelGenerator(DirectLabelGenerator):
    """superpixel_overlaps.py equivalent: direct clustering + full-res
    superpixel snapping.  run_batch returns FULL-resolution road masks
    (scoring needs no further upsample; cluster maps stay coarse, as in
    the reference's save path)."""

    needs_full_images = True

    def _host_prepare(self, images_uint8, full_images, timers) -> dict:
        if full_images is None:
            raise ValueError("overlaps mode needs full-resolution images")
        prepared = super()._host_prepare(images_uint8, full_images, timers)
        spcfg = self.cfg.superpixel
        if spcfg.method == "slic" and not spcfg.slic_enforce_connectivity:
            # TPU-native front-end (documented deviation; felzenszwalb
            # stays the reference-parity default,
            # superpixel_overlaps.py:309-320): full-res SLIC runs ON
            # DEVICE and its label maps never leave the chip — the host
            # cost drops to the image upload, vs seconds/image of
            # single-core felzenszwalb
            from spalign_tpu.kernels.slic import slic_grid_size
            from spalign_tpu.pipeline.superpixels import \
                batched_slic_device

            b, h, w = full_images.shape[:3]
            d = spcfg.slic_device_downscale
            if d > 1:
                if h % d or w % d:
                    raise ValueError(
                        f"slic_device_downscale={d} does not divide the "
                        f"full image shape ({h}, {w})")
                # uplink is this mode's binding cost (~3 MB/img at 2 MP
                # even as YUV420); superpixels at 1/d scale quarter it
                # (d=2), and the refined mask replicates back to full
                # resolution (documented deviation, quality-gated by
                # tests/test_baselines.py::
                # test_overlaps_device_slic_downscale_quality_gate)
                full_images = np.ascontiguousarray(
                    full_images[:, ::d, ::d])
                h, w = h // d, w // d
            s_grid = slic_grid_size(h, w, spcfg.n_slic_segments)
            if s_grid > spcfg.max_superpixels:
                raise ValueError(
                    f"SLIC grid {s_grid} > max_superpixels "
                    f"{spcfg.max_superpixels}")
            with timers.stage("superpixel"):
                if (self.cfg.upload_format == "yuv420"
                        and h % 2 == 0 and w % 2 == 0):
                    # the FULL-res upload is this mode's binding cost
                    # (~6 MB/img raw at 2 MP); 1.5 B/px halves it
                    from spalign_tpu.pipeline.superpixels import \
                        batched_slic_device_yuv
                    from spalign_tpu.pipeline.wire import pack_yuv420

                    full_dev = self._put(pack_yuv420(
                        np.ascontiguousarray(full_images)))
                    sps = batched_slic_device_yuv(
                        spcfg.n_slic_segments, spcfg.slic_compactness,
                        spcfg.slic_iters, (h, w))(full_dev)
                else:
                    full_dev = self._put(np.ascontiguousarray(
                        full_images))
                    sps = batched_slic_device(
                        spcfg.n_slic_segments, spcfg.slic_compactness,
                        spcfg.slic_iters)(full_dev)
                counts = np.full((b,), s_grid, np.int32)
            prepared["sps_upscale"] = d
        else:
            with timers.stage("superpixel"):
                sps_host, counts = compute_superpixels(full_images,
                                                       spcfg)
                sps = self._put(sps_host)
        prepared.update(full_sps=sps, counts=counts)
        return prepared


def make_label_generator(cfg, variables=None, model_name="drn_c_26",
                         seed=None, dynamic_k=None):
    """Mode dispatcher: one CLI, three pipelines (replaces the three
    near-identical reference scripts)."""
    from spalign_tpu.pipeline.label_gen import SpalignLabelGenerator

    cls = {"spalign": SpalignLabelGenerator,
           "direct": DirectLabelGenerator,
           "overlaps": OverlapsLabelGenerator}[cfg.mode]
    return cls(cfg, variables=variables, model_name=model_name, seed=seed,
               dynamic_k=dynamic_k)
