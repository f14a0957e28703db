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
        """Feature extractor + pixel clustering as ONE dispatch (the key
        derives on device from a host seed scalar — see the spalign
        generator for the rationale)."""
        if self._fused is not None:
            return self._fused
        from spalign_tpu.pipeline.label_gen import build_feature_fn

        cfg = self.cfg
        feature_fn = build_feature_fn(self.model, self.variables,
                                      cfg.use_feature_maps)

        @jax.jit
        def program(imgs, seed, k):
            fmaps = feature_fn(imgs)
            if self.dynamic_k is None:
                return direct_cluster(
                    fmaps, jax.random.key(seed), k=cfg.kmeans.n_clusters,
                    n_iter=cfg.kmeans.n_iter,
                    prior_params=self._prior_params)
            return direct_cluster_dynamic(
                fmaps, jax.random.key(seed), k, k_max=self.dynamic_k,
                n_iter=cfg.kmeans.n_iter, prior_params=self._prior_params)

        self._fused = program
        return program

    def dispatch_batch(self, prepared, timers) -> dict:
        road, cluster, res = self._fused_program()(
            prepared["imgs_dev"], self._next_seed(),
            np.int32(self.cfg.kmeans.n_clusters))
        handles = {"road": road, "cluster": cluster, "res": res}
        if "full_sps" in prepared:
            # async dispatch; time_refine records enqueue cost only (the
            # execution overlaps the next batch — see PARITY.md timing
            # notes)
            with timers.stage("refine"):
                handles["road"] = overlaps_refine(
                    road, prepared["full_sps"], self.cfg.overlap_threshold,
                    num_segments=self.cfg.superpixel.max_superpixels)
        return handles

    def finish_batch(self, prepared, handles, timers):
        res = handles["res"]
        with timers.stage("kmeans"):
            n_it, conv, empty = jax.device_get(
                (res.n_iter, res.converged, res.empty_stop))
        diag = {"kmeans_iters": int(n_it),
                "kmeans_converged": bool(conv),
                "kmeans_empty_stop": bool(empty)}
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
        with timers.stage("superpixel"):
            sps, counts = compute_superpixels(full_images,
                                              self.cfg.superpixel)
        prepared.update(full_sps=self._put(sps), counts=counts)
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
