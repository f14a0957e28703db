"""Unit tests for core ops vs numpy oracles of the reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spalign_tpu.ops import (bilinear_sample, center_of_mass,
                             confusion_matrix, iou_from_confusion,
                             local_response_normalization,
                             max_pool_argmax_2x2, max_unpool_2x2,
                             pixel_prior, precision_recall_from_confusion,
                             sample_segment_anchors, segment_mean,
                             segmentation_scores, superpixel_prior)
from spalign_tpu.ops.resize import bilinear_resize, nn_resize_cv2

import reference_oracles as oracle


def random_superpixels(rng, h, w, n_seg):
    """Voronoi-ish segmentation with contiguous ids 0..n_seg-1."""
    cy = rng.uniform(0, h, n_seg)
    cx = rng.uniform(0, w, n_seg)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    d = (yy[..., None] - cy) ** 2 + (xx[..., None] - cx) ** 2
    sp = np.argmin(d, axis=-1).astype(np.int32)
    # ensure contiguity (empty cells possible)
    _, inv = np.unique(sp, return_inverse=True)
    return inv.reshape(h, w).astype(np.int32)


class TestPrior:
    def test_pixel_prior_matches_reference_formula(self):
        got = np.asarray(pixel_prior(224, 224))
        want = oracle.pixel_prior_np(224, 224)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_pixel_prior_nondefault_params(self):
        got = np.asarray(pixel_prior(64, 128, 0.6, 0.4, 0.2, 0.3))
        want = oracle.pixel_prior_np(64, 128, 0.6, 0.4, 0.2, 0.3)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_superpixel_prior(self, rng):
        sp = random_superpixels(rng, 56, 56, 40)
        n = int(sp.max()) + 1
        got = np.asarray(superpixel_prior(jnp.asarray(sp), num_segments=64))
        want = oracle.superpixel_prior_np(sp)
        np.testing.assert_allclose(got[:n], want, rtol=1e-4, atol=1e-6)
        np.testing.assert_array_equal(got[n:], 0.0)


class TestSegments:
    def test_segment_mean(self, rng):
        ids = rng.randint(0, 10, size=100).astype(np.int32)
        x = rng.randn(100, 5).astype(np.float32)
        got = np.asarray(segment_mean(jnp.asarray(x), jnp.asarray(ids), 12))
        for s in range(10):
            np.testing.assert_allclose(got[s], x[ids == s].mean(0),
                                       rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(got[10:], 0.0)

    def test_segment_mean_int_data_is_float_on_both_branches(self, rng):
        """Behavior must not flip at the one-hot/scatter threshold:
        integer data yields a FLOAT mean on both paths (advisor round 2)."""
        ids = rng.randint(0, 10, size=100).astype(np.int32)
        x = rng.randint(0, 50, size=(100, 3)).astype(np.int32)
        small = np.asarray(segment_mean(jnp.asarray(x), jnp.asarray(ids), 12))
        big = np.asarray(segment_mean(jnp.asarray(x), jnp.asarray(ids), 600))
        assert np.issubdtype(small.dtype, np.floating)
        assert np.issubdtype(big.dtype, np.floating)
        np.testing.assert_allclose(small, big[:12], rtol=1e-5)

    def test_center_of_mass(self, rng):
        sp = random_superpixels(rng, 48, 64, 25)
        n = int(sp.max()) + 1
        got = np.asarray(center_of_mass(jnp.asarray(sp), 32))
        for s in range(n):
            want = oracle.center_of_mass_np(sp == s)
            np.testing.assert_allclose(got[s], want, rtol=1e-4, atol=1e-4)

    def test_anchor_sampling_inside_and_distinct(self, rng):
        sp = random_superpixels(rng, 56, 56, 30)
        n = int(sp.max()) + 1
        key = jax.random.key(0)
        yx, valid = sample_segment_anchors(jnp.asarray(sp), key, 10, 64)
        yx, valid = np.asarray(yx), np.asarray(valid)
        sizes = np.bincount(sp.ravel(), minlength=64)
        for s in range(n):
            k = valid[s].sum()
            assert k == min(10, sizes[s])
            pts = yx[s][valid[s]].astype(int)
            # all anchors inside the superpixel
            assert (sp[pts[:, 0], pts[:, 1]] == s).all()
            # sampled without replacement
            assert len({(y, x) for y, x in pts}) == k
        # absent segments have no valid anchors
        assert not valid[n:].any()

    def test_anchor_sampling_is_random_but_seeded(self, rng):
        sp = random_superpixels(rng, 56, 56, 30)
        a1, _ = sample_segment_anchors(jnp.asarray(sp), jax.random.key(1),
                                       10, 64)
        a2, _ = sample_segment_anchors(jnp.asarray(sp), jax.random.key(1),
                                       10, 64)
        a3, _ = sample_segment_anchors(jnp.asarray(sp), jax.random.key(2),
                                       10, 64)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        assert not np.array_equal(np.asarray(a1), np.asarray(a3))


class TestBilinear:
    def test_matches_reference_interior(self, rng):
        fmap = rng.randn(28, 28, 7).astype(np.float32)
        # interior non-degenerate points (not on cell-center lines)
        pts = np.stack([rng.uniform(0.6, 27.4, 50),
                        rng.uniform(0.6, 27.4, 50)], axis=-1)
        pts = pts[(np.abs(pts - np.round(pts)) > 1e-3).all(axis=1)]
        got = np.asarray(bilinear_sample(jnp.asarray(fmap),
                                         jnp.asarray(pts, np.float32)))
        fmap_chw = fmap.transpose(2, 0, 1)
        for i, (py, px) in enumerate(pts):
            want = oracle.bilinear_at_np(fmap_chw, py, px)
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)

    def test_exact_at_cell_centers(self, rng):
        fmap = rng.randn(8, 8, 3).astype(np.float32)
        pts = np.array([[2.5, 3.5], [0.5, 0.5], [7.5, 7.5]], np.float32)
        got = np.asarray(bilinear_sample(jnp.asarray(fmap), jnp.asarray(pts)))
        np.testing.assert_allclose(got[0], fmap[2, 3], rtol=1e-5)
        np.testing.assert_allclose(got[1], fmap[0, 0], rtol=1e-5)
        np.testing.assert_allclose(got[2], fmap[7, 7], rtol=1e-5)


class TestMetrics:
    def test_confusion_vs_oracle(self, rng):
        gt = rng.randint(-1, 2, size=(37, 53))
        pred = rng.randint(0, 2, size=(37, 53))
        got = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt)))
        want = oracle.confusion_np(pred, gt)
        np.testing.assert_array_equal(got, want)

    def test_iou_precision_recall(self):
        conf = jnp.asarray([[50, 10], [5, 35]])
        iou = np.asarray(iou_from_confusion(conf))
        np.testing.assert_allclose(iou[1], 35 / (35 + 10 + 5), rtol=1e-6)
        np.testing.assert_allclose(iou[0], 50 / (50 + 10 + 5), rtol=1e-6)
        p, r = precision_recall_from_confusion(conf)
        np.testing.assert_allclose(float(p), 35 / 45, rtol=1e-6)
        np.testing.assert_allclose(float(r), 35 / 40, rtol=1e-6)

    def test_scores_record(self, rng):
        gt = rng.randint(-1, 2, size=(64, 64))
        pred = rng.randint(0, 2, size=(64, 64))
        rec = segmentation_scores(pred, gt)
        conf = oracle.confusion_np(pred, gt)
        assert rec["TP"] == conf[1, 1]
        assert rec["FP"] == conf[0, 1]
        assert rec["FN"] == conf[1, 0]
        np.testing.assert_allclose(
            rec["road_iou"],
            conf[1, 1] / (conf[1, 1] + conf[0, 1] + conf[1, 0]), rtol=1e-6)


class TestLRN:
    def test_matches_chainer_semantics(self, rng):
        x = rng.randn(2, 3, 8, 8).astype(np.float32)  # NCHW oracle layout
        want = oracle.lrn_np(x, n=5, k=1.0, alpha=1e-4 / 5, beta=0.75)
        x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
        got = np.asarray(local_response_normalization(
            x_nhwc, n=5, k=1.0, alpha=1e-4 / 5, beta=0.75))
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                                   rtol=1e-5, atol=1e-6)

    def test_wide_channels(self, rng):
        x = rng.randn(1, 64, 4, 4).astype(np.float32)
        want = oracle.lrn_np(x, n=5, k=2.0, alpha=1e-4, beta=0.75)
        got = np.asarray(local_response_normalization(
            jnp.asarray(x.transpose(0, 2, 3, 1)), n=5, k=2.0, alpha=1e-4,
            beta=0.75))
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                                   rtol=1e-5, atol=1e-6)


class TestPooling:
    def test_pool_unpool_roundtrip(self, rng):
        x = rng.randn(2, 8, 10, 3).astype(np.float32)
        pooled, idx = max_pool_argmax_2x2(jnp.asarray(x))
        pooled_np = np.asarray(pooled)
        # oracle pooling
        want = x.reshape(2, 4, 2, 5, 2, 3).max(axis=(2, 4))
        np.testing.assert_allclose(pooled_np, want, rtol=1e-6)
        up = np.asarray(max_unpool_2x2(pooled, idx))
        assert up.shape == x.shape[:1] + (8, 10, 3)
        # unpooled keeps exactly the max per window at its argmax position,
        # zeros elsewhere -> window sum == window max
        np.testing.assert_allclose(
            up.reshape(2, 4, 2, 5, 2, 3).sum(axis=(2, 4)), want, rtol=1e-6)
        # everything else is zero: at most one nonzero per window
        nz = (up.reshape(2, 4, 2, 5, 2, 3) != 0).sum(axis=(2, 4))
        assert (nz <= 1).all()
        # the nonzero sits exactly where the input's max was
        np.testing.assert_allclose(up[up != 0], x[up != 0], rtol=1e-6)

    def test_odd_input_cover_all(self, rng):
        x = rng.randn(1, 7, 9, 2).astype(np.float32)
        pooled, idx = max_pool_argmax_2x2(jnp.asarray(x))
        assert pooled.shape == (1, 4, 5, 2)
        up = max_unpool_2x2(pooled, idx, out_hw=(7, 9))
        assert up.shape == (1, 7, 9, 2)


class TestResize:
    def test_nn_matches_cv2(self, rng):
        import cv2

        x = rng.randint(0, 4, size=(56, 56)).astype(np.uint8)
        want = cv2.resize(x, (128, 96), interpolation=cv2.INTER_NEAREST)
        got = np.asarray(nn_resize_cv2(jnp.asarray(x.astype(np.int32)),
                                       (96, 128)))
        np.testing.assert_array_equal(got, want.astype(np.int32))

    def test_bilinear_shape(self, rng):
        x = rng.randn(4, 6, 2).astype(np.float32)
        y = bilinear_resize(jnp.asarray(x), (8, 12))
        assert y.shape == (8, 12, 2)

    def test_blocked_onehot_path_matches_scatter(self, rng):
        """S in (513..4096] runs 512-column blocked one-hot matmuls;
        results must match the scatter fallback exactly."""
        from spalign_tpu.ops.segments import segment_sizes

        ids = rng.randint(0, 1500, size=5000).astype(np.int32)
        x = rng.randn(5000, 3).astype(np.float32)
        got = np.asarray(segment_mean(jnp.asarray(x), jnp.asarray(ids),
                                      1537))
        sizes = np.asarray(segment_sizes(jnp.asarray(ids), 1537))
        np.testing.assert_array_equal(
            sizes, np.bincount(ids, minlength=1537))
        for s in (0, 7, 512, 513, 1024, 1499):
            if (ids == s).any():
                np.testing.assert_allclose(got[s], x[ids == s].mean(0),
                                           rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(got[1500:], 0.0)
