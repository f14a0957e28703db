"""Bit-parity tests: the reference's exact RNG streams (python anchors +
numpy init) and an end-to-end mask-level bit-compare of the parity-mode
pipeline against a pure-numpy reference-semantics pipeline, FROM RAW
IMAGES — no stage output is shared between the two sides; the only
common input is the deterministic DRN feature map.
"""

import random

import numpy as np
import pytest

from spalign_tpu.config import (KMeansConfig, LabelGenConfig,
                                SuperpixelConfig)
from spalign_tpu.data.synthetic import SyntheticRoadScenes
from spalign_tpu.ops.parity import (reference_seed_assignment,
                                    reference_superpixel_align,
                                    superpixel_prior_host)
from spalign_tpu.pipeline.label_gen import SpalignLabelGenerator
from spalign_tpu.utils.timers import StageTimer

from tests.reference_oracles import (superpixel_align_np,
                                     superpixel_prior_np,
                                     weighted_kmeans_np)


def _reference_init_literal(weights, k):
    """The reference's init verbatim (batch_spalign_kmeans.py:141-149),
    consuming the PROCESS-GLOBAL numpy RNG like the original."""
    assign = np.zeros((weights.shape[0],))
    prior_weight_threshold = float(np.sort(weights)[len(weights) // 2])
    assign[weights > prior_weight_threshold] = 0
    cond = weights <= prior_weight_threshold
    idx = np.arange(int(cond.sum())) % (k - 1) + 1
    np.random.shuffle(idx)
    assign[cond] = idx
    return assign.astype(np.int32)


class TestReferenceInitStream:
    def test_exact_stream_seed_1111(self):
        """reference_seed_assignment must replay the global-seed-1111
        stream bit-for-bit, including across consecutive clusterings
        (the reference seeds once per process, not per batch)."""
        weights = np.random.RandomState(7).rand(501)
        weights2 = np.random.RandomState(8).rand(350)

        np.random.seed(1111)
        want1 = _reference_init_literal(weights, k=4)
        want2 = _reference_init_literal(weights2, k=4)

        rng = np.random.RandomState(1111)
        got1 = reference_seed_assignment(weights, 4, rng)
        got2 = reference_seed_assignment(weights2, 4, rng)
        np.testing.assert_array_equal(got1, want1)
        np.testing.assert_array_equal(got2, want2)

    def test_threshold_rule(self):
        """Cluster 0 <- weight > median; shuffled round-robin elsewhere."""
        weights = np.linspace(0, 1, 101)
        a = reference_seed_assignment(weights, 4,
                                      np.random.RandomState(0))
        thr = float(np.sort(weights)[50])
        assert (a[weights > thr] == 0).all()
        lo = a[weights <= thr]
        # round-robin multiset over clusters 1..3
        counts = np.bincount(lo, minlength=4)
        assert counts[0] == 0
        assert counts[1:].max() - counts[1:].min() <= 1

    def test_anchor_stream_replay_bitequal(self):
        """reference_superpixel_align must replay the python seed-1111
        anchor stream bit-for-bit, including ACROSS images (the
        reference seeds the module once per process,
        batch_spalign_kmeans.py:33 + :232)."""
        r = np.random.RandomState(5)
        fm1 = r.rand(7, 9, 5).astype(np.float32)
        fm2 = r.rand(7, 9, 5).astype(np.float32)
        ys, xs = np.mgrid[0:28, 0:36]
        sps = ((ys // 7) * 3 + xs // 12).astype(np.int32)

        pyrng = random.Random(1111)
        got1 = reference_superpixel_align(fm1, sps, pyrng, n_select=5,
                                          append_pos=True)
        got2 = reference_superpixel_align(fm2, sps, pyrng, n_select=5,
                                          append_pos=True)

        random.seed(1111)
        want1 = superpixel_align_np(fm1.transpose(2, 0, 1), sps,
                                    n_select=5, append_pos=True)
        want2 = superpixel_align_np(fm2.transpose(2, 0, 1), sps,
                                    n_select=5, append_pos=True)
        np.testing.assert_array_equal(got1, want1)
        np.testing.assert_array_equal(got2, want2)
        assert got1.shape == (12, 7)  # C + (y, x) centroid

    def test_host_prior_matches_oracle(self):
        sps = np.repeat(np.arange(16).reshape(4, 4), 8, axis=0)
        sps = np.repeat(sps, 8, axis=1)  # (32, 32), 16 superpixels
        got = superpixel_prior_host(sps)
        want = superpixel_prior_np(sps)
        np.testing.assert_array_equal(got, want)


class TestMaskBitParity:
    @pytest.mark.parametrize("method,sp_kw", [
        ("felzenszwalb", dict(felzenszwalb_scale=100.0,
                              felzenszwalb_sigma=0.8,
                              felzenszwalb_min_size=20)),
        ("slic", dict(n_slic_segments=50, slic_iters=4)),
    ])
    def test_full_pipeline_masks_bitequal(self, method, sp_kw):
        """End-to-end golden test FROM RAW IMAGES: the parity-mode
        pipeline's road/cluster maps == a pure-numpy reference-semantics
        pipeline (seed-1111 python anchor shuffle -> align -> prior ->
        seed-1111 numpy init -> Lloyd -> painting), np.array_equal.  No
        stage output is shared — the oracle side re-derives anchors,
        aligned features, prior, and init itself."""
        batch, hw = 4, (112, 112)
        cfg = LabelGenConfig(
            batchsize=batch, resize_shape=hw,
            superpixel=SuperpixelConfig(method=method, max_superpixels=512,
                                        **sp_kw),
            kmeans=KMeansConfig(n_clusters=4, seed=1111, init="reference"),
            save_masks=False)
        ds = SyntheticRoadScenes(n=batch, full_shape=(224, 448), seed=41)
        imgs, _ = ds.resized_batch(range(batch), hw)

        gen = SpalignLabelGenerator(cfg)
        road, cluster, diag, _ = gen.run_batch(imgs)
        road = np.asarray(road)
        cluster = np.asarray(cluster)
        assert not diag["kmeans_empty_stop"]  # no retry consumed the rng

        # --- independent numpy reference-semantics pipeline ---
        # the ONLY shared input: the deterministic DRN feature map (no
        # RNG is involved in computing it)
        gen2 = SpalignLabelGenerator(cfg)
        prepared = gen2._host_prepare(imgs, None, StageTimer())
        fmaps = np.asarray(gen2.features(prepared["imgs_dev"]),
                           np.float32)
        sps = prepared["sps_host"]
        counts = prepared["counts"]

        random.seed(1111)  # the reference's module-global python seed
        X = np.concatenate([
            superpixel_align_np(fmaps[i].transpose(2, 0, 1), sps[i],
                                n_select=cfg.align.n_anchors,
                                append_pos=cfg.align.append_pos)
            for i in range(batch)]).astype(np.float32)
        weights = np.concatenate(
            [superpixel_prior_np(sps[i]) for i in range(batch)])
        np.random.seed(1111)
        assign0 = _reference_init_literal(weights, k=4)
        assign, _, _ = weighted_kmeans_np(
            X, weights.astype(np.float32), 4, assign0,
            n_iter=cfg.kmeans.n_iter)

        # paint per image (reference weighted_kmeans wrapper :191-199)
        o = 0
        for i in range(batch):
            cl_np = np.zeros(hw, np.int32)
            for sp_idx, cid in enumerate(assign[o:o + counts[i]]):
                cl_np[sps[i] == sp_idx] = cid
            o += int(counts[i])
            np.testing.assert_array_equal(cluster[i], cl_np)
            np.testing.assert_array_equal(road[i], cl_np == 0)

    def test_device_and_parity_modes_agree_on_masks(self):
        """Same data, both init modes: different RNG streams but both
        must produce sane road masks (smoke guard for the parity path)."""
        batch, hw = 2, (112, 112)
        ds = SyntheticRoadScenes(n=batch, full_shape=(224, 448), seed=43)
        imgs, _ = ds.resized_batch(range(batch), hw)
        masks = {}
        for init in ("device", "reference"):
            cfg = LabelGenConfig(
                batchsize=batch, resize_shape=hw,
                superpixel=SuperpixelConfig(method="slic",
                                            n_slic_segments=40,
                                            slic_iters=3,
                                            max_superpixels=128),
                kmeans=KMeansConfig(init=init), save_masks=False)
            gen = SpalignLabelGenerator(cfg)
            road, _, _, _ = gen.run_batch(imgs)
            masks[init] = np.asarray(road)
        for m in masks.values():
            frac = m.mean(axis=(1, 2))
            assert ((frac > 0.01) & (frac < 0.95)).all()
