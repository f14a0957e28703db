"""End-to-end label-generation pipeline tests (small shapes, CPU mesh).

The analog of the reference's only test suite (utils/test.sh smoke runs,
SURVEY.md §4.1) — but as real assertions on the outputs.
"""

import glob
import json
import os

import numpy as np
import pytest

from spalign_tpu.config import (KMeansConfig, LabelGenConfig,
                                SuperpixelConfig)
from spalign_tpu.data.synthetic import SyntheticRoadScenes
from spalign_tpu.eval.results import (aggregate_results, read_results,
                                      write_summary)
from spalign_tpu.pipeline.label_gen import SpalignLabelGenerator


@pytest.fixture(scope="module")
def pipeline_out(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("labelgen"))
    cfg = LabelGenConfig(
        batchsize=4,
        resize_shape=(112, 112),
        superpixel=SuperpixelConfig(method="slic", n_slic_segments=50,
                                    slic_iters=4, max_superpixels=128),
        kmeans=KMeansConfig(n_clusters=4),
        out_dir=out, save_masks=True)
    ds = SyntheticRoadScenes(n=6, full_shape=(256, 512), seed=21)
    gen = SpalignLabelGenerator(cfg)
    records = gen.process_dataset(ds)
    return cfg, ds, records, out


class TestEndToEnd:
    def test_records_complete(self, pipeline_out):
        cfg, ds, records, out = pipeline_out
        # n=6, batchsize=4 -> batches [0:4] + [2:6]: 8 records, images 2-3
        # twice (the reference's keep-the-batchsize tail rule; duplicates
        # are dropped at aggregation time, as upstream mean_result does)
        assert len(records) == 8
        assert len({r["img_fn"] for r in records}) == 6
        for r in records:
            assert set(r) >= {"img_fn", "road_iou", "precision", "recall",
                              "TP", "FP", "FN", "time_superpixel",
                              "elapsed_time", "mode", "batchsize"}
            assert 0.0 <= r["road_iou"] <= 1.0

    def test_masks_saved_full_res(self, pipeline_out):
        cfg, ds, records, out = pipeline_out
        masks = sorted(glob.glob(os.path.join(out, "*leftImg8bit.npy")))
        clusters = glob.glob(os.path.join(out, "*_all_cluster.npy"))
        assert len(masks) == 6 and len(clusters) == 6
        m = np.load(masks[0])
        assert m.shape == (256, 512)  # upsampled to label resolution
        assert m.dtype == np.uint8
        assert set(np.unique(m)) <= {0, 1}

    def test_jsonl_roundtrip_and_summary(self, pipeline_out):
        cfg, ds, records, out = pipeline_out
        parsed = read_results(os.path.join(out, "result.json"))
        assert len(parsed) == 6
        summary = write_summary(out, parsed)
        assert os.path.exists(os.path.join(out, "summary.txt"))
        assert summary["n"] == 6
        assert 0 <= summary["road_mean_iou"] <= 1

    def test_masks_structured_not_degenerate(self, pipeline_out):
        """Even with a random-init DRN, prior + position features must
        produce road masks concentrated at bottom-center — not empty,
        not the whole image."""
        cfg, ds, records, out = pipeline_out
        fracs = []
        for fn in glob.glob(os.path.join(out, "*leftImg8bit.npy")):
            m = np.load(fn)
            fracs.append(m.mean())
            h = m.shape[0]
            # more road in the bottom half than the top half
            assert m[h // 2:].mean() >= m[: h // 2].mean()
        assert all(0.01 < f < 0.95 for f in fracs), fracs

    def test_tail_batch_overlap(self, pipeline_out):
        """n=6 with batchsize 4 -> batches [0:4] and [2:6]; images 2-3
        are processed twice (the reference's keep-the-batchsize rule);
        dedup leaves one record per image."""
        cfg, ds, records, out = pipeline_out
        deduped = read_results(os.path.join(out, "result.json"), dedup=True)
        assert len(deduped) == 6
        assert len({r["img_fn"] for r in deduped}) == 6


class TestNoLabelMode:
    def test_runs_without_gt(self, tmp_path):
        """utils/apply_spalign_kmeans.py equivalent: unlabeled frames."""

        class Unlabeled:
            def __init__(self, ds):
                self.ds = ds

            def __len__(self):
                return len(self.ds)

            def __getitem__(self, i):
                return self.ds[i][0], None

            def resized_batch(self, indices, hw):
                imgs, _ = self.ds.resized_batch(indices, hw)
                return imgs, None

            def image_name(self, i):
                return self.ds.image_name(i)

        cfg = LabelGenConfig(
            batchsize=3, resize_shape=(112, 112),
            superpixel=SuperpixelConfig(method="slic", n_slic_segments=50,
                                        slic_iters=3, max_superpixels=128),
            out_dir=str(tmp_path), save_masks=True)
        ds = Unlabeled(SyntheticRoadScenes(n=3, full_shape=(224, 224),
                                           seed=5))
        gen = SpalignLabelGenerator(cfg)
        records = gen.process_dataset(ds)
        assert len(records) == 3
        assert all("road_iou" not in r for r in records)
        assert len(glob.glob(os.path.join(str(tmp_path),
                                          "*leftImg8bit.npy"))) == 3
        # viewable PNG masks, the reference apply_spalign_kmeans.py:70-71
        # output format (raw 0/1 uint8, read back by the video tools)
        import cv2

        pngs = sorted(glob.glob(os.path.join(str(tmp_path),
                                             "*leftImg8bit.png")))
        assert len(pngs) == 3
        m = cv2.imread(pngs[0], cv2.IMREAD_GRAYSCALE)
        assert m.shape == (112, 112) and set(np.unique(m)) <= {0, 1}


class TestBF16:
    def test_quality_gate_f32_vs_bf16(self):
        """The gate behind LabelGenConfig.model_dtype='bfloat16' by
        default: mean Road IoU on the synthetic scenes must stay within
        run noise of f32 (same weights, same seeds)."""
        import dataclasses

        ds = SyntheticRoadScenes(n=6, full_shape=(256, 512), seed=31)
        sp = SuperpixelConfig(method="slic", n_slic_segments=40,
                              slic_iters=4, max_superpixels=128,
                              slic_enforce_connectivity=False)
        base = LabelGenConfig(batchsize=3, resize_shape=(112, 112),
                              superpixel=sp, save_masks=False)
        ious = {}
        for dt in ("float32", "bfloat16"):
            cfg = dataclasses.replace(base, model_dtype=dt)
            gen = SpalignLabelGenerator(cfg, seed=4)
            recs = gen.process_dataset(ds, save=False)
            ious[dt] = float(np.mean([r["road_iou"] for r in recs]))
        assert abs(ious["float32"] - ious["bfloat16"]) < 0.1, ious

    def test_quality_gate_superpixel_downscale(self):
        """The gate behind SuperpixelConfig.slic_device_downscale=2 on
        the fused spalign path (superpixel-map resolution as a compute
        format, docs/label_profile.md §3): mean Road IoU must stay
        within run noise of the full-resolution program (same weights,
        same seeds) — the same bar as the bf16 and overlaps-downscale
        gates.  20-image probe measured d=2 at parity-or-better
        (0.452/0.429 vs 0.406/0.437 per 10-image batch)."""
        import dataclasses

        ds = SyntheticRoadScenes(n=8, full_shape=(256, 512), seed=31)
        sp = SuperpixelConfig(method="slic", n_slic_segments=40,
                              slic_iters=4, max_superpixels=128,
                              slic_enforce_connectivity=False)
        base = LabelGenConfig(batchsize=8, resize_shape=(112, 112),
                              superpixel=sp, save_masks=False)
        gen1 = SpalignLabelGenerator(base, seed=4)
        cfg2 = dataclasses.replace(
            base, superpixel=dataclasses.replace(
                sp, slic_device_downscale=2))
        gen2 = SpalignLabelGenerator(cfg2, seed=4,
                                     variables=gen1.variables)
        ious = {}
        for name, gen in (("d1", gen1), ("d2", gen2)):
            recs = gen.process_dataset(ds, save=False)
            ious[name] = float(np.mean([r["road_iou"] for r in recs]))
        assert abs(ious["d1"] - ious["d2"]) < 0.1, ious

    def test_quality_gate_superpixel_downscale_multiseed(self, tmp_path):
        """Multi-seed strengthening of the d=2 gate (VERDICT r4 #6): the
        "recommended production config" claim needs more than one
        synthetic batch behind it.  5 scene seeds x 8 images, d=1 vs
        d=2 with identical weights and per-batch k-means keys.

        Measured (probe 2026-08-20, deterministic under these seeds):
        per-scene IoU delta (d2-d1) in [-0.057, +0.100], mean +0.034,
        CI95 half-width 0.071 — parity-or-better on average, no
        systematic loss.  (A +-0.01 CI is not attainable with a
        random-init DRN on synthetic scenes, where absolute IoU is
        ~0.45-0.55 and scene-to-scene spread dominates; the production
        claim is "no degradation", asserted as mean >= -0.02.)  Also
        gates the direct mask-agreement statistic: the two configs'
        saved full-res masks must agree on >= 70% of pixels per scene
        (measured per-scene means 0.747-0.945 — k-means cluster
        boundaries move with the superpixel tessellation, so agreement
        is structural, not near-1.0)."""
        import dataclasses

        ds_mk = lambda s: SyntheticRoadScenes(n=8, full_shape=(256, 512),
                                              seed=s)
        sp = SuperpixelConfig(method="slic", n_slic_segments=40,
                              slic_iters=4, max_superpixels=128,
                              slic_enforce_connectivity=False)
        base = LabelGenConfig(batchsize=8, resize_shape=(112, 112),
                              superpixel=sp, save_masks=True)
        gen1 = SpalignLabelGenerator(
            dataclasses.replace(base, out_dir=str(tmp_path / "d1")),
            seed=4)
        cfg2 = dataclasses.replace(
            base, out_dir=str(tmp_path / "d2"),
            superpixel=dataclasses.replace(sp, slic_device_downscale=2))
        gen2 = SpalignLabelGenerator(cfg2, seed=4,
                                     variables=gen1.variables)
        deltas, agrees = [], []
        for scene_seed in (31, 101, 202, 303, 404):
            ds = ds_mk(scene_seed)
            ious = {}
            for name, gen in (("d1", gen1), ("d2", gen2)):
                # identical k-means keys for the pair
                gen._seed_rng = np.random.RandomState(scene_seed)
                recs = gen.process_dataset(ds)
                ious[name] = float(np.mean([r["road_iou"]
                                            for r in recs]))
            deltas.append(ious["d2"] - ious["d1"])
            a = []
            for i in range(8):
                b = os.path.splitext(ds.image_name(i))[0]
                m1 = np.load(os.path.join(str(tmp_path / "d1"),
                                          b + ".npy"))
                m2 = np.load(os.path.join(str(tmp_path / "d2"),
                                          b + ".npy"))
                a.append(float(np.mean(m1 == m2)))
            agrees.append(float(np.mean(a)))
        d = np.asarray(deltas)
        assert d.mean() >= -0.02, deltas  # no systematic quality loss
        assert np.abs(d).max() <= 0.12, deltas
        assert min(agrees) >= 0.70, agrees

    def test_parity_init_pins_float32(self):
        """Bit-parity mode must ignore the bf16 default (its contract is
        bit-equality with the reference's host math)."""
        import dataclasses

        import jax.numpy as jnp

        sp = SuperpixelConfig(method="slic", n_slic_segments=40,
                              slic_iters=3, max_superpixels=128)
        cfg = LabelGenConfig(batchsize=2, resize_shape=(112, 112),
                             superpixel=sp, save_masks=False,
                             model_dtype="bfloat16",
                             kmeans=KMeansConfig(init="reference"))
        gen = SpalignLabelGenerator(cfg)
        assert gen.model.dtype in (None, jnp.float32)

    def test_bfloat16_feature_path(self, tmp_path):
        cfg = LabelGenConfig(
            batchsize=2, resize_shape=(112, 112),
            superpixel=SuperpixelConfig(method="slic", n_slic_segments=40,
                                        slic_iters=3, max_superpixels=128),
            out_dir=str(tmp_path), save_masks=False,
            model_dtype="bfloat16")
        ds = SyntheticRoadScenes(n=2, full_shape=(128, 256), seed=23)
        gen = SpalignLabelGenerator(cfg)
        records = gen.process_dataset(ds, save=False)
        assert len(records) == 2
        assert all(np.isfinite(r["road_iou"]) for r in records)


class TestHostScoring:
    def test_host_confusion_matches_device_op(self, rng):
        """The hot loop scores on the host (uploads are scarce on
        remote-attached TPUs); must stay bit-identical to the device
        score_full_res op."""
        import jax.numpy as jnp

        from spalign_tpu.pipeline.label_gen import (host_confusion,
                                                    score_full_res)

        road = rng.rand(3, 56, 56) > 0.6
        labels = rng.randint(0, 34, (3, 224, 448)).astype(np.uint8)
        dev = np.asarray(score_full_res(jnp.asarray(road),
                                        jnp.asarray(labels), (224, 448)))
        for b in range(3):
            host = host_confusion(road[b], labels[b])
            np.testing.assert_array_equal(host, dev[b])

    def test_host_confusion_full_res_pred(self, rng):
        """Overlaps mode hands over masks already at label resolution."""
        from spalign_tpu.pipeline.label_gen import host_confusion

        road = rng.rand(64, 128) > 0.5
        labels = rng.randint(0, 34, (64, 128)).astype(np.uint8)
        conf = host_confusion(road, labels)
        valid = ~np.isin(labels, range(7))
        assert conf.sum() == valid.sum()


class TestConfigVariants:
    def test_n_neighbors_not_4_rejected(self):
        """The reference's 4-nearest rule == closed-form 2x2 bilinear;
        other values must raise, not silently degrade (round-1 review)."""
        from spalign_tpu.config import AlignConfig

        with pytest.raises(ValueError, match="n_neighbors=8"):
            AlignConfig(n_neighbors=8)
        AlignConfig(n_neighbors=4)  # the supported value passes

    def test_without_pos_and_multimap(self, tmp_path):
        """--without_pos (no centroid features) and multi-map concat
        (--use_feature_maps 6 7), the reference's flag surface."""
        from spalign_tpu.config import AlignConfig

        cfg = LabelGenConfig(
            batchsize=2, resize_shape=(112, 112),
            use_feature_maps=(6, 7),
            align=AlignConfig(n_anchors=5, append_pos=False),
            superpixel=SuperpixelConfig(method="slic", n_slic_segments=40,
                                        slic_iters=3, max_superpixels=128),
            out_dir=str(tmp_path), save_masks=False)
        ds = SyntheticRoadScenes(n=2, full_shape=(128, 256), seed=29)
        gen = SpalignLabelGenerator(cfg)
        records = gen.process_dataset(ds, save=False)
        assert len(records) == 2
        assert all(np.isfinite(r["road_iou"]) for r in records)
        # feature width check: 2 maps x 512 ch, no +2 centroid
        import jax.numpy as jnp

        imgs, _ = ds.resized_batch(range(2), (112, 112))
        fmaps = gen.features(jnp.asarray(imgs))
        assert fmaps.shape[-1] == 1024


class TestResume:
    def test_skip_done(self, tmp_path):
        cfg = LabelGenConfig(
            batchsize=2, resize_shape=(112, 112),
            superpixel=SuperpixelConfig(method="slic", n_slic_segments=40,
                                        slic_iters=3, max_superpixels=128),
            out_dir=str(tmp_path), save_masks=False)
        ds = SyntheticRoadScenes(n=4, full_shape=(128, 256), seed=33)
        gen = SpalignLabelGenerator(cfg)
        done = {ds.image_name(0), ds.image_name(1)}
        records = gen.process_dataset(ds, save=False, skip_done=done)
        names = {r["img_fn"] for r in records}
        assert names == {ds.image_name(2), ds.image_name(3)}


class TestFusedSuperpixels:
    """slic_enforce_connectivity=False: SLIC runs INSIDE the fused
    program (single dispatch per batch).  Must equal the two-step
    composition (device SLIC without CC -> spalign_cluster) bit-level."""

    def _cfg(self, **kw):
        sp = SuperpixelConfig(method="slic", n_slic_segments=40,
                              slic_iters=4, max_superpixels=128,
                              slic_enforce_connectivity=False, **kw)
        return LabelGenConfig(batchsize=3, resize_shape=(112, 112),
                              superpixel=sp, save_masks=False)

    def test_matches_two_step(self):
        import jax

        from spalign_tpu.kernels.slic import slic, slic_grid_size
        from spalign_tpu.pipeline.label_gen import spalign_cluster

        cfg = self._cfg()
        ds = SyntheticRoadScenes(n=3, full_shape=(256, 512), seed=9)
        imgs, _ = ds.resized_batch(range(3), cfg.resize_shape)
        gen = SpalignLabelGenerator(cfg, seed=777)
        seed = gen._next_seed()  # the seed run_batch would consume
        prepared = gen._host_prepare(imgs, None, __import__(
            "spalign_tpu.utils.timers", fromlist=["StageTimer"]
        ).StageTimer())
        assert "sps_dev" not in prepared  # no host superpixel work
        road, _packed, cluster, assign, res, ok = gen._fused_program()(
            prepared["imgs_dev"], np.asarray([seed], np.uint32),
            np.int32(4))

        # manual two-step with the same seed
        sps = jax.vmap(lambda im: slic(
            im, n_segments=40, compactness=10.0, n_iter=4))(
            gen._put(imgs))
        fmaps = gen.features(gen._put(imgs).astype(np.float32))
        s_grid = slic_grid_size(112, 112, 40)
        road2, cluster2, assign2, _ = spalign_cluster(
            fmaps, sps, jax.random.key(np.uint32(seed)),
            n_anchors=cfg.align.n_anchors, num_segments=s_grid,
            append_pos=True, k=4, n_iter=cfg.kmeans.n_iter,
            prior_params=gen._prior_params)
        np.testing.assert_array_equal(np.asarray(cluster),
                                      np.asarray(cluster2))
        assert int(prepared["counts"][0]) == s_grid

    def test_pipeline_quality_holds(self):
        """No-CC masks must score in the same band as the CC path on
        the synthetic scenes (same weights, same seeds)."""
        import dataclasses

        ds = SyntheticRoadScenes(n=6, full_shape=(256, 512), seed=5)
        ious = {}
        for cc in (True, False):
            cfg = self._cfg()
            cfg = dataclasses.replace(cfg, superpixel=dataclasses.replace(
                cfg.superpixel, slic_enforce_connectivity=cc))
            gen = SpalignLabelGenerator(cfg)
            recs = gen.process_dataset(ds, save=False)
            ious[cc] = float(np.mean([r["road_iou"] for r in recs]))
        assert abs(ious[True] - ious[False]) < 0.1


class TestPackedMasks:
    def test_pack_unpack_roundtrip(self):
        import jax.numpy as jnp

        from spalign_tpu.pipeline.label_gen import (pack_mask_bits,
                                                    unpack_mask_bits)

        rng = np.random.RandomState(3)
        for w in (8, 28, 224, 13):  # incl. non-multiple-of-8
            m = rng.rand(2, 5, w) > 0.5
            packed = np.asarray(pack_mask_bits(jnp.asarray(m)))
            assert packed.dtype == np.uint8
            assert packed.shape == (2, 5, -(-w // 8))
            np.testing.assert_array_equal(unpack_mask_bits(packed, w), m)

    def test_program_packed_equals_road(self):
        sp = SuperpixelConfig(method="slic", n_slic_segments=40,
                              slic_iters=4, max_superpixels=128,
                              slic_enforce_connectivity=False)
        cfg = LabelGenConfig(batchsize=2, resize_shape=(112, 112),
                             superpixel=sp, save_masks=False)
        ds = SyntheticRoadScenes(n=2, full_shape=(256, 512), seed=2)
        imgs, _ = ds.resized_batch(range(2), cfg.resize_shape)
        gen = SpalignLabelGenerator(cfg)
        from spalign_tpu.utils.timers import StageTimer

        t = StageTimer()
        prepared = gen._host_prepare(imgs, None, t)
        handles = gen.dispatch_batch(prepared, t)
        from spalign_tpu.pipeline.label_gen import unpack_mask_bits

        road = np.asarray(handles["road"])
        packed = unpack_mask_bits(np.asarray(handles["road_packed"]),
                                  road.shape[-1])
        np.testing.assert_array_equal(road, packed)


class TestFusedDynamicK:
    def test_fused_dynamic_k_matches_static(self):
        """fused-SLIC + dynamic_k (the fast path under a k sweep) must
        reproduce the static-k fused program per k, with one trace."""
        import dataclasses

        sp = SuperpixelConfig(method="slic", n_slic_segments=40,
                              slic_iters=4, max_superpixels=128,
                              slic_enforce_connectivity=False)
        base = LabelGenConfig(batchsize=3, resize_shape=(112, 112),
                              superpixel=sp, save_masks=False)
        ds = SyntheticRoadScenes(n=3, full_shape=(256, 512), seed=9)
        imgs, _ = ds.resized_batch(range(3), base.resize_shape)

        gen_dyn = SpalignLabelGenerator(base, seed=5, dynamic_k=6)
        from spalign_tpu.utils.timers import StageTimer

        for k in (2, 4, 6):
            gen_dyn.set_n_clusters(k)
            cfg_k = dataclasses.replace(base, kmeans=dataclasses.replace(
                base.kmeans, n_clusters=k))
            gen_static = SpalignLabelGenerator(cfg_k, seed=5)
            # align the seed streams
            gen_dyn._seed_rng = np.random.RandomState(123)
            gen_static._seed_rng = np.random.RandomState(123)
            t = StageTimer()
            h_dyn = gen_dyn.dispatch_batch(
                gen_dyn._host_prepare(imgs, None, t), t)
            h_sta = gen_static.dispatch_batch(
                gen_static._host_prepare(imgs, None, t), t)
            np.testing.assert_array_equal(np.asarray(h_dyn["cluster"]),
                                          np.asarray(h_sta["cluster"]))
        assert gen_dyn.n_program_traces() == 1


class TestReconfigureInvalidation:
    """Regression tests for the round-2 advisor findings: which config
    fields must invalidate compiled programs on reconfigure."""

    def _gen(self, **kw):
        sp = SuperpixelConfig(method="slic", n_slic_segments=40,
                              slic_iters=4, max_superpixels=128,
                              slic_enforce_connectivity=False)
        cfg = LabelGenConfig(batchsize=2, resize_shape=(112, 112),
                             superpixel=sp, save_masks=False)
        return SpalignLabelGenerator(cfg, **kw), cfg

    def test_parity_init_bakes_n_clusters_even_with_dynamic_k(self):
        """With init='reference', stage_b bakes k into its closure — a
        dynamic_k generator must still invalidate on n_clusters change
        (advisor: every fig7 parity-sweep row silently reran the first
        row's k)."""
        import dataclasses

        gen, cfg = self._gen(dynamic_k=6)
        ref = dataclasses.replace(cfg, kmeans=dataclasses.replace(
            cfg.kmeans, init="reference"))
        f3 = gen._program_fields(dataclasses.replace(
            ref, kmeans=dataclasses.replace(ref.kmeans, n_clusters=3)))
        f5 = gen._program_fields(dataclasses.replace(
            ref, kmeans=dataclasses.replace(ref.kmeans, n_clusters=5)))
        assert f3 != f5
        # device init keeps the single dynamic program across k
        d3 = gen._program_fields(dataclasses.replace(
            cfg, kmeans=dataclasses.replace(cfg.kmeans, n_clusters=3)))
        d5 = gen._program_fields(dataclasses.replace(
            cfg, kmeans=dataclasses.replace(cfg.kmeans, n_clusters=5)))
        assert d3 == d5

    def test_reconfigure_rejects_k_above_dynamic_bound(self):
        gen, cfg = self._gen(dynamic_k=4)
        with pytest.raises(ValueError, match="dynamic_k"):
            gen.set_n_clusters(6)

    def test_resize_shape_invalidates_fused_program(self):
        """The fused-SLIC program bakes the grid size computed from
        resize_shape; changing it must drop the compiled program."""
        import dataclasses

        gen, cfg = self._gen()
        assert (gen._program_fields(cfg)
                != gen._program_fields(dataclasses.replace(
                    cfg, resize_shape=(224, 224))))

    def test_model_dtype_change_rebuilds_model(self):
        import dataclasses

        import jax.numpy as jnp

        gen, cfg = self._gen()
        assert gen.model.dtype == jnp.bfloat16  # the default dtype
        f32 = dataclasses.replace(cfg, model_dtype="float32")
        gen.reconfigure(f32)
        assert gen.model.dtype in (None, jnp.float32)
        gen.reconfigure(cfg)
        assert gen.model.dtype == jnp.bfloat16


class TestMultiGroupDispatch:
    """groups_per_dispatch fuses G independent clustering batches into
    one device program; per-group semantics and the seed stream must be
    bit-identical to G single-group dispatches."""

    def _cfg(self, groups, **kw):
        import dataclasses

        sp = SuperpixelConfig(method="slic", n_slic_segments=40,
                              slic_iters=4, max_superpixels=128,
                              slic_enforce_connectivity=False)
        return LabelGenConfig(batchsize=2, resize_shape=(112, 112),
                              superpixel=sp, save_masks=False,
                              groups_per_dispatch=groups, **kw)

    def test_grouped_equals_single_fused_slic(self):
        ds = SyntheticRoadScenes(n=8, full_shape=(256, 512), seed=11)
        recs = {}
        for g in (1, 3):  # 3 does not divide 4 slices -> ragged tail unit
            gen = SpalignLabelGenerator(self._cfg(g), seed=42)
            recs[g] = gen.process_dataset(ds, save=False)
        assert len(recs[1]) == len(recs[3]) == 8
        for r1, rg in zip(recs[1], recs[3]):
            assert r1["img_fn"] == rg["img_fn"]
            for k in ("TP", "FP", "FN", "road_iou", "kmeans_iters",
                      "kmeans_converged"):
                assert r1[k] == rg[k], (k, r1[k], rg[k])

    def test_grouped_equals_single_host_superpixels(self):
        """The non-fused program (host superpixel maps) takes the same
        multi-group path."""
        import dataclasses

        ds = SyntheticRoadScenes(n=4, full_shape=(256, 512), seed=13)
        recs = {}
        for g in (1, 2):
            cfg = self._cfg(g)
            cfg = dataclasses.replace(cfg, superpixel=dataclasses.replace(
                cfg.superpixel, slic_enforce_connectivity=True))
            gen = SpalignLabelGenerator(cfg, seed=7)
            recs[g] = gen.process_dataset(ds, save=False)
        for r1, rg in zip(recs[1], recs[2]):
            for k in ("TP", "FP", "FN", "kmeans_iters"):
                assert r1[k] == rg[k], (k, r1[k], rg[k])

    def test_grouped_equals_single_direct_mode(self):
        from spalign_tpu.pipeline.direct import make_label_generator

        ds = SyntheticRoadScenes(n=4, full_shape=(256, 512), seed=17)
        recs = {}
        for g in (1, 2):
            cfg = LabelGenConfig(mode="direct", batchsize=2,
                                 resize_shape=(112, 112), save_masks=False,
                                 groups_per_dispatch=g)
            gen = make_label_generator(cfg, seed=3)
            recs[g] = gen.process_dataset(ds, save=False)
        for r1, rg in zip(recs[1], recs[2]):
            for k in ("TP", "FP", "FN", "kmeans_iters"):
                assert r1[k] == rg[k], (k, r1[k], rg[k])


class TestHostSavePath:
    """Saved full-res masks derive on the HOST from the already-fetched
    small masks (cv2 NN == device nn_resize_cv2, bit-identical) — the
    old save path downloaded ~4 MB/img of device-upsampled uint8."""

    def test_saved_masks_equal_device_upsample(self, tmp_path):
        import glob
        import os

        import jax.numpy as jnp

        from spalign_tpu.ops.resize import nn_resize_cv2
        from spalign_tpu.pipeline.label_gen import SpalignLabelGenerator

        sp = SuperpixelConfig(method="slic", n_slic_segments=40,
                              slic_iters=4, max_superpixels=128,
                              slic_enforce_connectivity=False)
        cfg = LabelGenConfig(batchsize=3, resize_shape=(112, 112),
                             superpixel=sp, save_masks=True,
                             out_dir=str(tmp_path / "out"))
        ds = SyntheticRoadScenes(n=3, full_shape=(256, 512), seed=21)
        gen = SpalignLabelGenerator(cfg, seed=9)

        # oracle: the device program's small masks, upsampled ON DEVICE
        imgs, _ = ds.resized_batch(range(3), cfg.resize_shape)
        road, cluster, _, _ = gen.run_batch(imgs)
        dev_road = np.asarray(nn_resize_cv2(
            jnp.asarray(np.asarray(road)).astype(jnp.uint8), (256, 512)))
        dev_cluster = np.asarray(nn_resize_cv2(
            jnp.asarray(np.asarray(cluster)).astype(jnp.uint8),
            (256, 512)))

        gen2 = SpalignLabelGenerator(cfg, seed=9)  # same seed stream
        recs = gen2.process_dataset(ds, save=True)
        assert len(recs) == 3
        for i in range(3):
            base = os.path.splitext(ds.image_name(i))[0]
            saved = np.load(os.path.join(cfg.out_dir, base + ".npy"))
            saved_c = np.load(os.path.join(
                cfg.out_dir, base + "_all_cluster.npy"))
            assert saved.shape == (256, 512) and saved.dtype == np.uint8
            np.testing.assert_array_equal(saved, dev_road[i])
            np.testing.assert_array_equal(saved_c, dev_cluster[i])


class TestFetchAhead:
    """The dedicated fetch thread (process_dataset submits each unit's
    combined device_get right after its dispatch, perf_playbook §7) must
    be a pure pipelining change: identical records with it on and off,
    and the retry path must work when the PRE-SUBMITTED fetch is the one
    reporting a degenerate unit."""

    def _cfg(self, **kw):
        return LabelGenConfig(
            batchsize=4, resize_shape=(112, 112),
            superpixel=SuperpixelConfig(
                method="slic", n_slic_segments=50, slic_iters=4,
                max_superpixels=128, slic_enforce_connectivity=False),
            kmeans=KMeansConfig(n_clusters=4, max_retries=3),
            save_masks=False, **kw)

    @staticmethod
    def _stable(records):
        drop = ("time_", "elapsed")
        return [{k: v for k, v in r.items()
                 if not k.startswith(drop)} for r in records]

    def test_records_identical_on_and_off(self):
        cfg = self._cfg(groups_per_dispatch=2)
        ds = SyntheticRoadScenes(n=8, full_shape=(256, 512), seed=3)
        out = {}
        for fa in (True, False):
            gen = SpalignLabelGenerator(cfg, seed=11)  # same seed stream
            gen.fetch_ahead = fa
            out[fa] = self._stable(gen.process_dataset(ds, save=False))
        assert out[True] == out[False]

    def test_retry_after_prefetched_fetch(self):
        """Force the first dispatch to look degenerate: finish_batch must
        consume the pre-submitted future, detect the failure, re-dispatch
        synchronously, and return the retry's (good) results."""
        import jax.numpy as jnp

        cfg = self._cfg()
        ds = SyntheticRoadScenes(n=4, full_shape=(256, 512), seed=5)

        gen = SpalignLabelGenerator(cfg, seed=11)
        ref = self._stable(gen.process_dataset(ds, save=False))

        gen2 = SpalignLabelGenerator(cfg, seed=11)
        orig = gen2.dispatch_batch
        calls = {"n": 0}

        def flaky(prepared, timers):
            handles = orig(prepared, timers)
            calls["n"] += 1
            if calls["n"] == 1:
                handles["ok"] = jnp.zeros_like(handles["ok"])
            return handles

        gen2.dispatch_batch = flaky
        got = gen2.process_dataset(ds, save=False)
        assert calls["n"] == 2  # one unit + one retry re-dispatch
        assert all(r["kmeans_iters"] > 0 for r in got)
        # the retry consumed one extra seed, so masks may differ; the
        # record STRUCTURE and scoring must be intact
        assert {r["img_fn"] for r in got} == {r["img_fn"] for r in ref}
        assert all(0.0 <= r["road_iou"] <= 1.0 for r in got)
