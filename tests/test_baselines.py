"""Baseline-mode tests: direct pixel clustering + superpixel overlaps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spalign_tpu.config import (KMeansConfig, LabelGenConfig,
                                SuperpixelConfig)
from spalign_tpu.data.synthetic import SyntheticRoadScenes
from spalign_tpu.pipeline.direct import (DirectLabelGenerator,
                                         OverlapsLabelGenerator,
                                         direct_cluster, overlaps_refine,
                                         make_label_generator)


class TestDirectCluster:
    def test_feature_rows_include_xy(self, rng):
        """Clustering must be sensitive to the appended (x, y) ints:
        constant features still separate spatially."""
        fmaps = jnp.zeros((2, 8, 8, 4))
        road, cluster, res = direct_cluster(
            fmaps, jax.random.key(0), k=2, n_iter=100,
            prior_params=(0.75, 0.5, 0.1, 0.1))
        assert road.shape == (2, 8, 8)
        # identical images -> identical maps
        np.testing.assert_array_equal(np.asarray(road[0]),
                                      np.asarray(road[1]))
        # cluster 0 concentrated at bottom-center (prior-seeded)
        r = np.asarray(road[0])
        assert r[6:, 3:5].mean() >= r[:2].mean()

    def test_separates_feature_blobs(self, rng):
        """Pixels with distinct feature signatures cluster apart."""
        fm = np.zeros((1, 8, 8, 4), np.float32)
        fm[0, 4:, :, 0] = 50.0  # bottom half distinct
        fm[0, :4, :, 1] = 50.0
        road, cluster, res = direct_cluster(
            jnp.asarray(fm), jax.random.key(1), k=2, n_iter=100,
            prior_params=(0.75, 0.5, 0.3, 0.5))
        c = np.asarray(cluster[0])
        assert (c[4:] == 0).all()
        assert (c[:4] != 0).all()


class TestOverlapsRefine:
    def test_snapping(self):
        # coarse road: bottom-left quadrant of a 4x4 map
        road_small = np.zeros((1, 4, 4), bool)
        road_small[0, 2:, :2] = True
        # full-res superpixels: 4 vertical strips of 8x16
        sp = np.zeros((1, 16, 16), np.int32)
        for s in range(4):
            sp[0, :, s * 4:(s + 1) * 4] = s
        refined = np.asarray(overlaps_refine(
            jnp.asarray(road_small), jnp.asarray(sp), 0.05,
            num_segments=8))
        # strips 0-1 overlap the road quadrant; 2-3 don't
        assert refined[0][:, :8].any()
        assert not refined[0][:, 8:].any()
        # snapped regions are full superpixels
        for s in range(2):
            strip = refined[0][:, s * 4:(s + 1) * 4]
            assert strip.all() or not strip.any()

    def test_empty_prediction_stays_empty(self):
        road_small = np.zeros((1, 4, 4), bool)
        sp = np.zeros((1, 8, 8), np.int32)
        refined = np.asarray(overlaps_refine(
            jnp.asarray(road_small), jnp.asarray(sp), 0.01,
            num_segments=4))
        assert not refined.any()


class TestBaselineGenerators:
    def _ds(self):
        return SyntheticRoadScenes(n=4, full_shape=(128, 256), seed=31)

    def test_direct_e2e(self, tmp_path):
        cfg = LabelGenConfig(mode="direct", batchsize=4,
                             resize_shape=(112, 112),
                             out_dir=str(tmp_path), save_masks=True)
        gen = make_label_generator(cfg)
        assert isinstance(gen, DirectLabelGenerator)
        records = gen.process_dataset(self._ds())
        assert len(records) == 4
        assert all("road_iou" in r for r in records)
        assert all(r["mode"] == "direct" for r in records)

    def test_overlaps_e2e(self, tmp_path):
        cfg = LabelGenConfig(
            mode="overlaps", batchsize=4, resize_shape=(112, 112),
            superpixel=SuperpixelConfig(
                method="slic", n_slic_segments=60, slic_iters=3,
                max_superpixels=256),
            out_dir=str(tmp_path), save_masks=False)
        gen = make_label_generator(cfg)
        assert isinstance(gen, OverlapsLabelGenerator)
        records = gen.process_dataset(self._ds(), save=False)
        assert len(records) == 4
        for r in records:
            assert "road_iou" in r
            assert "time_refine" in r and "time_superpixel" in r

    def test_overlaps_device_slic_frontend(self, tmp_path):
        """slic + no-connectivity runs full-res superpixels ON DEVICE
        (label maps never reach the host) and downloads masks packed;
        masks must be unions of that device SLIC segmentation and the
        packed downlink must be lossless."""
        from spalign_tpu.pipeline.label_gen import (StageTimer,
                                                    unpack_mask_bits)
        from spalign_tpu.pipeline.superpixels import batched_slic_device

        sp = SuperpixelConfig(method="slic", n_slic_segments=40,
                              slic_iters=3, max_superpixels=256,
                              slic_enforce_connectivity=False)
        cfg = LabelGenConfig(mode="overlaps", batchsize=2,
                             resize_shape=(112, 112), superpixel=sp,
                             out_dir=str(tmp_path), save_masks=False)
        ds = SyntheticRoadScenes(n=2, full_shape=(128, 256), seed=31)
        gen = make_label_generator(cfg, seed=5)
        imgs, _ = ds.resized_batch(range(2), (112, 112))
        full = np.stack([ds[i][0] for i in range(2)])

        timers = StageTimer()
        prepared = gen._host_prepare(imgs, full, timers)
        prepared["n_groups"] = 1
        assert hasattr(prepared["full_sps"], "devices")  # stayed on device
        handles = gen.dispatch_batch(prepared, timers)
        road, _, _ = gen.finish_batch(prepared, handles, timers)
        road = np.asarray(road)
        assert road.shape == (2, 128, 256)
        # packed downlink is lossless
        np.testing.assert_array_equal(
            unpack_mask_bits(np.asarray(handles["road_packed"]), 256),
            road)
        # masks are unions of the device SLIC segmentation
        sps = np.asarray(batched_slic_device(
            40, sp.slic_compactness, 3)(jnp.asarray(full)))
        for b in range(2):
            for s in np.unique(sps[b]):
                vals = road[b][sps[b] == s]
                assert vals.all() or not vals.any()

    def test_overlaps_device_slic_downscale_quality_gate(self, tmp_path):
        """slic_device_downscale=2 (SuperpixelConfig) computes the
        full-res superpixels at half scale and NN-upsamples the refined
        mask on device — the uplink lever for the overlaps mode.  Gate:
        masks stay full-resolution, 2x2-block constant, and close to the
        exact full-res variant (the deviation moves only superpixel
        boundaries, so mask agreement must stay high)."""
        def run(downscale):
            sp = SuperpixelConfig(method="slic", n_slic_segments=40,
                                  slic_iters=3, max_superpixels=256,
                                  slic_enforce_connectivity=False,
                                  slic_device_downscale=downscale)
            cfg = LabelGenConfig(mode="overlaps", batchsize=2,
                                 resize_shape=(112, 112), superpixel=sp,
                                 out_dir=str(tmp_path), save_masks=False)
            gen = make_label_generator(cfg, seed=5)
            imgs, _ = ds.resized_batch(range(2), (112, 112))
            full = np.stack([ds[i][0] for i in range(2)])
            road, _, _, _ = gen.run_batch(imgs, full_images=full)
            return np.asarray(road)

        ds = SyntheticRoadScenes(n=2, full_shape=(128, 256), seed=31)
        exact, halved = run(1), run(2)
        assert halved.shape == (2, 128, 256)
        # 2x2-block constant (NN-upsampled from half resolution)
        assert np.array_equal(halved, np.repeat(np.repeat(
            halved[:, ::2, ::2], 2, axis=1), 2, axis=2))
        # quality gate: high agreement with the exact full-res variant
        inter = (exact & halved).sum()
        union = (exact | halved).sum()
        assert union > 0 and inter / union > 0.85, inter / union

    def test_overlaps_masks_respect_superpixels(self, tmp_path):
        """Refined masks must be unions of full-res superpixels."""
        from spalign_tpu.pipeline.superpixels import compute_superpixels

        cfg = LabelGenConfig(
            mode="overlaps", batchsize=2, resize_shape=(112, 112),
            superpixel=SuperpixelConfig(method="slic", n_slic_segments=40,
                                        slic_iters=3, max_superpixels=256),
            out_dir=str(tmp_path))
        ds = SyntheticRoadScenes(n=2, full_shape=(128, 256), seed=31)
        gen = make_label_generator(cfg)
        imgs, _ = ds.resized_batch(range(2), (112, 112))
        full = np.stack([ds[i][0] for i in range(2)])
        road, cluster, diag, _ = gen.run_batch(imgs, full_images=full)
        road = np.asarray(road)
        assert road.shape == (2, 128, 256)
        sps, _ = compute_superpixels(full, cfg.superpixel)
        # refinement is deterministic given sp maps: every superpixel is
        # uniformly road or non-road
        for b in range(2):
            for s in np.unique(sps[b]):
                vals = road[b][sps[b] == s]
                assert vals.all() or not vals.any()


def test_native_confusion_matches_numpy_chain():
    """native.confusion_vs_labelids (fused C++ NN-upsample + remap +
    count; the GT-scoring hot path) must equal the cv2+LUT+bincount
    chain bit-for-bit across shapes, including odd ratios."""
    import cv2

    from spalign_tpu import native
    from spalign_tpu.pipeline.label_gen import _CONF_LUT

    if native.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.RandomState(3)
    shapes = [((224, 224), (1024, 2048)), ((28, 28), (512, 1024)),
              ((64, 64), (64, 64)), ((33, 57), (130, 250))]
    for (ph, pw), (hh, ww) in shapes:
        pred = rng.rand(ph, pw) > 0.5
        gt = rng.randint(0, 40, (hh, ww)).astype(np.uint8)
        a = native.confusion_vs_labelids(pred, gt)
        up = pred.astype(np.uint8)
        if (ph, pw) != (hh, ww):
            up = cv2.resize(up, (ww, hh),
                            interpolation=cv2.INTER_NEAREST)
        idx = _CONF_LUT[gt] * 2 + up
        c = np.bincount(idx.ravel(), minlength=6)
        b = np.array([[c[2], c[3]], [c[4], c[5]]], np.int64)
        np.testing.assert_array_equal(a, b)


def test_native_relabel_host_ops_match_numpy():
    """The three relabel host-path C++ ops (one_minus_f16 over all 64K
    bit patterns, confusion_remapped incl. out-of-range void gt,
    standardize_invert_u8 rint/clip/cast) must be bit-equal to the
    numpy chains they replace (selftrain/relabel.py fallbacks)."""
    from spalign_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    # 1 - x over every possible f16 bit pattern (NaN-in -> NaN-out)
    x = np.arange(65536, dtype=np.uint16).view(np.float16)
    got = native.one_minus_f16(x)
    with np.errstate(invalid="ignore"):
        ref = (1.0 - x.astype(np.float32)).astype(np.float16)
    nan_both = np.isnan(got) & np.isnan(ref)
    mism = (got.view(np.uint16) != ref.view(np.uint16)) & ~nan_both
    assert not mism.any()

    rng = np.random.RandomState(7)
    pred = rng.rand(257, 511) > 0.5
    gt = rng.randint(-1, 2, (257, 511)).astype(np.int32)
    gt.ravel()[::97] = -100  # stray void value outside {-1,0,1}
    conf = native.confusion_remapped(pred, gt)
    gt_i = np.clip(gt.astype(np.int64), -1, 2)
    idx = ((gt_i + 1) * 2 + pred.astype(np.int64)).ravel()
    c = np.bincount(idx, minlength=8)
    np.testing.assert_array_equal(
        conf, np.array([[c[2], c[3]], [c[4], c[5]]], np.int64))

    imgs = (rng.randn(2, 37, 53, 3) * 2).astype(np.float32)
    mean = np.array([73.1, 82.9, 72.4], np.float32)
    std = np.array([44.9, 46.2, 45.3], np.float32)
    got = native.standardize_invert_u8(imgs, mean, std)
    np.testing.assert_array_equal(
        got, np.clip(np.rint(imgs * std + mean), 0, 255).astype(np.uint8))


def test_downscale_knob_rejected_off_device_slic_path():
    """slic_device_downscale>1 is read only by the device-SLIC
    frontends (overlaps mode and the fused spalign program); every
    other path would silently ignore it, so the config rejects the
    combination at construction (cli/label_gen.py knob)."""
    sp_felz = SuperpixelConfig(method="felzenszwalb",
                               slic_device_downscale=2)
    with pytest.raises(ValueError, match="slic_device_downscale"):
        LabelGenConfig(mode="spalign", superpixel=sp_felz)
    sp_conn = SuperpixelConfig(method="slic", slic_device_downscale=2,
                               slic_enforce_connectivity=True)
    with pytest.raises(ValueError, match="slic_device_downscale"):
        LabelGenConfig(mode="overlaps", superpixel=sp_conn)
    # the valid combinations construct fine
    sp_ok = SuperpixelConfig(method="slic", slic_device_downscale=2,
                             slic_enforce_connectivity=False)
    LabelGenConfig(mode="overlaps", superpixel=sp_ok)
    LabelGenConfig(mode="spalign", superpixel=sp_ok)  # fused program
    # fused spalign additionally requires d | resize_shape (the box-mean
    # reshape) and the device k-means init (the fused program)
    with pytest.raises(ValueError, match="divide"):
        LabelGenConfig(mode="spalign", superpixel=sp_ok,
                       resize_shape=(225, 224))
    from spalign_tpu.config import KMeansConfig

    with pytest.raises(ValueError, match="slic_device_downscale"):
        LabelGenConfig(mode="spalign", superpixel=sp_ok,
                       kmeans=KMeansConfig(init="reference"))
