"""Image-uplink wire formats (pipeline/wire.py).

yuv420 halves the bytes per image on the serialized uplink of
remote-attached TPUs; these tests pin (a) codec correctness, (b) the
pipeline quality gate vs rgb8, and (c) the config-validation and
program-invalidation plumbing.  No reference analog (the reference's
images sit in GPU-local host RAM); SURVEY.md §5.1 transfer discipline.
"""

import dataclasses

import numpy as np
import pytest

from spalign_tpu.config import (KMeansConfig, LabelGenConfig,
                                SuperpixelConfig)
from spalign_tpu.data.synthetic import SyntheticRoadScenes
from spalign_tpu.pipeline.wire import (decode_yuv420, pack_yuv420,
                                       yuv420_bytes_per_image)


def _fused_cfg(**kw):
    sp = SuperpixelConfig(method="slic", n_slic_segments=40,
                          slic_iters=4, max_superpixels=128,
                          slic_enforce_connectivity=False)
    base = dict(batchsize=3, resize_shape=(112, 112), superpixel=sp,
                save_masks=False)
    base.update(kw)
    return LabelGenConfig(**base)


class TestCodec:
    def test_bytes_per_image(self):
        assert yuv420_bytes_per_image((224, 224)) == 224 * 224 * 3 // 2
        with pytest.raises(ValueError):
            yuv420_bytes_per_image((223, 224))

    def test_roundtrip_close_on_natural_images(self):
        """Chroma is 2x2-subsampled, so the roundtrip is lossy — but on
        camera-like content (the synthetic scenes) it must stay within
        a few intensity levels per channel on average."""
        ds = SyntheticRoadScenes(n=2, full_shape=(128, 256), seed=7)
        imgs = np.stack([ds[i][0] for i in range(2)]).astype(np.uint8)
        packed = pack_yuv420(imgs)
        assert packed.shape == (2, yuv420_bytes_per_image((128, 256)))
        dec = np.asarray(decode_yuv420(packed, (128, 256)))
        assert dec.shape == imgs.shape and dec.dtype == np.uint8
        err = np.abs(dec.astype(np.int32) - imgs.astype(np.int32))
        assert err.mean() < 4.0, err.mean()
        # luma carries the structure; Y-only reconstruction error is
        # tighter still (pure matrix roundtrip + rounding)
        assert np.median(err) <= 2.0

    def test_decode_exact_on_grey(self):
        """Grey images have zero chroma: the roundtrip must be near-exact
        (rounding only) since subsampling averages equal values."""
        g = np.linspace(0, 255, 64 * 64).reshape(64, 64).astype(np.uint8)
        imgs = np.repeat(g[None, :, :, None], 3, axis=-1)
        dec = np.asarray(decode_yuv420(pack_yuv420(imgs), (64, 64)))
        assert np.abs(dec.astype(int) - imgs.astype(int)).max() <= 2


class TestValidation:
    def test_odd_shape_rejected(self):
        with pytest.raises(ValueError, match="even"):
            from spalign_tpu.pipeline.label_gen import \
                SpalignLabelGenerator

            SpalignLabelGenerator(_fused_cfg(resize_shape=(113, 112),
                                             upload_format="yuv420"))

    def test_parity_mode_rejected(self):
        from spalign_tpu.pipeline.label_gen import SpalignLabelGenerator

        with pytest.raises(ValueError, match="parity"):
            SpalignLabelGenerator(_fused_cfg(
                upload_format="yuv420",
                kmeans=KMeansConfig(init="reference")))

    def test_host_superpixel_spalign_rejected(self):
        from spalign_tpu.pipeline.label_gen import SpalignLabelGenerator

        sp = SuperpixelConfig(method="slic", n_slic_segments=40,
                              slic_iters=4, max_superpixels=128,
                              slic_enforce_connectivity=True)  # host CC
        with pytest.raises(ValueError, match="fused"):
            SpalignLabelGenerator(_fused_cfg(superpixel=sp,
                                             upload_format="yuv420"))

    def test_reconfigure_invalidates_program(self):
        from spalign_tpu.pipeline.label_gen import SpalignLabelGenerator

        gen = SpalignLabelGenerator(_fused_cfg(), seed=3)
        ds = SyntheticRoadScenes(n=3, full_shape=(128, 256), seed=11)
        gen.process_dataset(ds, save=False)
        assert gen._fused is not None
        gen.reconfigure(dataclasses.replace(gen.cfg,
                                            upload_format="yuv420"))
        assert gen._fused is None  # decode stage is program-baked


class TestPipelineQuality:
    def test_quality_gate_rgb8_vs_yuv420(self):
        """The gate behind offering upload_format='yuv420': mean Road
        IoU on the synthetic scenes must stay within run noise of rgb8
        (same weights, same seeds) through the fused-SLIC pipeline."""
        from spalign_tpu.pipeline.label_gen import SpalignLabelGenerator

        ds = SyntheticRoadScenes(n=6, full_shape=(256, 512), seed=31)
        ious = {}
        for fmt in ("rgb8", "yuv420"):
            gen = SpalignLabelGenerator(_fused_cfg(upload_format=fmt),
                                        seed=4)
            recs = gen.process_dataset(ds, save=False)
            ious[fmt] = float(np.mean([r["road_iou"] for r in recs]))
        assert abs(ious["rgb8"] - ious["yuv420"]) < 0.1, ious

    def test_direct_mode_runs_yuv420(self):
        from spalign_tpu.pipeline.direct import DirectLabelGenerator

        cfg = _fused_cfg(mode="direct", upload_format="yuv420")
        ds = SyntheticRoadScenes(n=3, full_shape=(128, 256), seed=13)
        gen = DirectLabelGenerator(cfg, seed=2)
        recs = gen.process_dataset(ds, save=False)
        assert len(recs) == 3
        assert all(np.isfinite(r["road_iou"]) for r in recs)


class TestOverlapsWire:
    def test_overlaps_slic_yuv420_quality_gate(self):
        """Overlaps mode with the device-SLIC frontend ships BOTH
        uploads (clustering batch + full-res frames) as YUV420; road
        IoU must stay within run noise of the rgb8 wire."""
        from spalign_tpu.pipeline.direct import OverlapsLabelGenerator

        ds = SyntheticRoadScenes(n=4, full_shape=(128, 256), seed=37)
        ious = {}
        for fmt in ("rgb8", "yuv420"):
            sp = SuperpixelConfig(method="slic", n_slic_segments=64,
                                  slic_iters=3, max_superpixels=128,
                                  slic_enforce_connectivity=False)
            cfg = LabelGenConfig(mode="overlaps", batchsize=2,
                                 resize_shape=(112, 112), superpixel=sp,
                                 save_masks=False, upload_format=fmt)
            gen = OverlapsLabelGenerator(cfg, seed=5)
            recs = gen.process_dataset(ds, save=False)
            ious[fmt] = float(np.mean([r["road_iou"] for r in recs]))
        assert abs(ious["rgb8"] - ious["yuv420"]) < 0.12, ious
