"""Data-layer tests: zip readers, estimated datasets, loader, augment."""

import os
import zipfile

import cv2
import numpy as np
import pytest

from spalign_tpu.data.cityscapes import (CITYSCAPES_MEAN, CITYSCAPES_STD,
                                         FileListDataset,
                                         ZippedCityscapesRoadDataset)
from spalign_tpu.data.estimated import (EstimatedCityscapesDataset,
                                        pca_lighting)
from spalign_tpu.data.loader import PrefetchLoader
from spalign_tpu.data.synthetic import SyntheticRoadScenes
from spalign_tpu.selftrain.relabel import NpzShardWriter


def make_cityscapes_zips(tmp_path, n=4, hw=(64, 128)):
    """Tiny cityscapes-like zips from synthetic scenes."""
    ds = SyntheticRoadScenes(n=n, full_shape=hw, seed=9)
    img_zip = str(tmp_path / "imgs.zip")
    lab_zip = str(tmp_path / "labels.zip")
    with zipfile.ZipFile(img_zip, "w") as zi, \
            zipfile.ZipFile(lab_zip, "w") as zl:
        for i in range(n):
            img, lab = ds[i]
            key = f"city_{i:06d}_000019"
            ok, enc = cv2.imencode(".png", img[:, :, ::-1])
            zi.writestr(f"train/city/{key}_leftImg8bit.png", enc.tobytes())
            ok, enc = cv2.imencode(".png", lab)
            zl.writestr(f"train/city/{key}_gtFine_labelIds.png",
                        enc.tobytes())
    return img_zip, lab_zip, ds


class TestZippedCityscapes:
    def test_pairing_and_remap(self, tmp_path):
        img_zip, lab_zip, ds = make_cityscapes_zips(tmp_path)
        d = ZippedCityscapesRoadDataset(img_zip, lab_zip, (32, 64))
        assert len(d) == 4
        img, label = d[0]
        assert img.shape == (32, 64, 3)  # image resized
        assert label.shape == (64, 128)  # label full-res
        assert set(np.unique(label)) <= {-1, 0, 1}
        # standardized image stats
        raw_img, raw_lab = ds[0]
        # road pixels of the remapped label == labelIds 7
        np.testing.assert_array_equal(label == 1, raw_lab == 7)
        np.testing.assert_array_equal(label == -1, raw_lab <= 6)

    def test_unstandardized_batch_path(self, tmp_path):
        img_zip, lab_zip, _ = make_cityscapes_zips(tmp_path)
        d = ZippedCityscapesRoadDataset(img_zip, lab_zip, (32, 64),
                                        standardize=False)
        imgs, labels = d.resized_batch([0, 1], (32, 64))
        assert imgs.dtype == np.uint8
        assert imgs.shape == (2, 32, 64, 3)
        assert labels.shape == (2, 64, 128)

    def test_missing_zip_raises(self, tmp_path):
        with pytest.raises(ValueError):
            ZippedCityscapesRoadDataset(str(tmp_path / "nope.zip"),
                                        str(tmp_path / "nope2.zip"),
                                        (32, 64))


class TestFileList:
    def test_file_lists(self, tmp_path):
        ds = SyntheticRoadScenes(n=2, full_shape=(64, 128), seed=9)
        img_fns, lab_fns = [], []
        for i in range(2):
            img, lab = ds[i]
            fi = str(tmp_path / f"img{i}.png")
            fl = str(tmp_path / f"lab{i}.png")
            cv2.imwrite(fi, img[:, :, ::-1])
            cv2.imwrite(fl, lab)
            img_fns.append(fi)
            lab_fns.append(fl)
        il = tmp_path / "imgs.txt"
        ll = tmp_path / "labels.txt"
        il.write_text("\n".join(img_fns) + "\n")
        ll.write_text("\n".join(lab_fns) + "\n")
        d = FileListDataset(str(il), str(ll), (32, 64))
        assert len(d) == 2
        img, lab = d[1]
        assert img.shape == (32, 64, 3) and lab.shape == (64, 128)

    def test_grey_and_alpha_images_normalize_to_3ch(self, tmp_path):
        """The reference normalizes greyscale and >3-channel inputs
        (resize_image_dataset.py:25-29); here cv2's IMREAD_COLOR coerces
        both to 3-channel BGR — this pins that behavior for grey + BGRA
        PNGs end to end."""
        ds = SyntheticRoadScenes(n=1, full_shape=(64, 128), seed=9)
        img, lab = ds[0]
        grey = cv2.cvtColor(img[:, :, ::-1], cv2.COLOR_BGR2GRAY)
        bgra = cv2.cvtColor(img[:, :, ::-1], cv2.COLOR_BGR2BGRA)
        fns = []
        for name, arr in (("grey", grey), ("bgra", bgra)):
            fn = str(tmp_path / f"{name}.png")
            assert cv2.imwrite(fn, arr)
            fns.append(fn)
        lf = []
        for i in range(2):
            fn = str(tmp_path / f"lab{i}.png")
            cv2.imwrite(fn, lab)
            lf.append(fn)
        il = tmp_path / "imgs.txt"
        ll = tmp_path / "labels.txt"
        il.write_text("\n".join(fns) + "\n")
        ll.write_text("\n".join(lf) + "\n")
        d = FileListDataset(str(il), str(ll), (32, 64))
        g, _ = d[0]
        a, _ = d[1]
        assert g.shape == (32, 64, 3)
        # greyscale coerces to replicated channels
        np.testing.assert_array_equal(g[..., 0], g[..., 1])
        # alpha is dropped, color preserved
        assert a.shape == (32, 64, 3)
        resized = cv2.resize(img, (64, 32),
                             interpolation=cv2.INTER_CUBIC)
        np.testing.assert_array_equal(a, resized)


class TestEstimated:
    def _setup(self, tmp_path, soft=False):
        ds = SyntheticRoadScenes(n=3, full_shape=(64, 128), seed=4)
        img_dir = tmp_path / "imgs"
        os.makedirs(img_dir)
        w = NpzShardWriter(str(tmp_path / "est.0.zip"))
        for i in range(3):
            img, lab = ds[i]
            base = f"scene_{i:06d}_x_leftImg8bit"
            cv2.imwrite(str(img_dir / f"{base}.png"), img[:, :, ::-1])
            road = (lab == 7)
            w.put(base, road)
            score = np.stack([1.0 - road, road]).astype(np.float32)
            w.put(base + "_scores", score)  # CHW like the reference
        w.close()
        return str(img_dir), str(tmp_path / "est.0.zip")

    def test_hard_labels(self, tmp_path):
        img_dir, zip_fn = self._setup(tmp_path)
        d = EstimatedCityscapesDataset(img_dir, zip_fn, (32, 64))
        assert len(d) == 3
        img, lab = d[0]
        assert img.shape == (32, 64, 3)
        assert lab.shape == (32, 64)
        assert lab.dtype == np.int32
        assert set(np.unique(lab)) <= {0, 1}

    def test_soft_labels_chw_to_hwc(self, tmp_path):
        img_dir, zip_fn = self._setup(tmp_path)
        d = EstimatedCityscapesDataset(img_dir, zip_fn, (32, 64),
                                       use_soft_label=True)
        img, lab = d[0]
        assert lab.shape == (32, 64, 2)
        np.testing.assert_allclose(lab.sum(-1), 1.0, atol=1e-5)

    def test_augmentation_flip_consistency(self, tmp_path):
        img_dir, zip_fn = self._setup(tmp_path)
        d = EstimatedCityscapesDataset(img_dir, zip_fn, (32, 64),
                                       augment=True, seed=0)
        # flips must apply to image and label together: road stays under
        # the road-colored pixels (dark asphalt) either way
        for _ in range(6):
            img, lab = d[0]
            assert img.shape == (32, 64, 3) and lab.shape == (32, 64)

    def test_pca_lighting_distribution(self, rng):
        img = np.full((8, 8, 3), 100.0, np.float32)
        shifted = pca_lighting(img, 25.5, rng)
        # constant per-pixel shift
        assert np.allclose(shifted.std(axis=(0, 1)), 0, atol=1e-3)
        assert not np.allclose(shifted, img)
        assert np.allclose(pca_lighting(img, 0, rng), img)


class TestLoader:
    def test_batches_shapes_and_count(self, tmp_path):
        ds = SyntheticRoadScenes(n=10, full_shape=(32, 64), seed=2)

        class Wrap:
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                img, lab = ds[i]
                return img.astype(np.float32), (lab == 7).astype(np.int32)

        loader = PrefetchLoader(Wrap(), batch_size=4, epochs=1, seed=0)
        batches = list(loader)
        assert len(batches) == 2  # drop_last drops the ragged 2
        for imgs, labels in batches:
            assert imgs.shape == (4, 32, 64, 3)
            assert labels.shape == (4, 32, 64)

    def test_infinite_and_shuffle_determinism(self):
        class Ds:
            def __len__(self):
                return 6

            def __getitem__(self, i):
                return np.full((2, 2, 3), i, np.float32), np.int32(i)

        def take(loader, n):
            out = []
            for i, (imgs, labels) in enumerate(loader):
                if i >= n:
                    break
                out.append(labels.tolist())
            return out

        l1 = take(iter(PrefetchLoader(Ds(), 2, seed=7)), 4)
        l2 = take(iter(PrefetchLoader(Ds(), 2, seed=7)), 4)
        assert l1 == l2
        l3 = take(iter(PrefetchLoader(Ds(), 2, seed=8)), 4)
        assert l1 != l3
