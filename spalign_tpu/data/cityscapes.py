"""Cityscapes readers: directory- and zip-backed.

Mirrors the reference's data layer (datasets/*.py, SURVEY.md §2.1):
  * images matched to labels by the ``city_seq_frame`` key;
  * zip-backed random access with lazy per-process/worker ZipFile reopen
    (zip handles cannot be shared across forks/threads safely —
    reference zipped_cityscapes_road_dataset.py:60-64);
  * image-only cubic resize to the working resolution; labels stay
    full-res for evaluation;
  * optional standardization with the Cityscapes channel statistics.

All readers return (image, label) with image HWC RGB float32 (or uint8
when standardize=False and raw=True) and label (H, W) int32 in {-1,0,1}.
"""

from __future__ import annotations

import glob
import os
import threading
import zipfile
from typing import Optional

import numpy as np

from spalign_tpu.data.labels import create_label_mask

# Channel statistics of the Cityscapes train split (RGB), as used by the
# reference (datasets/zipped_cityscapes_road_dataset.py:37-46).
CITYSCAPES_MEAN = np.array([73.15835921071367, 82.90891754262415,
                            72.39239876194161], dtype=np.float32)
CITYSCAPES_STD = np.array([41.61211675686322, 42.21582767516605,
                           40.48309952494058], dtype=np.float32)


def _decode_image(data: bytes, color: bool = True) -> np.ndarray:
    import cv2

    buf = np.frombuffer(data, np.uint8)
    if color:
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)  # BGR
        return img[:, :, ::-1]  # RGB
    return cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE)


def _resize_cubic(img: np.ndarray, hw) -> np.ndarray:
    import cv2

    if img.shape[:2] == tuple(hw):
        return img
    return cv2.resize(img, (hw[1], hw[0]), interpolation=cv2.INTER_CUBIC)


def _key(path: str) -> str:
    return "_".join(os.path.basename(path).split("_")[:3])


class _LazyZip:
    """Per-thread/process lazily reopened zip handle."""

    def __init__(self, path: str):
        if not os.path.exists(path):
            raise ValueError(f"{path} does not exist")
        self.path = path
        self._local = threading.local()

    def read(self, name: str) -> bytes:
        zf = getattr(self._local, "zf", None)
        if zf is None:
            zf = zipfile.ZipFile(self.path)
            self._local.zf = zf
        return zf.read(name)

    def namelist(self):
        with zipfile.ZipFile(self.path) as zf:
            return zf.namelist()


class CityscapesRoadDataset:
    """Directory-backed: <root>/{gtFine,leftImg8bit}/<split>/<city>/...
    (reference datasets/cityscapes_road_dataset.py)."""

    def __init__(self, data_dir: str, resize_shape, resol: str = "gtFine",
                 split: str = "val", standardize: bool = True):
        if not os.path.exists(data_dir):
            raise ValueError(f"{data_dir} does not exist")
        self.label_fns = sorted(glob.glob(os.path.join(
            data_dir, resol, split, "*", "*labelIds.png")))
        img_dir = os.path.join(data_dir, "leftImg8bit", split)
        self.img_fns = [
            os.path.join(img_dir, os.path.basename(l).split("_")[0],
                         _key(l) + "_leftImg8bit.png")
            for l in self.label_fns]
        self.resize_shape = tuple(resize_shape)
        self.standardize = standardize

    def __len__(self):
        return len(self.label_fns)

    def image_name(self, i):
        return self.img_fns[i]

    def label_name(self, i):
        return self.label_fns[i]

    def __getitem__(self, i):
        img = _decode_image(open(self.img_fns[i], "rb").read())
        label_ids = _decode_image(open(self.label_fns[i], "rb").read(),
                                  color=False)
        return _finish(img, label_ids, self.resize_shape, self.standardize)

    def resized_batch(self, indices, resize_hw):
        """Label-generation entry: (B,h,w,3) uint8 + RAW full-res
        labelIds (remapping happens downstream)."""
        imgs, labels = [], []
        for i in indices:
            img = _decode_image(open(self.img_fns[i], "rb").read())
            lab = _decode_image(open(self.label_fns[i], "rb").read(),
                                color=False)
            imgs.append(_resize_cubic(img, resize_hw))
            labels.append(lab)
        return np.stack(imgs).astype(np.uint8), np.stack(labels)

    def full_images(self, indices):
        return [_decode_image(open(self.img_fns[i], "rb").read())
                for i in indices]


class ZippedCityscapesRoadDataset:
    """Zip-backed images + gtFine labels
    (reference datasets/zipped_cityscapes_road_dataset.py)."""

    def __init__(self, img_zip: str, label_zip: str, resize_shape,
                 standardize: bool = True):
        self.img_zip = _LazyZip(img_zip)
        self.label_zip = _LazyZip(label_zip)
        label_fns = {_key(f): f for f in self.label_zip.namelist()
                     if f.endswith("labelIds.png")}
        img_fns = {_key(f): f for f in self.img_zip.namelist()
                   if f.endswith("leftImg8bit.png")}
        keys = sorted(img_fns.keys() if len(img_fns) < len(label_fns)
                      else label_fns.keys())
        self.img_fns = [img_fns[k] for k in keys]
        self.label_fns = [label_fns[k] for k in keys]
        self.resize_shape = tuple(resize_shape)
        self.standardize = standardize

    def __len__(self):
        return len(self.label_fns)

    def image_name(self, i):
        return self.img_fns[i]

    def label_name(self, i):
        return self.label_fns[i]

    def __getitem__(self, i):
        img = _decode_image(self.img_zip.read(self.img_fns[i]))
        label_ids = _decode_image(self.label_zip.read(self.label_fns[i]),
                                  color=False)
        return _finish(img, label_ids, self.resize_shape, self.standardize)

    def resized_batch(self, indices, resize_hw):
        """Label-generation entry: (B,h,w,3) uint8 + full-res labelIds
        remapped to {-1,0,1}."""
        imgs, labels = [], []
        for i in indices:
            img = _decode_image(self.img_zip.read(self.img_fns[i]))
            lab = _decode_image(self.label_zip.read(self.label_fns[i]),
                                color=False)
            imgs.append(_resize_cubic(img, resize_hw))
            labels.append(lab)
        return np.stack(imgs).astype(np.uint8), np.stack(labels)

    def full_images(self, indices):
        return [_decode_image(self.img_zip.read(self.img_fns[i]))
                for i in indices]


class FileListDataset:
    """Paths from .txt file lists (data/random300_images.txt style,
    reference ResizeImageDataset + TupleDataset path,
    batch_spalign_kmeans.py:492-499)."""

    def __init__(self, img_list_fn: str, label_list_fn: Optional[str],
                 resize_shape, standardize: bool = False):
        self.img_fns = [l.strip() for l in open(img_list_fn) if l.strip()]
        self.label_fns = ([l.strip() for l in open(label_list_fn)
                           if l.strip()] if label_list_fn else None)
        self.resize_shape = tuple(resize_shape)
        self.standardize = standardize

    def __len__(self):
        return len(self.img_fns)

    def image_name(self, i):
        return self.img_fns[i]

    def label_name(self, i):
        return self.label_fns[i] if self.label_fns else None

    def __getitem__(self, i):
        img = _decode_image(open(self.img_fns[i], "rb").read())
        label_ids = (_decode_image(open(self.label_fns[i], "rb").read(),
                                   color=False)
                     if self.label_fns else None)
        if label_ids is None:
            img = _resize_cubic(img, self.resize_shape)
            return img.astype(np.float32), None
        return _finish(img, label_ids, self.resize_shape, self.standardize)

    def resized_batch(self, indices, resize_hw):
        imgs, labels = [], []
        for i in indices:
            img = _decode_image(open(self.img_fns[i], "rb").read())
            imgs.append(_resize_cubic(img, resize_hw))
            if self.label_fns:
                labels.append(_decode_image(
                    open(self.label_fns[i], "rb").read(), color=False))
        return (np.stack(imgs).astype(np.uint8),
                np.stack(labels) if labels else None)

    def full_images(self, indices):
        return [_decode_image(open(self.img_fns[i], "rb").read())
                for i in indices]


def _finish(img, label_ids, resize_hw, standardize):
    img = _resize_cubic(img, resize_hw).astype(np.float32)
    if standardize:
        img = (img - CITYSCAPES_MEAN) / CITYSCAPES_STD
    return img, create_label_mask(label_ids)
