"""Datasets of images + ESTIMATED labels (the self-training input).

Mirrors the reference's EstimatedCityscapesDataset /
ZippedEstimatedCityscapesDataset (datasets/estimated_*.py): images paired
with ``<name>_leftImg8bit.npy`` hard masks or ``..._scores.npy`` float
soft labels produced by the label-generation / relabel stages, resized to
the training resolution (image cubic, label nearest), with optional
PCA-lighting + horizontal-flip augmentation, standardized with the
Cityscapes statistics.

Labels may live in a directory, inside a zip of .npy members, or in one
consolidated .npz archive (the round driver's output format).
"""

from __future__ import annotations

import glob
import os
import threading
import zipfile
from io import BytesIO
import numpy as np

from spalign_tpu.data.cityscapes import (CITYSCAPES_MEAN, CITYSCAPES_STD,
                                         _LazyZip, _decode_image,
                                         _resize_cubic)

# ImageNet RGB PCA eigenvalues/eigenvectors (Krizhevsky et al. 2012) —
# the constants behind chainercv.transforms.pca_lighting.
_PCA_EIGVAL = np.array([0.2175, 0.0188, 0.0045], dtype=np.float32)
_PCA_EIGVEC = np.array([[-0.5675, 0.7192, 0.4009],
                        [-0.5808, -0.0045, -0.8140],
                        [-0.5836, -0.6948, 0.4203]], dtype=np.float32)


def pca_lighting(img_hwc: np.ndarray, sigma: float,
                 rng: np.random.RandomState) -> np.ndarray:
    """AlexNet-style eigen-color jitter (chainercv semantics: alpha ~
    N(0, sigma) per principal component, added to every pixel)."""
    if sigma <= 0:
        return img_hwc
    alpha = rng.normal(0, sigma, size=3).astype(np.float32)
    shift = _PCA_EIGVEC @ (alpha * _PCA_EIGVAL)
    return img_hwc + shift[None, None, :]


def _resize_label_nn(label: np.ndarray, hw) -> np.ndarray:
    import cv2

    if label.shape[:2] == tuple(hw):
        return label
    return cv2.resize(label, (hw[1], hw[0]),
                      interpolation=cv2.INTER_NEAREST)


class _NpyZipStore:
    """Random access to .npy/.npz-packed estimated labels.

    Accepts: a directory of .npy files, a zip whose members are .npy
    files, or a single .npz (zip of arrays keyed by name) — the format
    written by the round driver (reference run_train_rounds.py:191-203
    writes one np.savez of {name: pred, name+'_scores': score})."""

    def __init__(self, path: str):
        self.path = path
        self._local = threading.local()
        if os.path.isdir(path):
            self.kind = "dir"
            self._names = sorted(
                os.path.basename(f)[:-4]
                for f in glob.glob(os.path.join(path, "*.npy")))
        else:
            self.kind = "zip"
            with zipfile.ZipFile(path) as zf:
                self._names = sorted(
                    n[:-4] for n in zf.namelist() if n.endswith(".npy"))
            self._members = None

    def names(self):
        return list(self._names)

    def load(self, name: str) -> np.ndarray:
        if self.kind == "dir":
            return np.load(os.path.join(self.path, name + ".npy"))
        zf = getattr(self._local, "zf", None)
        if zf is None:
            zf = zipfile.ZipFile(self.path)
            self._local.zf = zf
        with zf.open(name + ".npy") as f:
            return np.load(BytesIO(f.read()), allow_pickle=False)


class EstimatedCityscapesDataset:
    """Images (dir or zip) + estimated labels (dir/zip/npz).

    use_soft_label selects the ``*_scores`` float arrays; otherwise the
    boolean/int hard masks."""

    def __init__(self, img_source: str, label_source: str, resize_shape,
                 augment: bool = False, use_soft_label: bool = False,
                 seed: int = 0):
        self.labels = _NpyZipStore(label_source)
        suffix = "_scores"
        names = self.labels.names()
        if use_soft_label:
            self.label_keys = [n for n in names if n.endswith(suffix)]
            base_names = [n[: -len(suffix)] for n in self.label_keys]
        else:
            self.label_keys = [n for n in names if not n.endswith(suffix)]
            base_names = self.label_keys

        if os.path.isdir(img_source):
            img_index = {
                os.path.splitext(os.path.basename(f))[0]: f
                for f in glob.glob(os.path.join(img_source, "**", "*.png"),
                                   recursive=True)}
            self._img_get = lambda fn: _decode_image(open(fn, "rb").read())
        else:
            self._img_zip = _LazyZip(img_source)
            img_index = {
                os.path.splitext(os.path.basename(f))[0]: f
                for f in self._img_zip.namelist() if f.endswith(".png")}
            self._img_get = lambda fn: _decode_image(self._img_zip.read(fn))

        self.img_fns, keep_keys = [], []
        for key, name in zip(self.label_keys, base_names):
            base = os.path.basename(name)
            if base in img_index:
                self.img_fns.append(img_index[base])
                keep_keys.append(key)
        self.label_keys = keep_keys
        if not self.img_fns:
            raise ValueError(
                f"no image/label pairs between {img_source} and "
                f"{label_source}")

        self.resize_shape = tuple(resize_shape)
        self.augment = augment
        self.use_soft_label = use_soft_label
        self._seed = seed
        self._draws = 0
        self._rng_lock = threading.Lock()

    def __len__(self):
        return len(self.img_fns)

    def image_name(self, i):
        return self.img_fns[i]

    def __getitem__(self, i):
        img = self._img_get(self.img_fns[i]).astype(np.float32)
        label = self.labels.load(self.label_keys[i])
        if self.use_soft_label:
            label = label.astype(np.float32)
            if label.ndim == 3 and label.shape[0] in (2, 3) \
                    and label.shape[0] < label.shape[-1]:
                label = label.transpose(1, 2, 0)  # CHW -> HWC
        else:
            label = label.astype(np.int32)

        img = _resize_cubic(img, self.resize_shape)
        if label.shape[:2] != self.resize_shape:
            label = _resize_label_nn(label, self.resize_shape)

        if self.augment:
            # fresh RNG per draw: RandomState is not thread-safe and the
            # prefetch loader calls __getitem__ from worker threads
            with self._rng_lock:
                self._draws += 1
                rng = np.random.RandomState(
                    (self._seed * 1000003 + self._draws) % (2 ** 31))
            img = pca_lighting(img, 25.5, rng)
            if rng.rand() > 0.5:
                img = img[:, ::-1]
                label = label[:, ::-1]

        img = (img - CITYSCAPES_MEAN) / CITYSCAPES_STD
        return np.ascontiguousarray(img), np.ascontiguousarray(label)
