"""ctypes bindings for the native host ops (C++).

The shared library is built lazily on first use with g++ (no pip deps).
A pure-numpy fallback keeps the framework functional if no compiler is
available, at reduced speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "felzenszwalb.cpp")
_LIB = os.path.join(_HERE, "libspalign_native.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import warnings

        msg = getattr(e, "stderr", b"") or b""
        warnings.warn(
            "spalign_tpu native build failed; falling back to the slow "
            f"numpy implementation. {msg.decode(errors='replace')[:500]}")
        return False


def get_lib():
    """Load (building if needed) the native library, or None on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        src_mtime = os.path.getmtime(_SRC)
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < src_mtime:
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.spalign_felzenszwalb.restype = ctypes.c_int32
        lib.spalign_felzenszwalb.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_float, ctypes.c_float, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.spalign_enforce_connectivity.restype = ctypes.c_int32
        lib.spalign_enforce_connectivity.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.spalign_confusion.restype = ctypes.c_int32
        lib.spalign_confusion.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.spalign_one_minus_f16.restype = ctypes.c_int32
        lib.spalign_one_minus_f16.argtypes = [
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
        ]
        lib.spalign_confusion_remapped.restype = ctypes.c_int32
        lib.spalign_confusion_remapped.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.spalign_standardize_invert.restype = ctypes.c_int32
        lib.spalign_standardize_invert.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def felzenszwalb(img_hwc: np.ndarray, scale: float = 300.0,
                 sigma: float = 0.8, min_size: int = 20) -> np.ndarray:
    """Felzenszwalb-Huttenlocher segmentation of an (H, W, C) float image.

    skimage-compatible call convention (the reference passes img/255. —
    batch_spalign_kmeans.py:303-307).  Returns (H, W) int32 contiguous
    labels.
    """
    img = np.ascontiguousarray(img_hwc, dtype=np.float32)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    out = np.empty((h, w), dtype=np.int32)
    lib = get_lib()
    if lib is not None:
        n = lib.spalign_felzenszwalb(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, c,
            ctypes.c_float(scale), ctypes.c_float(sigma), min_size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if n < 0:
            raise ValueError("felzenszwalb: invalid arguments")
        return out
    return _felzenszwalb_np(img, scale, sigma, min_size)


def enforce_connectivity(labels: np.ndarray, min_size: int = 1) -> np.ndarray:
    """Split non-contiguous label regions into connected components and
    absorb components below min_size into a neighboring one.  Used to
    post-process the device SLIC output.  Returns (H, W) int32 labels."""
    lab = np.ascontiguousarray(labels, dtype=np.int32)
    h, w = lab.shape
    out = np.empty_like(lab)
    lib = get_lib()
    if lib is not None:
        n = lib.spalign_enforce_connectivity(
            lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w,
            min_size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if n < 0:
            raise ValueError("enforce_connectivity: invalid arguments")
        return out
    return _enforce_connectivity_np(lab, min_size)


def confusion_vs_labelids(pred_small: np.ndarray,
                          label_ids_full: np.ndarray):
    """Fused NN-upsample + remap + 2x2 confusion of a small road mask
    against full-resolution RAW Cityscapes labelIds, one C++ pass
    (~4 ms per 2 MP image vs ~22 ms for the numpy chain it replaces).
    Returns a (2, 2) int64 conf[gt][pred], or None when the native
    library is unavailable (callers fall back to the numpy path)."""
    lib = get_lib()
    if lib is None:
        return None
    pred = np.ascontiguousarray(pred_small, dtype=np.uint8)
    gt = np.ascontiguousarray(label_ids_full, dtype=np.uint8)
    out = np.empty((4,), np.int64)
    ph, pw = pred.shape
    h, w = gt.shape
    rc = lib.spalign_confusion(
        pred.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ph, pw,
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc < 0:
        raise ValueError("spalign_confusion: invalid arguments")
    return out.reshape(2, 2)


def one_minus_f16(x: np.ndarray) -> np.ndarray:
    """Elementwise ``1 - x`` on a float16 array via a 64K-entry bit LUT
    (one C++ pass; numpy's scalarized f16 cast costs ~145 ms per 2 MP
    plane).  Bit-exact vs ``(1.0 - x.astype(f32)).astype(f16)`` — both
    round the f32 result to nearest-even binary16.  Falls back to the
    numpy chain without the native library."""
    x = np.ascontiguousarray(x, dtype=np.float16)
    lib = get_lib()
    if lib is None:
        return (1.0 - x.astype(np.float32)).astype(np.float16)
    out = np.empty_like(x)
    rc = lib.spalign_one_minus_f16(
        x.view(np.uint16).ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.view(np.uint16).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint16)),
        x.size)
    if rc < 0:
        raise ValueError("one_minus_f16: invalid arguments")
    return out


def confusion_remapped(pred_bool: np.ndarray, gt: np.ndarray):
    """2x2 confusion conf[gt][pred] for same-resolution pred {0,1} and
    gt in {-1,0,1} (gt outside {0,1} is void/ignored) — the relabel
    eval convention (selftrain/relabel.py).  Returns (2, 2) int64, or
    None when the native library is unavailable (callers fall back to
    the numpy bincount path)."""
    lib = get_lib()
    if lib is None:
        return None
    pred = np.ascontiguousarray(pred_bool, dtype=np.uint8)
    gt = np.ascontiguousarray(gt, dtype=np.int32)
    if pred.size != gt.size:
        raise ValueError(f"shape mismatch {pred.shape} vs {gt.shape}")
    out = np.empty((4,), np.int64)
    rc = lib.spalign_confusion_remapped(
        pred.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), pred.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc < 0:
        raise ValueError("confusion_remapped: invalid arguments")
    return out.reshape(2, 2)


def standardize_invert_u8(imgs: np.ndarray, mean, std) -> np.ndarray:
    """``clip(rint(imgs * std + mean), 0, 255).astype(u8)`` over
    (..., 3) float32 images in ONE C++ pass (round-half-even via
    nearbyintf == np.rint bit-for-bit; the numpy chain's rint/clip/cast
    temporaries cost ~23 ms per 0.5 MP image).  The relabel u8 wire's
    host-side standardization inversion."""
    imgs = np.ascontiguousarray(imgs, dtype=np.float32)
    if imgs.shape[-1] != 3:
        raise ValueError(f"expected trailing channel 3, got {imgs.shape}")
    lib = get_lib()
    if lib is None:
        return np.clip(np.rint(imgs * std + mean), 0, 255).astype(np.uint8)
    mean3 = np.ascontiguousarray(
        np.broadcast_to(np.asarray(mean, np.float32), (3,)))
    std3 = np.ascontiguousarray(
        np.broadcast_to(np.asarray(std, np.float32), (3,)))
    out = np.empty(imgs.shape, np.uint8)
    rc = lib.spalign_standardize_invert(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        imgs.size // 3,
        mean3.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std3.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc < 0:
        raise ValueError("standardize_invert: invalid arguments")
    return out


# ------------------------- numpy fallbacks ---------------------------------


class _UnionFind:
    def __init__(self, n):
        self.parent = np.arange(n, dtype=np.int64)
        self.size = np.ones(n, dtype=np.int64)

    def find(self, x):
        root = x
        p = self.parent
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def merge(self, a, b):
        a, b = self.find(a), self.find(b)
        if a == b:
            return a
        if self.size[a] < self.size[b]:
            a, b = b, a
        self.parent[b] = a
        self.size[a] += self.size[b]
        return a


def _gaussian_np(plane, sigma):
    if sigma <= 0:
        return plane
    radius = max(1, int(np.ceil(4.0 * sigma)))
    xs = np.arange(-radius, radius + 1)
    k = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    k /= k.sum()
    pad = np.pad(plane, radius, mode="reflect")
    tmp = np.apply_along_axis(lambda r: np.convolve(r, k, "valid"), 1, pad)
    out = np.apply_along_axis(lambda col: np.convolve(col, k, "valid"), 0,
                              tmp)
    return out


def _felzenszwalb_np(img, scale, sigma, min_size):
    h, w, c = img.shape
    sm = np.stack([_gaussian_np(img[:, :, ch], sigma) for ch in range(c)],
                  axis=-1)
    flat = sm.reshape(-1, c)
    n = h * w
    idx = np.arange(n).reshape(h, w)
    pairs = []
    for dy, dx in [(0, 1), (1, 0), (1, 1), (1, -1)]:
        ys = slice(0, h - dy)
        xs = slice(max(0, -dx), w - max(0, dx))
        a = idx[ys, xs].ravel()
        b = a + dy * w + dx
        pairs.append(np.stack([a, b], axis=1))
    edges = np.concatenate(pairs)
    wts = np.sqrt(((flat[edges[:, 0]] - flat[edges[:, 1]]) ** 2).sum(1))
    order = np.argsort(wts, kind="stable")
    uf = _UnionFind(n)
    thr = np.full(n, scale, dtype=np.float64)
    for e in order:
        a, b = uf.find(edges[e, 0]), uf.find(edges[e, 1])
        if a == b:
            continue
        wt = wts[e]
        if wt <= thr[a] and wt <= thr[b]:
            m = uf.merge(a, b)
            thr[m] = wt + scale / uf.size[m]
    if min_size > 1:
        for e in order:
            a, b = uf.find(edges[e, 0]), uf.find(edges[e, 1])
            if a != b and (uf.size[a] < min_size or uf.size[b] < min_size):
                uf.merge(a, b)
    roots = np.array([uf.find(i) for i in range(n)])
    _, labels = np.unique(roots, return_inverse=True)
    # contiguous by first occurrence
    order_first = np.zeros(labels.max() + 1, dtype=np.int64)
    seen = {}
    nxt = 0
    for lab in labels:
        if lab not in seen:
            seen[lab] = nxt
            nxt += 1
    remap = np.array([seen[i] for i in range(labels.max() + 1)])
    return remap[labels].reshape(h, w).astype(np.int32)


def _enforce_connectivity_np(lab, min_size):
    h, w = lab.shape
    n = h * w
    uf = _UnionFind(n)
    flat = lab.ravel()
    idx = np.arange(n)
    right = idx[(idx % w) < w - 1]
    down = idx[idx < n - w]
    for a, b in [(right, right + 1), (down, down + w)]:
        same = flat[a] == flat[b]
        for x, y in zip(a[same], b[same]):
            uf.merge(x, y)
    if min_size > 1:
        changed = True
        while changed:
            changed = False
            for p in range(n):
                rp = uf.find(p)
                if uf.size[rp] >= min_size:
                    continue
                best, best_size = -1, -1
                y, x = divmod(p, w)
                for q in (p - 1 if x > 0 else -1, p + 1 if x < w - 1 else -1,
                          p - w if y > 0 else -1, p + w if y < h - 1 else -1):
                    if q < 0:
                        continue
                    rq = uf.find(q)
                    if rq != rp and uf.size[rq] > best_size:
                        best, best_size = rq, uf.size[rq]
                if best >= 0:
                    uf.merge(rp, best)
                    changed = True
    roots = np.array([uf.find(i) for i in range(n)])
    seen = {}
    nxt = 0
    out = np.empty(n, dtype=np.int32)
    for i, r in enumerate(roots):
        if r not in seen:
            seen[r] = nxt
            nxt += 1
        out[i] = seen[r]
    return out.reshape(h, w)
