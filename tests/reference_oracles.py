"""Pure-numpy oracles implementing the reference algorithms' semantics.

Written fresh from the documented behavior in SURVEY.md (with file:line
citations into /root/reference) — used only to validate the TPU-native ops
in tests.  These are intentionally naive loop implementations.
"""

import numpy as np


def pixel_prior_np(h, w, y_rel_pos=0.75, x_rel_pos=0.5, y_rel_sigma=0.1,
                   x_rel_sigma=0.1):
    """batch_spalign_kmeans.py:111-122 semantics."""
    xcoord, ycoord = np.meshgrid(np.arange(w), np.arange(h))
    ymean, xmean = int(h * y_rel_pos), int(w * x_rel_pos)
    y_sigma = h * y_rel_sigma
    x_sigma = w * x_rel_sigma
    return np.exp(-((ycoord - ymean) ** 2 / (2 * y_sigma) ** 2
                    + (xcoord - xmean) ** 2 / (2 * x_sigma) ** 2))


def superpixel_prior_np(superpixels, **kw):
    """Per-superpixel mean of pixel prior (:124-127)."""
    h, w = superpixels.shape
    weights = pixel_prior_np(h, w, **kw)
    out = []
    for idx in np.sort(np.unique(superpixels)):
        out.append(weights[superpixels == idx].mean())
    return np.asarray(out)


def center_of_mass_np(mask):
    """scipy.ndimage.measurements.center_of_mass on a boolean mask."""
    ys, xs = np.nonzero(mask)
    return ys.mean(), xs.mean()


def bilinear_at_np(feature_map_chw, py, px):
    """Reference bilinear (batch_spalign_kmeans.py:244-266) for a
    non-degenerate point: 4 nearest cell centers = enclosing 2x2."""
    c, h, w = feature_map_chw.shape
    y0 = int(np.clip(np.floor(py - 0.5), 0, h - 2))
    x0 = int(np.clip(np.floor(px - 0.5), 0, w - 2))
    min_y, min_x = y0 + 0.5, x0 + 0.5
    max_y, max_x = min_y + 1, min_x + 1
    f11 = feature_map_chw[:, y0, x0]
    f12 = feature_map_chw[:, y0 + 1, x0]
    f21 = feature_map_chw[:, y0, x0 + 1]
    f22 = feature_map_chw[:, y0 + 1, x0 + 1]
    fp = (max_x - px) * (max_y - py) * f11 \
        + (max_x - px) * (py - min_y) * f12 \
        + (px - min_x) * (max_y - py) * f21 \
        + (px - min_x) * (py - min_y) * f22
    return fp / ((max_x - min_x) * (max_y - min_y))


def superpixel_align_np(feature_map_chw, superpixels, n_select=10,
                        n_neighbor=4, append_pos=True):
    """Transcription of the reference's superpixel_align
    (batch_spalign_kmeans.py:210-276), CHW layout like the original,
    consuming the MODULE-GLOBAL python ``random`` stream like the
    original (callers random.seed(1111) first).  Includes the literal
    argsort-of-distances neighbor rule — for clipped anchor points it
    differs from the closed-form 2x2 cell (bilinear_at_np), and its
    quicksort tie order IS the reference's behavior."""
    import random

    c, fh, fw = feature_map_chw.shape
    ratio = float(fh) / superpixels.shape[0]
    yy, xx = np.meshgrid(np.arange(fh), np.arange(fw))
    flat_coords = (np.stack([yy, xx]).transpose(1, 2, 0)
                   + 0.5).reshape(-1, 2)
    out = []
    for idx in np.sort(np.unique(superpixels)):
        mask = superpixels == idx
        centroid = center_of_mass_np(mask) if append_pos else None
        y, x = np.where(mask)
        coords = list(zip(y.tolist(), x.tolist()))
        random.shuffle(coords)
        pts = np.asarray(coords, dtype=np.float64)[:n_select]
        pts = pts * ratio + 0.5
        pts[:, 0] = np.clip(pts[:, 0], 0, fh - 1 + 0.5)
        pts[:, 1] = np.clip(pts[:, 1], 0, fw - 1 + 0.5)
        sp_feats = []
        for p in pts:
            py, px = p
            d = np.sqrt(((flat_coords - p[None, :]) ** 2).sum(axis=1))
            nb = flat_coords[np.argsort(d)[:n_neighbor]]
            (min_y, min_x), (max_y, max_x) = nb.min(0), nb.max(0)
            assert max_x > min_x and max_y > min_y
            f11 = feature_map_chw[:, int(min_y), int(min_x)]
            f12 = feature_map_chw[:, int(max_y), int(min_x)]
            f21 = feature_map_chw[:, int(min_y), int(max_x)]
            f22 = feature_map_chw[:, int(max_y), int(max_x)]
            fp = ((max_x - px) * (max_y - py) * f11
                  + (max_x - px) * (py - min_y) * f12
                  + (px - min_x) * (max_y - py) * f21
                  + (px - min_x) * (py - min_y) * f22)
            # the reference multiplies by the reciprocal (:266); a
            # true divide can differ in the last ulp
            fp = 1.0 / ((max_x - min_x) * (max_y - min_y)) * fp
            if append_pos:
                fp = np.hstack([fp, np.array(centroid)])
            sp_feats.append(fp)
        out.append(np.mean(np.stack(sp_feats), axis=0))
    return np.stack(out)


def weighted_kmeans_np(X, weights, k, seed_assign, n_iter=1000):
    """Lloyd loop with the reference's update rules
    (batch_spalign_kmeans.py:150-183), given an explicit initial
    assignment (so RNG-free and directly comparable)."""
    weights_other = 1 - weights
    assign = seed_assign.copy()
    centers = np.stack([X[assign == i].mean(axis=0) for i in range(k)])
    n_done = 0
    for _ in range(n_iter):
        d = np.linalg.norm(X[:, None, :] - centers[None, :, :], axis=2)
        new_assign = np.argmin(d, axis=1).astype(np.int32)
        n_done += 1
        if np.all(new_assign == assign):
            break
        assign = new_assign
        m0 = assign == 0
        centers[0] = (X[m0] * weights[m0][:, None]).sum(0) / weights[m0].sum()
        for j in range(1, k):
            mj = assign == j
            centers[j] = (X[mj] * weights_other[mj][:, None]).sum(0) \
                / weights_other[mj].sum()
        if any((assign == j).sum() == 0 for j in range(k)):
            break
    return assign, centers, n_done


def confusion_np(pred, gt, n_class=2):
    """chainercv calc_semantic_segmentation_confusion semantics."""
    conf = np.zeros((n_class, n_class), dtype=np.int64)
    pred = np.asarray(pred).ravel()
    gt = np.asarray(gt).ravel()
    for p, g in zip(pred, gt):
        if g >= 0:
            conf[g, p] += 1
    return conf


def lrn_np(x_nchw, n=5, k=1.0, alpha=2e-5, beta=0.75):
    """Chainer F.local_response_normalization semantics (channel window)."""
    N, C, H, W = x_nchw.shape
    out = np.empty_like(x_nchw)
    half = n // 2
    for c in range(C):
        lo, hi = max(0, c - half), min(C, c + half + 1)
        s = (x_nchw[:, lo:hi] ** 2).sum(axis=1)
        out[:, c] = x_nchw[:, c] / (k + alpha * s) ** beta
    return out
