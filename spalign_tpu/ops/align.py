"""Superpixel-align: pooled feature vector per superpixel.

Reference: batch_spalign_kmeans.py:210-276.  The reference loops in Python
over ~300 superpixels x 10 anchors per image, and for EACH anchor argsorts
distances to all feature-map cells to find 4 neighbors, then manually
bilinearly interpolates — thousands of tiny CuPy kernels per image.

TPU-native redesign: one fixed-shape program per image —
  1. all anchors for all superpixels sampled with one global sort
     (ops.segments.sample_segment_anchors);
  2. bilinear interpolation of ALL anchors as one vectorized gather
     (the reference's "4 nearest cells + bbox" is exactly the enclosing
     2x2 of cell centers for any non-degenerate point, so the closed form
     below reproduces its arithmetic without the argsort);
  3. per-superpixel mean as a masked reduction.

Deviation from the reference (documented): when an anchor lands exactly on
a cell-center row/column (ties in the 4-nearest argsort), the reference's
result depends on unstable GPU sort tie-breaking; we resolve ties to the
mathematically exact bilinear value instead.

On n_neighbors: the reference exposes ``--n_neighbors`` but every shipped
configuration uses 4 (utils/create_val_labels.sh:25), and for 4 neighbors
its argsort+bbox construction (:244-254) selects exactly the 2x2 grid
cell enclosing the anchor — which is what the closed form below computes.
For any other neighbor count the bbox/bilinear arithmetic of the
reference is not even well-defined (its asserts at :249-254 fire), so
AlignConfig rejects n_neighbors != 4 instead of silently ignoring it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spalign_tpu.ops.segments import (center_of_mass, sample_segment_anchors,
                                      segment_sizes)


def bilinear_sample(feature_map: jnp.ndarray,
                    points: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation on the cell-center grid.

    Cell centers sit at integer + 0.5 (reference ft_coords
    batch_spalign_kmeans.py:219-221).  Points must already be in
    feature-map coordinates, clipped to [0.5, dim - 0.5].

    Args:
      feature_map: (h, w, C).
      points: (..., 2) float (y, x).

    Returns:
      (..., C) interpolated features.
    """
    h, w = feature_map.shape[:2]
    py = points[..., 0]
    px = points[..., 1]

    y0 = jnp.clip(jnp.floor(py - 0.5), 0, h - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(px - 0.5), 0, w - 2).astype(jnp.int32)
    y1 = y0 + 1
    x1 = x0 + 1

    # Reference weight arithmetic (batch_spalign_kmeans.py:256-266) with
    # min_* = *0 + 0.5, max_* = *1 + 0.5 and unit cell size.
    min_y = y0.astype(points.dtype) + 0.5
    min_x = x0.astype(points.dtype) + 0.5
    max_y = min_y + 1.0
    max_x = min_x + 1.0

    f11 = feature_map[y0, x0]
    f12 = feature_map[y1, x0]
    f21 = feature_map[y0, x1]
    f22 = feature_map[y1, x1]

    wy1 = (py - min_y)[..., None]
    wy0 = (max_y - py)[..., None]
    wx1 = (px - min_x)[..., None]
    wx0 = (max_x - px)[..., None]

    return wx0 * wy0 * f11 + wx0 * wy1 * f12 + wx1 * wy0 * f21 \
        + wx1 * wy1 * f22


def superpixel_align(feature_map: jnp.ndarray, superpixels: jnp.ndarray,
                     key: jax.Array, n_anchors: int, num_segments: int,
                     append_pos: bool = True, pos_scale: float = 1.0):
    """Per-superpixel aligned feature vectors.

    Args:
      feature_map: (h_f, w_f, C) float — e.g. DRN layer-8 output, 28x28x512.
      superpixels: (H, W) int32 map, contiguous ids in [0, num_segments).
      key: PRNG key for anchor sampling.
      n_anchors: anchors per superpixel (reference default 10).
      num_segments: static padding bound S.
      append_pos: append the superpixel's (y, x) center of mass in image
        pixel coordinates (reference :269-270).
      pos_scale: superpixel-map pixel size in IMAGE pixels — d when the
        map was computed at 1/d resolution (fused-SLIC downscale).  The
        appended center of mass must stay in image units because it
        competes against LAB-scaled feature dims in the k-means
        distance; ``com * d + (d-1)/2`` is the image coordinate of a
        low-res pixel's center.

    Returns:
      features: (S, C [+2]) float32 — mean anchor feature per superpixel;
        zeros for absent segments.
      valid: (S,) bool — True where the segment has at least one pixel.
    """
    img_h = superpixels.shape[0]
    h_f, w_f = feature_map.shape[:2]
    feature_ratio = float(h_f) / float(img_h)

    anchor_yx, anchor_valid = sample_segment_anchors(
        superpixels, key, n_anchors, num_segments)

    # Map image-pixel coords to feature-map coords, use pixel centers,
    # clip to the valid sampling range (reference :235-240).
    pts = anchor_yx * feature_ratio + 0.5
    pts_y = jnp.clip(pts[..., 0], 0.0, h_f - 1 + 0.5)
    pts_x = jnp.clip(pts[..., 1], 0.0, w_f - 1 + 0.5)
    pts = jnp.stack([pts_y, pts_x], axis=-1)

    feats = bilinear_sample(feature_map, pts)  # (S, A, C)

    m = anchor_valid[..., None].astype(feats.dtype)
    n_valid = jnp.maximum(jnp.sum(anchor_valid, axis=1), 1)  # (S,)
    mean_feat = jnp.sum(feats * m, axis=1) / n_valid[:, None].astype(
        feats.dtype)  # (S, C)

    if append_pos:
        com = center_of_mass(superpixels, num_segments)  # (S, 2)
        if pos_scale != 1.0:
            com = com * pos_scale + (pos_scale - 1.0) / 2.0
        mean_feat = jnp.concatenate(
            [mean_feat, com.astype(mean_feat.dtype)], axis=-1)

    valid = segment_sizes(superpixels.reshape(-1), num_segments) > 0
    return mean_feat, valid
