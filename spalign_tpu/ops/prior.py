"""Gaussian road-location prior.

Reference: batch_spalign_kmeans.py:111-129 (per-superpixel) and
direct_clustering.py:188-201 (per-pixel).  The prior encodes "road is at
bottom-center": a Gaussian centered at (int(H*0.75), int(W*0.5)) whose
denominator is ``(2*sigma)**2`` (the reference's exact — slightly
unconventional — formula, reproduced bit-for-bit here).
"""

from __future__ import annotations

import jax.numpy as jnp

from spalign_tpu.ops.segments import segment_mean


def pixel_prior(h: int, w: int, y_rel_pos: float = 0.75,
                x_rel_pos: float = 0.5, y_rel_sigma: float = 0.1,
                x_rel_sigma: float = 0.1,
                dtype=jnp.float32) -> jnp.ndarray:
    """Per-pixel Gaussian prior of shape (h, w).

    Matches reference create_prior's pixel weights exactly, including the
    integer truncation of the mean position and the (2*sigma)**2
    denominator (batch_spalign_kmeans.py:116-122).
    """
    ycoord = jnp.arange(h, dtype=dtype)[:, None]
    xcoord = jnp.arange(w, dtype=dtype)[None, :]
    ymean = float(int(h * y_rel_pos))
    xmean = float(int(w * x_rel_pos))
    y_sigma = h * y_rel_sigma
    x_sigma = w * x_rel_sigma
    return jnp.exp(
        -((ycoord - ymean) ** 2 / (2.0 * y_sigma) ** 2
          + (xcoord - xmean) ** 2 / (2.0 * x_sigma) ** 2)
    ).astype(dtype)


def superpixel_prior(superpixels: jnp.ndarray, num_segments: int,
                     y_rel_pos: float = 0.75, x_rel_pos: float = 0.5,
                     y_rel_sigma: float = 0.1,
                     x_rel_sigma: float = 0.1) -> jnp.ndarray:
    """Per-superpixel prior: mean pixel prior over each superpixel's mask.

    Args:
      superpixels: (H, W) int32 map with contiguous ids in [0, num_segments).
      num_segments: static padding bound S.

    Returns:
      (S,) float32; entries for absent segment ids are 0.

    Replaces the reference's per-superpixel Python loop
    (batch_spalign_kmeans.py:124-127) with one segment-mean.
    """
    h, w = superpixels.shape
    weights = pixel_prior(h, w, y_rel_pos, x_rel_pos, y_rel_sigma,
                          x_rel_sigma)
    return segment_mean(weights.reshape(-1), superpixels.reshape(-1),
                        num_segments)
