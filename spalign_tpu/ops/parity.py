"""Bit-parity machinery: exact reproduction of the reference's host-side
randomness and float64 prior.

The reference seeds the process-global numpy RNG once
(``np.random.seed(1111)``, batch_spalign_kmeans.py:33-35) and consumes it
inside the k-means init shuffle (:146-149).  The default device pipeline
uses a distribution-identical jax shuffle instead (ops/kmeans.py); this
module provides the *parity mode* pieces that replay the reference's
stream bit-for-bit:

  * :func:`reference_seed_assignment` — the literal init rule on the
    compact (concatenated-over-images) weight vector, consuming a legacy
    ``np.random.RandomState`` exactly like ``np.random.shuffle``;
  * :func:`superpixel_prior_host` — the reference's float64 host prior
    (batch_create_prior runs on host numpy, :333-344, and is only then
    shipped to the device).

SpalignLabelGenerator wires these in when ``KMeansConfig.init ==
"reference"``: align on device -> prior + init on host -> Lloyd loop on
device via weighted_kmeans_from_init.
"""

from __future__ import annotations

import numpy as np


def reference_seed_assignment(weights: np.ndarray, k: int,
                              rng: np.random.RandomState) -> np.ndarray:
    """Initial k-means assignment, bit-identical to the reference
    (batch_spalign_kmeans.py:141-149).

    Args:
      weights: (N,) compact prior weights — superpixels of all images of
        the batch concatenated in image order (no padding), exactly the
        array the reference feeds to ``kmeans``.
      k: number of clusters.
      rng: legacy RandomState; its MT19937 stream matches the
        process-global ``np.random`` the reference seeds with 1111, so
        ``RandomState(1111)`` consumed once per clustering reproduces the
        reference's first clustering of a run.

    Returns: (N,) int32 initial assignment.
    """
    n = weights.shape[0]
    assign = np.zeros((n,), dtype=np.int64)
    # float(sort(w)[n // 2]) — the reference's exact median rule (:144)
    prior_weight_threshold = float(np.sort(weights)[n // 2])
    # assign[weights > thr] = 0 is a no-op on a zeros array (:145)
    cond = weights <= prior_weight_threshold
    idx = np.arange(int(cond.sum())) % (k - 1) + 1
    rng.shuffle(idx)
    assign[cond] = idx
    return assign.astype(np.int32)


def pixel_prior_host(h: int, w: int, y_rel_pos: float = 0.75,
                     x_rel_pos: float = 0.5, y_rel_sigma: float = 0.1,
                     x_rel_sigma: float = 0.1) -> np.ndarray:
    """Reference create_prior pixel weights in float64
    (batch_spalign_kmeans.py:116-122): integer-truncated mean position
    and the (2*sigma)**2 denominator."""
    xcoord, ycoord = np.meshgrid(np.arange(w), np.arange(h))
    ymean, xmean = int(h * y_rel_pos), int(w * x_rel_pos)
    y_sigma = h * y_rel_sigma
    x_sigma = w * x_rel_sigma
    return np.exp(-((ycoord - ymean) ** 2 / (2 * y_sigma) ** 2
                    + (xcoord - xmean) ** 2 / (2 * x_sigma) ** 2))


def superpixel_prior_host(superpixels: np.ndarray,
                          y_rel_pos: float = 0.75, x_rel_pos: float = 0.5,
                          y_rel_sigma: float = 0.1,
                          x_rel_sigma: float = 0.1) -> np.ndarray:
    """Per-superpixel mean pixel prior of ONE image, float64, in the
    reference's exact formulation (weights[superpixels == idx].mean()
    per ascending id, batch_spalign_kmeans.py:124-127).

    Returns a COMPACT (n_superpixels,) float64 vector (no padding)."""
    weights = pixel_prior_host(superpixels.shape[0], superpixels.shape[1],
                               y_rel_pos, x_rel_pos, y_rel_sigma,
                               x_rel_sigma)
    return np.asarray([weights[superpixels == idx].mean()
                       for idx in np.sort(np.unique(superpixels))])
