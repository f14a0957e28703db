"""Segment (superpixel) utilities: sizes, means, centroids, anchor sampling.

These replace the reference's per-superpixel Python loops
(batch_spalign_kmeans.py:124-127, :226-234) and
scipy.ndimage.measurements.center_of_mass (:229) with fixed-shape,
XLA-friendly segment reductions, so the whole label-generation program
stays on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Above this bound the (N, S) one-hot would not fit comfortably; below
# it the MXU contraction beats TPU's serialized scatter-add by ~10x
# (measured: the sizes+centroid+prior scatters cost ~35 ms per 30-image
# 224^2 batch; the matmul forms run in a few ms and fuse with their
# consumers).
_ONEHOT_MAX_SEGMENTS = 512


def _onehot_f32(segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return (segment_ids[:, None]
            == jnp.arange(num_segments)[None, :]).astype(jnp.float32)


def segment_sizes(segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """(S,) int32 count of elements per segment id."""
    if num_segments <= _ONEHOT_MAX_SEGMENTS:
        # exact: f32 integer sums are exact below 2^24 elements
        return jnp.sum(_onehot_f32(segment_ids, num_segments),
                       axis=0).astype(jnp.int32)
    return jnp.zeros((num_segments,), jnp.int32).at[segment_ids].add(1)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    """Mean of ``data`` per segment.  data: (N,) or (N, C); ids: (N,).

    Absent segments get 0 (not NaN) so padded superpixel slots stay finite.
    """
    if num_segments <= _ONEHOT_MAX_SEGMENTS:
        oh = _onehot_f32(segment_ids, num_segments)  # (N, S)
        d2 = data[:, None] if data.ndim == 1 else data
        sums = jnp.einsum("ns,nd->sd", oh, d2.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        counts = jnp.sum(oh, axis=0)[:, None]
        # float mean on BOTH branches (the segment_sum fallback's
        # true-divide is float even for int data; keep the threshold
        # behavior-invariant)
        out = sums / jnp.maximum(counts, 1.0)
        if jnp.issubdtype(data.dtype, jnp.floating):
            out = out.astype(data.dtype)
        return out[:, 0] if data.ndim == 1 else out
    sums = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    counts = segment_sizes(segment_ids, num_segments).astype(data.dtype)
    if data.ndim > 1:
        counts = counts[:, None]
    return sums / jnp.maximum(counts, 1)


def center_of_mass(superpixels: jnp.ndarray,
                   num_segments: int) -> jnp.ndarray:
    """Per-superpixel (y, x) centroid in pixel index coordinates.

    Equals scipy.ndimage.measurements.center_of_mass of each boolean mask
    (reference batch_spalign_kmeans.py:229): the unweighted mean of member
    pixel coordinates.

    Returns (S, 2) float32 [y, x]; 0 for absent segments.
    """
    h, w = superpixels.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    ids = superpixels.reshape(-1)
    coords = jnp.stack([yy, xx], axis=-1)  # (HW, 2)
    return segment_mean(coords, ids, num_segments)


def sample_segment_anchors(superpixels: jnp.ndarray, key: jax.Array,
                           n_anchors: int, num_segments: int):
    """Sample up to ``n_anchors`` distinct random interior pixels per segment.

    TPU-native equivalent of the reference's per-superpixel
    ``random.shuffle(inside_coords); inside_coords[:n_select]``
    (batch_spalign_kmeans.py:230-234): instead of S Python-level shuffles,
    one global sort by the composite key (segment_id, random_permutation)
    groups each segment's pixels in random order; the first ``n_anchors``
    entries of each group are its anchors (all of them when the segment has
    fewer pixels — matching the reference's ``[:n_select]`` slice).

    Args:
      superpixels: (H, W) int32, contiguous ids in [0, num_segments).
      key: PRNG key for the permutation.
      n_anchors: anchors per segment (A).
      num_segments: static bound S.

    Returns:
      anchor_yx: (S, A, 2) float32 pixel coordinates (y, x).
      anchor_valid: (S, A) bool — False for slots beyond the segment's pixel
        count and for absent segments.
    """
    h, w = superpixels.shape
    n = h * w
    ids = superpixels.reshape(-1).astype(jnp.int32)
    # Composite sort key: segment id major, random bits minor — ONE
    # lax.sort carrying the pixel index as payload (vs the previous
    # permutation + argsort: two 50k-element sorts per image).  Random
    # minor keys may collide (ties broken by pixel index); with >= 2^15
    # random values per segment the bias is negligible.
    bits_id = max(1, int(num_segments - 1).bit_length())
    avail = 31 - bits_id
    if avail >= 15:
        r = jax.random.randint(key, (n,), 0, 2 ** avail, dtype=jnp.int32)
        composite = ids * (2 ** avail) + r
    else:  # huge S: exact permutation path (two sorts)
        assert num_segments * n < 2 ** 31, \
            "composite sort key overflows int32"
        composite = ids * n + jax.random.permutation(key, n).astype(
            jnp.int32)
    _, order = jax.lax.sort(
        (composite, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    # pixel indices grouped by segment, random order within each segment

    counts = segment_sizes(ids, num_segments)  # (S,)
    starts = jnp.cumsum(counts) - counts  # (S,) segment start offsets

    offs = jnp.arange(n_anchors, dtype=jnp.int32)[None, :]  # (1, A)
    gather_idx = starts[:, None] + offs  # (S, A)
    anchor_valid = offs < counts[:, None]  # (S, A)
    gather_idx = jnp.clip(gather_idx, 0, n - 1)
    flat_pix = order[gather_idx]  # (S, A) flat pixel indices

    ay = (flat_pix // w).astype(jnp.float32)
    ax = (flat_pix % w).astype(jnp.float32)
    anchor_yx = jnp.stack([ay, ax], axis=-1)  # (S, A, 2)
    return anchor_yx, anchor_valid


def relabel_contiguous_np(superpixels):
    """Host-side: relabel an int segmentation map to contiguous 0..S-1
    (order of sorted original ids, matching the reference's
    ``np.sort(np.unique(superpixels))`` enumeration at
    batch_spalign_kmeans.py:226).  Returns (relabelled, n_segments)."""
    import numpy as np

    uniq, inv = np.unique(superpixels, return_inverse=True)
    return inv.reshape(superpixels.shape).astype(np.int32), len(uniq)
