"""Prior-seeded weighted k-means (Lloyd) as a single XLA program.

Reference semantics (batch_spalign_kmeans.py:136-207, identical copies in
direct_clustering.py and superpixel_overlaps.py):

  * seeding: samples whose prior weight exceeds the median weight go to
    cluster 0 (the road cluster); the rest get shuffled round-robin labels
    over clusters 1..k-1;
  * initial centers: UNWEIGHTED per-cluster means;
  * Lloyd updates: cluster 0's center is the prior-weighted mean of its
    members, clusters 1..k-1 use (1 - prior) weights;
  * stop on stable assignment, any empty cluster, or n_iter sweeps.

TPU-native redesign: the Python loop over iterations/clusters becomes a
``lax.while_loop``; distances run as one (N, D) x (D, k) contraction on the
MXU; center updates are one-hot weighted matmuls.  Padded (invalid) rows
carry weight 0, distance +inf, and assignment -1, so a fixed-shape program
covers ragged batches.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class KMeansResult(NamedTuple):
    assignment: jnp.ndarray  # (N,) int32, -1 for invalid rows
    centers: jnp.ndarray  # (k, D) float32
    n_iter: jnp.ndarray  # () int32 — Lloyd sweeps executed
    converged: jnp.ndarray  # () bool — stable assignment reached
    empty_stop: jnp.ndarray  # () bool — stopped due to an empty cluster


def _median_threshold(weights: jnp.ndarray, valid: jnp.ndarray):
    """float(sort(weights)[n_valid // 2]) over valid entries
    (reference :144).  Invalid entries sort to +inf at the end."""
    n_valid = jnp.sum(valid)
    w_sorted = jnp.sort(jnp.where(valid, weights, jnp.inf))
    return w_sorted[n_valid // 2]


def kmeans_seed_assignment(weights: jnp.ndarray, valid: jnp.ndarray, k,
                           key: jax.Array) -> jnp.ndarray:
    """Initial assignment (reference :141-149).

    Cluster 0 <- weight > median(weight); the rest receive round-robin
    labels 1..k-1 in a uniformly random order (distribution-identical to
    the reference's ``shuffle(arange(m) % (k-1) + 1)``).
    Invalid rows get -1.  ``k`` may be a python int or a traced scalar
    (the dynamic-k sweep path).
    """
    n = weights.shape[0]
    thr = _median_threshold(weights, valid)
    lo = valid & (weights <= thr)

    # Rank each `lo` member uniformly at random: rank = position in the
    # ascending sort of random keys (non-members pushed to the end).
    r = jax.random.uniform(key, (n,))
    order = jnp.argsort(jnp.where(lo, r, jnp.inf))
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    rr_label = rank % (k - 1) + 1

    assign = jnp.where(lo, rr_label, 0)
    return jnp.where(valid, assign, -1).astype(jnp.int32)


def _cluster_means(X, assign, row_weights, k_slots):
    """Weighted per-cluster means via one-hot matmul. assign==-1 excluded.

    k_slots is the STATIC number of center rows; in dynamic-k mode it is
    k_max and slots >= k stay empty (their means are non-finite but are
    masked out of the assignment step)."""
    onehot = (assign[:, None] == jnp.arange(k_slots)[None, :]).astype(
        X.dtype)
    wo = onehot * row_weights[:, None]  # (N, k)
    sums = jnp.einsum("nk,nd->kd", wo, X,
                      preferred_element_type=jnp.float32)
    denom = jnp.sum(wo, axis=0)[:, None]  # (k, 1)
    return sums / denom  # may be non-finite for empty clusters, as in ref


def _assign_step(X, x2, centers, valid, cluster_valid=None):
    """argmin_k ||x - c_k|| with invalid rows -> -1.

    x2: (N, 1) precomputed sum(X*X) — loop-invariant, hoisted OUT of the
    Lloyd while_loop (XLA does not LICM across while bodies; recomputing
    it re-read the (N, D) matrix every sweep, a third of the loop's HBM
    traffic at the 1000-sweep reference cap).
    cluster_valid: optional (k_slots,) bool — slots beyond the runtime k
    in dynamic-k mode; their (non-finite) distances are masked to +inf."""
    c2 = jnp.sum(centers * centers, axis=-1)[None, :]  # (1, k)
    xc = X @ centers.T  # (N, k) — MXU
    d2 = x2 - 2.0 * xc + c2
    if cluster_valid is not None:
        d2 = jnp.where(cluster_valid[None, :], d2, jnp.inf)
    new_assign = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    return jnp.where(valid, new_assign, -1)


@partial(jax.jit, static_argnames=("k", "n_iter"))
def weighted_kmeans(X: jnp.ndarray, weights: jnp.ndarray,
                    valid: jnp.ndarray, key: jax.Array, k: int = 4,
                    n_iter: int = 1000) -> KMeansResult:
    """Run prior-seeded weighted k-means.

    Args:
      X: (N, D) float feature rows (padded rows arbitrary).
      weights: (N,) float prior weights in [0, 1].
      valid: (N,) bool row validity.
      key: PRNG key for the seeding shuffle.
      k: number of clusters (reference default 4).
      n_iter: max Lloyd sweeps (reference 1000).
    """
    assign0 = kmeans_seed_assignment(weights, valid, k, key)
    return weighted_kmeans_from_init(X, weights, valid, assign0, k=k,
                                     n_iter=n_iter)


@partial(jax.jit, static_argnames=("k", "n_iter"))
def weighted_kmeans_from_init(X: jnp.ndarray, weights: jnp.ndarray,
                              valid: jnp.ndarray, assign0: jnp.ndarray,
                              k: int = 4,
                              n_iter: int = 1000) -> KMeansResult:
    """Lloyd loop given an explicit initial assignment (testing hook and
    building block of ``weighted_kmeans``)."""
    return _lloyd(X, weights, valid, assign0, k_slots=k,
                  cluster_valid=None, n_iter=n_iter)


@partial(jax.jit, static_argnames=("k_max", "n_iter"))
def weighted_kmeans_dynamic(X: jnp.ndarray, weights: jnp.ndarray,
                            valid: jnp.ndarray, key: jax.Array, k,
                            *, k_max: int, n_iter: int = 1000
                            ) -> KMeansResult:
    """``weighted_kmeans`` with a RUNTIME cluster count.

    ``k`` is a traced scalar in [2, k_max]; center rows k..k_max-1 stay
    empty and are masked out of every assignment step.  One compiled
    program covers a whole k-sweep (the fig-7 ablation grid,
    reference utils/dmux/run_exp_fig-7.sh, reruns the pipeline once per
    k — here only the first value pays the compile).
    Returned centers have k_max rows; rows >= k are meaningless.
    """
    k = jnp.asarray(k, jnp.int32)
    assign0 = kmeans_seed_assignment(weights, valid, k, key)
    cluster_valid = jnp.arange(k_max) < k
    return _lloyd(X, weights, valid, assign0, k_slots=k_max,
                  cluster_valid=cluster_valid, n_iter=n_iter)


def _lloyd(X, weights, valid, assign0, *, k_slots: int, cluster_valid,
           n_iter: int) -> KMeansResult:
    """The Lloyd while_loop shared by the static-k and dynamic-k entry
    points (reference Lloyd semantics, batch_spalign_kmeans.py:153-189)."""
    X = X.astype(jnp.float32)
    weights = weights.astype(jnp.float32)
    w_other = 1.0 - weights
    ones = jnp.where(valid, 1.0, 0.0)
    # unweighted init (:150)
    centers0 = _cluster_means(X, assign0, ones, k_slots)
    x2 = jnp.sum(X * X, axis=-1, keepdims=True)  # loop-invariant

    # Effective row weight given an assignment: prior for cluster 0,
    # (1 - prior) for the others (:163-171); zero for invalid rows.
    def eff_w(assign):
        w = jnp.where(assign == 0, weights, w_other)
        return jnp.where(valid, w, 0.0)

    def cond(state):
        assign, centers, it, done, _, _ = state
        return jnp.logical_and(it < n_iter, jnp.logical_not(done))

    def body(state):
        assign, centers, it, done, converged, empty_stop = state
        new_assign = _assign_step(X, x2, centers, valid, cluster_valid)
        same = jnp.all(new_assign == assign)

        new_centers = _cluster_means(X, new_assign, eff_w(new_assign),
                                     k_slots)
        counts = jnp.sum(
            (new_assign[:, None] == jnp.arange(k_slots)[None, :]), axis=0)
        empty = counts == 0
        if cluster_valid is not None:
            empty = jnp.logical_and(empty, cluster_valid)
        any_empty = jnp.any(empty)

        # On `same`, the reference breaks before updating centers; keep the
        # old centers in that case for faithfulness of the returned state.
        centers = jnp.where(same, centers, new_centers)
        assign = new_assign  # equal to old when `same`
        done = jnp.logical_or(same, any_empty)
        return (assign, centers, it + 1, done, same,
                jnp.logical_and(any_empty, jnp.logical_not(same)))

    state = (assign0, centers0, jnp.int32(0), jnp.bool_(False),
             jnp.bool_(False), jnp.bool_(False))
    assign, centers, it, _, converged, empty_stop = jax.lax.while_loop(
        cond, body, state)
    return KMeansResult(assign, centers, it, converged, empty_stop)


def paint_clusters(superpixels: jnp.ndarray,
                   assignment: jnp.ndarray,
                   max_id: Optional[int] = None) -> jnp.ndarray:
    """Broadcast per-superpixel cluster ids back onto pixel maps.

    Replaces the reference's per-superpixel painting loop
    (batch_spalign_kmeans.py:191-199).  On TPU a per-pixel gather from
    the (S,) table serializes (measured 60 ms/unit at the bench shape,
    the LARGEST piece of the cluster stage — tools/cluster_probe.py);
    for small S the one-hot MXU contraction is ~6x faster and exact
    PROVIDED the ids are bf16-representable: each output dot has
    exactly one nonzero term (1.0 * cluster_id), and the TPU MXU's
    default one-bf16-pass matmul represents integers only up to 256.
    Callers therefore pass ``max_id`` (their cluster count); without it,
    or beyond 256, or for large S (the felzenszwalb configs, whose
    (HW, S) one-hot would not fit sensibly), the gather is used.

    Args:
      superpixels: (B, H, W) int32 contiguous per-image ids in [0, S).
      assignment: (B, S) int32 cluster id per superpixel slot.
      max_id: static exclusive upper bound on the assignment values
        (the k of the k-means that produced them).

    Returns:
      (B, H, W) int32 cluster map.  Road mask = (map == 0).
    """
    b = superpixels.shape[0]
    s = assignment.shape[1]
    if s <= 512 and max_id is not None and max_id <= 256:
        flat = superpixels.reshape(b, -1)
        onehot = (flat[..., None] == jnp.arange(s, dtype=flat.dtype)
                  ).astype(jnp.float32)  # (B, HW, S)
        out = jnp.einsum("bps,bs->bp", onehot,
                         assignment.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        return jnp.rint(out).astype(jnp.int32).reshape(superpixels.shape)
    return jnp.take_along_axis(
        assignment, superpixels.reshape(b, -1), axis=1
    ).reshape(superpixels.shape)
