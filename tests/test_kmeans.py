"""Weighted k-means vs the reference-semantics numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from spalign_tpu.ops import (kmeans_seed_assignment, paint_clusters,
                             weighted_kmeans, weighted_kmeans_from_init)
from spalign_tpu.ops.kmeans import weighted_kmeans_dynamic

import reference_oracles as oracle


def make_blobs(rng, k=4, n_per=50, d=8, spread=0.3):
    centers = rng.randn(k, d) * 4
    X = np.concatenate(
        [centers[i] + spread * rng.randn(n_per, d) for i in range(k)])
    labels = np.repeat(np.arange(k), n_per)
    return X.astype(np.float32), labels


class TestLloydVsOracle:
    def test_matches_oracle_given_same_init(self, rng):
        X, true_labels = make_blobs(rng)
        n = len(X)
        # prior high for cluster-0 points
        weights = np.where(true_labels == 0,
                           rng.uniform(0.7, 1.0, n),
                           rng.uniform(0.0, 0.3, n)).astype(np.float32)
        # reference-style seeding, computed on host
        thr = np.sort(weights)[n // 2]
        assign0 = np.zeros(n, np.int32)
        lo = weights <= thr
        idx = np.arange(lo.sum()) % 3 + 1
        rng.shuffle(idx)
        assign0[lo] = idx

        want_assign, want_centers, _ = oracle.weighted_kmeans_np(
            X.astype(np.float64), weights.astype(np.float64), 4,
            assign0.copy())

        valid = jnp.ones((n,), bool)
        res = weighted_kmeans_from_init(
            jnp.asarray(X), jnp.asarray(weights), valid,
            jnp.asarray(assign0), k=4)
        np.testing.assert_array_equal(np.asarray(res.assignment),
                                      want_assign)
        # stop reason must agree with the oracle: empty cluster vs stable
        any_empty = (np.bincount(want_assign, minlength=4) == 0).any()
        assert bool(res.empty_stop) == bool(any_empty)
        assert bool(res.converged) == (not any_empty)
        finite = np.isfinite(want_centers).all(axis=1)
        np.testing.assert_allclose(np.asarray(res.centers)[finite],
                                   want_centers[finite],
                                   rtol=1e-3, atol=1e-4)

    def test_converges_without_empty_k2(self, rng):
        X, true_labels = make_blobs(rng, k=2, n_per=80)
        n = len(X)
        weights = np.where(true_labels == 0,
                           rng.uniform(0.7, 1.0, n),
                           rng.uniform(0.0, 0.3, n)).astype(np.float32)
        thr = np.sort(weights)[n // 2]
        assign0 = np.where(weights > thr, 0, 1).astype(np.int32)

        want_assign, want_centers, _ = oracle.weighted_kmeans_np(
            X.astype(np.float64), weights.astype(np.float64), 2,
            assign0.copy())
        res = weighted_kmeans_from_init(
            jnp.asarray(X), jnp.asarray(weights), jnp.ones((n,), bool),
            jnp.asarray(assign0), k=2)
        np.testing.assert_array_equal(np.asarray(res.assignment),
                                      want_assign)
        assert bool(res.converged) and not bool(res.empty_stop)
        np.testing.assert_allclose(np.asarray(res.centers), want_centers,
                                   rtol=1e-3, atol=1e-4)

    def test_padding_invariance(self, rng):
        """Padded invalid rows must not change the result."""
        X, true_labels = make_blobs(rng, n_per=30)
        n = len(X)
        weights = np.where(true_labels == 0, 0.9, 0.1).astype(np.float32)
        thr = np.sort(weights)[n // 2]
        assign0 = np.zeros(n, np.int32)
        lo = weights <= thr
        assign0[lo] = np.arange(lo.sum()) % 3 + 1

        res_plain = weighted_kmeans_from_init(
            jnp.asarray(X), jnp.asarray(weights), jnp.ones((n,), bool),
            jnp.asarray(assign0), k=4)

        pad = 37
        Xp = np.concatenate([X, 1e6 * np.ones((pad, X.shape[1]), np.float32)])
        wp = np.concatenate([weights, np.zeros(pad, np.float32)])
        vp = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        ap = np.concatenate([assign0, -np.ones(pad, np.int32)])
        res_pad = weighted_kmeans_from_init(
            jnp.asarray(Xp), jnp.asarray(wp), jnp.asarray(vp),
            jnp.asarray(ap), k=4)

        np.testing.assert_array_equal(np.asarray(res_pad.assignment)[:n],
                                      np.asarray(res_plain.assignment))
        np.testing.assert_array_equal(np.asarray(res_pad.assignment)[n:], -1)
        np.testing.assert_allclose(np.asarray(res_pad.centers),
                                   np.asarray(res_plain.centers),
                                   rtol=1e-4, atol=1e-5)


class TestSeeding:
    def test_seed_assignment_structure(self, rng):
        n, k = 101, 4
        weights = rng.uniform(0, 1, n).astype(np.float32)
        valid = jnp.ones((n,), bool)
        a = np.asarray(kmeans_seed_assignment(
            jnp.asarray(weights), valid, k, jax.random.key(0)))
        thr = np.sort(weights)[n // 2]
        # high-weight rows -> cluster 0
        np.testing.assert_array_equal(a[weights > thr], 0)
        # low-weight rows -> 1..k-1, round-robin balanced
        lo_labels = a[weights <= thr]
        assert set(lo_labels.tolist()) <= {1, 2, 3}
        counts = np.bincount(lo_labels, minlength=k)[1:]
        assert counts.max() - counts.min() <= 1

    def test_seed_assignment_with_padding(self, rng):
        n, pad, k = 60, 20, 4
        weights = np.concatenate([
            rng.uniform(0, 1, n), np.zeros(pad)]).astype(np.float32)
        valid = jnp.asarray(np.arange(n + pad) < n)
        a = np.asarray(kmeans_seed_assignment(
            jnp.asarray(weights), valid, k, jax.random.key(3)))
        assert (a[n:] == -1).all()
        thr = np.sort(weights[:n])[n // 2]
        np.testing.assert_array_equal(a[:n][weights[:n] > thr], 0)

    def test_full_pipeline_recovers_blobs(self, rng):
        """End-to-end weighted_kmeans finds the prior-favored cluster."""
        X, true_labels = make_blobs(rng, k=4, n_per=60)
        n = len(X)
        weights = np.where(true_labels == 0,
                           rng.uniform(0.8, 1.0, n),
                           rng.uniform(0.0, 0.2, n)).astype(np.float32)
        res = weighted_kmeans(jnp.asarray(X), jnp.asarray(weights),
                              jnp.ones((n,), bool), jax.random.key(7), k=4)
        a = np.asarray(res.assignment)
        # cluster 0 == the high-prior blob (allowing few strays)
        agree = (a[true_labels == 0] == 0).mean()
        assert agree > 0.95
        # other blobs each coherent
        for b in range(1, 4):
            vals, cnt = np.unique(a[true_labels == b], return_counts=True)
            assert cnt.max() / cnt.sum() > 0.9


class TestDynamicK:
    """The runtime-k variant must agree with the static-k program for
    every k (the fig-7 sweep runs one compiled program over all k)."""

    def test_matches_static_for_each_k(self, rng):
        X, true_labels = make_blobs(rng, k=5, n_per=40)
        n = len(X)
        weights = np.where(true_labels == 0,
                           rng.uniform(0.7, 1.0, n),
                           rng.uniform(0.0, 0.3, n)).astype(np.float32)
        valid = jnp.ones((n,), bool)
        k_max = 8
        for k in (2, 3, 4, 8):
            key = jax.random.key(100 + k)
            want = weighted_kmeans(jnp.asarray(X), jnp.asarray(weights),
                                   valid, key, k=k)
            got = weighted_kmeans_dynamic(
                jnp.asarray(X), jnp.asarray(weights), valid, key,
                np.int32(k), k_max=k_max)
            np.testing.assert_array_equal(np.asarray(got.assignment),
                                          np.asarray(want.assignment))
            assert int(got.n_iter) == int(want.n_iter)
            assert bool(got.converged) == bool(want.converged)
            assert bool(got.empty_stop) == bool(want.empty_stop)
            np.testing.assert_allclose(np.asarray(got.centers)[:k],
                                       np.asarray(want.centers),
                                       rtol=1e-5, atol=1e-6)

    def test_one_trace_across_k(self, rng):
        """Changing k must NOT retrace the dynamic program."""
        X, _ = make_blobs(rng, k=3, n_per=30)
        n = len(X)
        weights = rng.uniform(0, 1, n).astype(np.float32)
        valid = jnp.ones((n,), bool)
        before = weighted_kmeans_dynamic._cache_size()
        for k in (2, 3, 4, 5):
            weighted_kmeans_dynamic(
                jnp.asarray(X), jnp.asarray(weights), valid,
                jax.random.key(k), np.int32(k), k_max=8)
        assert weighted_kmeans_dynamic._cache_size() == before + 1

    def test_padding_rows_and_clusters(self, rng):
        """Invalid rows AND unused cluster slots together."""
        X, true_labels = make_blobs(rng, k=3, n_per=40)
        n = len(X)
        weights = np.where(true_labels == 0, 0.9, 0.1).astype(np.float32)
        pad = 23
        Xp = np.concatenate(
            [X, 1e6 * np.ones((pad, X.shape[1]), np.float32)])
        wp = np.concatenate([weights, np.zeros(pad, np.float32)])
        vp = jnp.asarray(np.arange(n + pad) < n)
        key = jax.random.key(11)
        res = weighted_kmeans_dynamic(jnp.asarray(Xp), jnp.asarray(wp),
                                      vp, key, np.int32(3), k_max=8)
        a = np.asarray(res.assignment)
        assert (a[n:] == -1).all()
        assert set(a[:n].tolist()) <= {0, 1, 2}


class TestPaint:
    def test_paint_clusters(self, rng):
        sp = rng.randint(0, 5, size=(2, 6, 7)).astype(np.int32)
        assign = rng.randint(0, 4, size=(2, 5)).astype(np.int32)
        out = np.asarray(paint_clusters(jnp.asarray(sp), jnp.asarray(assign)))
        for b in range(2):
            for s in range(5):
                np.testing.assert_array_equal(out[b][sp[b] == s],
                                              assign[b, s])
