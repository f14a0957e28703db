"""Device-time probe for the Lloyd while_loop at bench shapes, real TPU.

Hypothesis (round-2 memory + r2 VERDICT #1): the fused label-gen
program's device time is dominated by the 1000-sweep k-means, which is
HBM-bound on re-reading X every sweep (plus a loop-invariant sum(X*X)
that XLA may not hoist out of the while_loop).

Variants, interleaved in ONE process (tunnel-drift discipline):
  A current _lloyd               (baseline)
  B x2 hoisted out of the loop   (bit-identical values)
  C B + 4x unrolled sweeps       (done-masked, bit-identical)
All inputs generated on device from a scalar seed; N dependent
executions behind one fence.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/km_probe.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

G = 5          # groups per dispatch (bench slic mode)
B, S = 30, 256  # clustering batch x max_superpixels
D = 514 + 2    # DRN map channels + (y, x)
K = 4
N_ITER = 1000
N_EXEC = 6


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def rtt():
    best = float("inf")
    for i in range(4):
        x = jnp.asarray(np.random.RandomState(i).rand(8, 8)
                        .astype(np.float32))
        t0 = time.time()
        np.asarray(x @ x)
        if i:
            best = min(best, time.time() - t0)
    return best


def bench(name, fn):
    fence(fn(jnp.uint32(999)))
    r = rtt()
    t0 = time.time()
    for i in range(N_EXEC):
        out = fn(jnp.uint32(100 + i))
    fence(out)
    dt = max(time.time() - t0 - r, 1e-9) / N_EXEC
    print(f"  {name:<34} {dt * 1e3:8.1f} ms/unit "
          f"({G * B / dt:6.0f} img/s-equivalent)", flush=True)
    return dt


def gen(seed):
    k = jax.random.key(seed)
    X = jax.random.normal(jax.random.fold_in(k, 0), (G, B * S, D),
                          jnp.float32)
    w = jax.random.uniform(jax.random.fold_in(k, 1), (G, B * S))
    valid = jnp.ones((G, B * S), bool)
    keys = jax.vmap(lambda i: jax.random.fold_in(k, 10 + i))(
        jnp.arange(G))
    return X, w, valid, keys


def main():
    from spalign_tpu.ops.kmeans import (kmeans_seed_assignment,
                                        weighted_kmeans)

    print(f"km_probe: {G} groups x ({B}x{S}) rows x {D}D, k={K}, "
          f"{N_ITER} sweeps", flush=True)

    # A: the current implementation, vmapped over groups like the bench
    @jax.jit
    def current(seed):
        X, w, valid, keys = gen(seed)
        res = jax.vmap(lambda x, ww, v, kk: weighted_kmeans(
            x, ww, v, kk, k=K, n_iter=N_ITER))(X, w, valid, keys)
        return res.assignment

    dt_a = bench("A current while_loop", current)

    # shared pieces for the variants
    def seed_assign(X, w, valid, keys):
        return jax.vmap(lambda ww, v, kk: kmeans_seed_assignment(
            ww, v, K, kk))(w, valid, keys)

    def cluster_means(X, assign, rw):
        onehot = (assign[:, None] == jnp.arange(K)[None, :]).astype(
            X.dtype)
        wo = onehot * rw[:, None]
        sums = jnp.einsum("nk,nd->kd", wo, X,
                          preferred_element_type=jnp.float32)
        return sums / jnp.sum(wo, axis=0)[:, None]

    def make_lloyd(unroll):
        def lloyd(X, w, valid, assign0):
            wo_ = 1.0 - w
            ones = jnp.where(valid, 1.0, 0.0)
            centers0 = cluster_means(X, assign0, ones)
            x2 = jnp.sum(X * X, axis=-1, keepdims=True)  # HOISTED

            def eff_w(a):
                return jnp.where(valid, jnp.where(a == 0, w, wo_), 0.0)

            def sweep(assign, centers, done, converged, empty_stop):
                c2 = jnp.sum(centers * centers, axis=-1)[None, :]
                d2 = x2 - 2.0 * (X @ centers.T) + c2
                na = jnp.where(valid, jnp.argmin(d2, -1).astype(
                    jnp.int32), -1)
                same = jnp.all(na == assign)
                nc = cluster_means(X, na, eff_w(na))
                counts = jnp.sum(na[:, None] == jnp.arange(K)[None, :],
                                 axis=0)
                any_empty = jnp.any(counts == 0)
                # done-masking keeps results bit-identical to A
                upd = jnp.logical_not(done)
                assign = jnp.where(upd, na, assign)
                centers = jnp.where(jnp.logical_and(upd,
                                                    jnp.logical_not(same)),
                                    nc, centers)
                converged = jnp.where(upd, same, converged)
                empty_stop = jnp.where(
                    upd, jnp.logical_and(any_empty,
                                         jnp.logical_not(same)),
                    empty_stop)
                done = jnp.logical_or(done,
                                      jnp.logical_or(same, any_empty))
                return assign, centers, done, converged, empty_stop

            def cond(st):
                return jnp.logical_and(st[2] < N_ITER,
                                       jnp.logical_not(st[3]))

            def body(st):
                a, c, it, done, conv, emp = st
                for _ in range(unroll):
                    a, c, done, conv, emp = sweep(a, c, done, conv, emp)
                return (a, c, it + unroll, done, conv, emp)

            st = (assign0, centers0, jnp.int32(0), jnp.bool_(False),
                  jnp.bool_(False), jnp.bool_(False))
            a, c, it, done, conv, emp = jax.lax.while_loop(cond, body, st)
            return a

        return lloyd

    for name, unroll in (("B hoisted x2", 1), ("C hoisted + unroll x4",
                                               4)):
        lloyd = make_lloyd(unroll)

        @jax.jit
        def variant(seed, _l=lloyd):
            X, w, valid, keys = gen(seed)
            a0 = seed_assign(X, w, valid, keys)
            return jax.vmap(_l)(X, w, valid, a0)

        dt = bench(name, variant)

    # result equivalence A vs B/C on one seed (bit-level)
    a = np.asarray(current(jnp.uint32(7)))
    for name, unroll in (("B", 1), ("C", 4)):
        lloyd = make_lloyd(unroll)

        @jax.jit
        def variant(seed, _l=lloyd):
            X, w, valid, keys = gen(seed)
            a0 = seed_assign(X, w, valid, keys)
            return jax.vmap(_l)(X, w, valid, a0)

        bvar = np.asarray(variant(jnp.uint32(7)))
        print(f"  {name} bit-identical to A: {np.array_equal(a, bvar)}",
              flush=True)


if __name__ == "__main__":
    main()
