"""A/B probe: 6D (2, C)-tiled pooling vs lane-packed (..., 2C) pooling.

Interleaved in ONE process (CLAUDE.md tunnel discipline): variants
alternate execution so hours-scale tunnel drift hits both equally.
N chained executions behind one host fetch, tunnel rtt subtracted.
Inputs generated on device; a seed scalar defeats input memoization;
grads are returned so the backward is not DCE'd.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/pool_probe.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

B, H, W, C = 8, 512, 1024, 64
N_EXEC = 8
ROUNDS = 3


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


# ---- OLD form (round-2 library implementation, 6D (2, C) tiles) --------
def _pos_grid():
    dy = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2, 1, 2, 1), 2)
    dx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2, 1, 2, 1), 4)
    return 2 * dy + dx


def old_pool(x):
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    xr = x.reshape(n, h2, 2, w2, 2, c)
    m = jax.lax.stop_gradient(jnp.max(xr, axis=(2, 4), keepdims=True))
    pos = _pos_grid()
    cand = jnp.where(xr == m, pos, 4)
    idx = jnp.min(cand, axis=(2, 4)).astype(jnp.int32)
    sel = cand == idx[:, :, None, :, None, :]
    pooled = jnp.sum(jnp.where(sel, xr, 0.0), axis=(2, 4))
    return pooled, idx


def old_unpool(x, idx):
    n, h, w, c = x.shape
    sel = idx[:, :, None, :, None, :] == _pos_grid()
    out6 = jnp.where(sel, x[:, :, None, :, None, :], 0.0)
    return out6.astype(x.dtype).reshape(n, 2 * h, 2 * w, c)


def main():
    from spalign_tpu.ops.pooling import (max_pool_argmax_2x2,
                                         max_unpool_2x2)

    shapes = [(H, W), (H // 2, W // 2), (H // 4, W // 4),
              (H // 8, W // 8)]
    print(f"pool_probe: B={B} C={C} shapes={shapes}; N={N_EXEC} "
          f"chained execs/fence, {ROUNDS} interleaved rounds",
          flush=True)

    results = {}
    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        @jax.jit
        def gen(seed, _dt=dt):
            k = jax.random.key(seed)
            return tuple(
                jax.random.uniform(jax.random.fold_in(k, i),
                                   (B, h, w, C), _dt)
                for i, (h, w) in enumerate(shapes))

        xs0 = gen(jnp.uint32(0))

        def make(pool, unpool):
            @jax.jit
            def f(xs, seed):
                def loss(xs):
                    total = seed * 0.0
                    for x in xs:
                        p, idx = pool(x)
                        u = unpool(p * 2.0, idx)
                        total = total + jnp.sum(
                            (u.astype(jnp.float32)) ** 2)
                    return total

                return jax.value_and_grad(loss)(xs)

            return f

        variants = {"old": make(old_pool, old_unpool),
                    "new": make(max_pool_argmax_2x2, max_unpool_2x2)}
        for name, f in variants.items():  # compile
            fence(f(xs0, jnp.uint32(9999)))
        for rnd in range(ROUNDS):
            for name, f in variants.items():
                r = rtt()
                t0 = time.time()
                for i in range(N_EXEC):
                    out = f(xs0, jnp.uint32(1000 + rnd * N_EXEC + i))
                fence(out)
                e = max(time.time() - t0 - r, 1e-9) / N_EXEC
                key = (dt_name, name)
                results[key] = min(results.get(key, float("inf")), e)
                print(f"  [{dt_name}] {name} round {rnd}: "
                      f"{e * 1e3:7.1f} ms", flush=True)

    print("\nbest-of-rounds (pool+unpool x4 fwd+bwd):", flush=True)
    for (dt_name, name), e in sorted(results.items()):
        print(f"  {dt_name:>4} {name}: {e * 1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
