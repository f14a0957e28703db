"""Re-measure the train step after the CE-gather and pooling rewrites.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/step_probe.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

B, H, W = 8, 512, 1024
N_EXEC = 8


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


def main():
    from spalign_tpu.config import TrainConfig
    from spalign_tpu.ops.pooling import (max_pool_argmax_2x2,
                                         max_unpool_2x2)
    from spalign_tpu.train.trainer import (create_train_state,
                                           make_train_step)

    enc_shapes = [(H, W), (H // 2, W // 2), (H // 4, W // 4),
                  (H // 8, W // 8)]

    @jax.jit
    def gen_stack(seed):
        k = jax.random.key(seed)
        return tuple(jax.random.uniform(jax.random.fold_in(k, i),
                                        (B, h, w, 64), jnp.float32)
                     for i, (h, w) in enumerate(enc_shapes))

    enc0 = gen_stack(0)

    @jax.jit
    def pool_unpool(xs, seed):
        def loss(xs):
            total = seed * 0.0
            for x in xs:
                p, idx = max_pool_argmax_2x2(x)
                u = max_unpool_2x2(p * 2.0, idx, out_hw=x.shape[1:3])
                total = total + jnp.sum(u ** 2)
            return total

        return jax.value_and_grad(loss)(xs)

    fence(pool_unpool(enc0, jnp.uint32(999)))
    r = rtt()
    t0 = time.time()
    for i in range(N_EXEC):
        out = pool_unpool(enc0, jnp.uint32(100 + i))
    fence(out)
    dt = max(time.time() - t0 - r, 1e-9) / N_EXEC
    print(f"  reshape-native pool+unpool x4 f+b   {dt * 1e3:8.1f} ms",
          flush=True)

    for dt_name in ("float32", "bfloat16"):
        cfg = TrainConfig(model="basic", batchsize=B, optimizer="Adam",
                          loss="ce", input_shape=(H, W),
                          compute_dtype=dt_name)
        inner = make_train_step(cfg)
        state = {"s": create_train_state(cfg)}

        @jax.jit
        def full(st, seed, _inner=inner):
            k = jax.random.key(seed)
            imgs = jax.random.uniform(jax.random.fold_in(k, 0),
                                      (B, H, W, 3), jnp.float32)
            labels = jax.random.randint(jax.random.fold_in(k, 1),
                                        (B, H, W), -1, 2, jnp.int32)
            return _inner(st, imgs, labels)

        def run(seed, _st=state, _f=full):
            st, m = _f(_st["s"], seed)
            _st["s"] = st
            return m["loss"]

        fence(run(jnp.uint32(9999)))
        r = rtt()
        t0 = time.time()
        for i in range(N_EXEC):
            out = run(jnp.uint32(1000 + i))
        fence(out)
        dtm = max(time.time() - t0 - r, 1e-9) / N_EXEC
        print(f"  FULL step {dt_name:<10} (fixed CE+pool) "
              f"{dtm * 1e3:8.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
