"""A/B the pooling formulation inside the FULL SegNetBasic train step.

tools/pool_probe.py measured adjacent pool+unpool pairs, where the idx
tensors never leave the fusion — but in the real model idx persists
encoder -> decoder AND is saved as a backward residual, so its dtype is
real HBM traffic there.  Variants (monkeypatched into models.segnet):
  old-i32: round-2 6D (2, C) form, int32 idx
  old-i8:  same, int8 idx
  new-i8:  lane-packed (..., 2C) form (current ops/pooling)

Interleaved rounds in ONE process, N chained execs behind one fence,
rtt subtracted (CLAUDE.md tunnel discipline).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/pool_step_probe.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

B, H, W = 8, 512, 1024
N_EXEC = 6
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


def _pos_grid(dtype=jnp.int32):
    dy = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2, 1, 2, 1), 2)
    dx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2, 1, 2, 1), 4)
    return (2 * dy + dx).astype(dtype)


def make_old(idx_dtype):
    def pool(x):
        n, h, w, c = x.shape
        ph, pw = h % 2, w % 2
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        constant_values=-jnp.inf)
        h2, w2 = x.shape[1] // 2, x.shape[2] // 2
        xr = x.reshape(n, h2, 2, w2, 2, c)
        m = jax.lax.stop_gradient(jnp.max(xr, axis=(2, 4), keepdims=True))
        pos = _pos_grid()
        cand = jnp.where(xr == m, pos, 4)
        idx = jnp.min(cand, axis=(2, 4)).astype(idx_dtype)
        sel = cand.astype(idx_dtype) == idx[:, :, None, :, None, :]
        pooled = jnp.sum(jnp.where(sel, xr, 0.0), axis=(2, 4))
        return pooled, idx

    def unpool(x, idx, out_hw=None):
        if x.shape != idx.shape:
            mh = min(x.shape[1], idx.shape[1])
            mw = min(x.shape[2], idx.shape[2])
            x = x[:, :mh, :mw]
            idx = idx[:, :mh, :mw]
        n, h, w, c = x.shape
        sel = idx[:, :, None, :, None, :] == _pos_grid(idx.dtype)
        out6 = jnp.where(sel, x[:, :, None, :, None, :], 0.0)
        out = out6.astype(x.dtype).reshape(n, 2 * h, 2 * w, c)
        if out_hw is not None:
            out = out[:, : out_hw[0], : out_hw[1]]
        return out

    return pool, unpool


def main():
    import spalign_tpu.models.segnet as segnet
    from spalign_tpu.config import TrainConfig
    from spalign_tpu.ops.pooling import (max_pool_argmax_2x2,
                                         max_unpool_2x2)
    from spalign_tpu.train.trainer import (create_train_state,
                                           make_train_step)

    variants = {
        "old-i32": make_old(jnp.int32),
        "old-i8": make_old(jnp.int8),
        "new-i8": (max_pool_argmax_2x2, max_unpool_2x2),
    }
    print(f"pool_step_probe: FULL train step B={B} {H}x{W}; "
          f"N={N_EXEC} execs/fence, {ROUNDS} rounds", flush=True)

    results = {}
    for dt_name in ("float32", "bfloat16"):
        runners = {}
        for vname, (pool, unpool) in variants.items():
            segnet.max_pool_argmax_2x2 = pool
            segnet.max_unpool_2x2 = unpool
            cfg = TrainConfig(model="basic", batchsize=B,
                              optimizer="Adam", loss="ce",
                              input_shape=(H, W), compute_dtype=dt_name)
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

            fence(run(jnp.uint32(9999)))  # compile
            runners[vname] = run
        for rnd in range(ROUNDS):
            for vname, run in runners.items():
                r = rtt()
                t0 = time.time()
                for i in range(N_EXEC):
                    out = run(jnp.uint32(1000 + rnd * N_EXEC + i))
                fence(out)
                e = max(time.time() - t0 - r, 1e-9) / N_EXEC
                key = (dt_name, vname)
                results[key] = min(results.get(key, float("inf")), e)
                print(f"  [{dt_name}] {vname} round {rnd}: "
                      f"{e * 1e3:7.1f} ms/step", flush=True)

    print("\nbest-of-rounds (FULL train step):", flush=True)
    for (dt_name, vname), e in sorted(results.items()):
        print(f"  {dt_name:>8} {vname}: {e * 1e3:7.1f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
