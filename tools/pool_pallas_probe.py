"""A/B ops/pooling XLA form vs kernels/pooling_pallas in the FULL
SegNetBasic train step on real TPU.

The Pallas kernels stream pool/scatter/gather at the (.., W/2, 2C)
lane-half view (see kernels/pooling_pallas.py); the XLA 6D form
measured ~70 ms of the 338 ms f32 step (tools/train_probe.py).

Interleaved rounds in ONE process, N chained execs behind one fence,
rtt subtracted (CLAUDE.md tunnel discipline).  The impl is selected at
TRACE time via ops.pooling.POOL_IMPL, so each variant jits its own
step under its own setting.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/pool_pallas_probe.py
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


def main():
    from spalign_tpu.config import TrainConfig
    from spalign_tpu.ops import pooling
    from spalign_tpu.train.trainer import (create_train_state,
                                           make_train_step)

    print(f"pool_pallas_probe: FULL train step B={B} {H}x{W}; "
          f"N={N_EXEC} execs/fence, {ROUNDS} rounds", flush=True)

    results = {}
    for dt_name in ("float32", "bfloat16"):
        runners = {}
        for impl in ("xla", "pallas"):
            pooling.POOL_IMPL = impl  # read at trace time
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

            fence(run(jnp.uint32(9999)))  # compile under this impl
            runners[impl] = run
        pooling.POOL_IMPL = "auto"
        for rnd in range(ROUNDS):
            for impl, run in runners.items():
                r = rtt()
                t0 = time.time()
                for i in range(N_EXEC):
                    out = run(jnp.uint32(1000 + rnd * N_EXEC + i))
                fence(out)
                e = max(time.time() - t0 - r, 1e-9) / N_EXEC
                key = (dt_name, impl)
                results[key] = min(results.get(key, float("inf")), e)
                print(f"  [{dt_name}] {impl} round {rnd}: "
                      f"{e * 1e3:7.1f} ms/step", flush=True)

    print("\nbest-of-rounds (FULL train step):", flush=True)
    for (dt_name, impl), e in sorted(results.items()):
        print(f"  {dt_name:>8} {impl}: {e * 1e3:7.1f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
