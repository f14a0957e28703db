"""Per-op attribution probe for the SegNetBasic train step on real TPU.

VERDICT r2 #3: bf16 buys only 1.24x where MXU-bound code would near 2x —
this probe decomposes the step into its op families, each timed as its
own program with all inputs GENERATED ON DEVICE from a scalar seed (so
the serialized ~40 MB/s uplink never touches the timed region), N
dependent executions behind ONE host fetch (the only real fence on this
runtime), everything interleaved in one process per the tunnel-drift
discipline in CLAUDE.md.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/train_probe.py
Paste the final table into docs/train_profile.md.
"""

import time
from functools import partial

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


rows = []


def bench(name, fn, *static_args, flops=None):
    """fn(*static_args, seed:int) -> scalar-ish; times N chained execs."""
    out = fn(*static_args, jnp.uint32(9999))
    fence(out)  # warm + compile
    r = rtt()
    t0 = time.time()
    for i in range(N_EXEC):
        out = fn(*static_args, jnp.uint32(1000 + i))
    fence(out)
    dt = max(time.time() - t0 - r, 1e-9) / N_EXEC
    if flops is None:
        try:
            flops = fn.lower(*static_args, jnp.uint32(0)).compile(
            ).cost_analysis().get("flops", float("nan"))
        except Exception:
            flops = float("nan")
    rows.append((name, dt * 1e3, flops / 1e9,
                 flops / dt / 197e12 * 100))
    print(f"  {name:<34} {dt * 1e3:8.1f} ms  {flops / 1e9:9.1f} GFLOP  "
          f"{flops / dt / 197e12 * 100:5.1f}% bf16-peak", flush=True)
    return dt


def main():
    from spalign_tpu.config import TrainConfig
    from spalign_tpu.ops.lrn import local_response_normalization
    from spalign_tpu.ops.pooling import (max_pool_argmax_2x2,
                                         max_unpool_2x2)
    from spalign_tpu.train.trainer import (create_train_state,
                                           make_train_step)

    print(f"train_probe: B={B} {H}x{W} (reference recipe); "
          f"N={N_EXEC} chained execs/fence", flush=True)

    # --- full train steps (on-device batch synthesis) --------------------
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

        def run(_st=state, _f=full, seed=None):
            st, m = _f(_st["s"], seed)
            _st["s"] = st
            return m["loss"]

        # warm (the donated buffer rebinds through the dict)
        fence(run(seed=jnp.uint32(9999)))
        r = rtt()
        t0 = time.time()
        for i in range(N_EXEC):
            out = run(seed=jnp.uint32(1000 + i))
        fence(out)
        dt = max(time.time() - t0 - r, 1e-9) / N_EXEC
        fl = float("nan")
        try:
            fl = full.lower(state["s"], jnp.uint32(0)).compile(
            ).cost_analysis().get("flops", float("nan"))
        except Exception:
            pass
        rows.append((f"FULL step {dt_name}", dt * 1e3, fl / 1e9,
                     fl / dt / 197e12 * 100))
        print(f"  FULL step {dt_name:<24} {dt * 1e3:8.1f} ms  "
              f"{fl / 1e9:9.1f} GFLOP  "
              f"{fl / dt / 197e12 * 100:5.1f}% bf16-peak", flush=True)

    # --- op-family microbenches (fwd+bwd) --------------------------------
    enc_shapes = [(H, W), (H // 2, W // 2), (H // 4, W // 4),
                  (H // 8, W // 8)]

    import flax.linen as nn

    class ConvChain(nn.Module):
        """The 9 convs of SegNetBasic, pooling as slicing: MXU floor."""

        dtype: object = None

        @nn.compact
        def __call__(self, x):
            h = x
            for i in range(4):
                h = nn.Conv(64, (7, 7), use_bias=False,
                            dtype=self.dtype, name=f"c{i}")(h)
                h = h[:, ::2, ::2, :]
            for i in range(4):
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(64, (7, 7), use_bias=False,
                            dtype=self.dtype, name=f"d{i}")(h)
            return nn.Conv(2, (1, 1), dtype=self.dtype, name="cls")(h)

    for dt_name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        m = ConvChain(dtype=dt)
        v = m.init(jax.random.key(0), jnp.zeros((1, H, W, 3)))

        @jax.jit
        def conv_step(v, seed, _m=m):
            x = jax.random.uniform(jax.random.key(seed), (B, H, W, 3),
                                   jnp.float32)

            def loss(p):
                return jnp.mean(_m.apply(p, x) ** 2)

            return jax.value_and_grad(loss)(v)[0]

        bench(f"conv-chain fwd+bwd {dt_name}", conv_step, v)

    class BNStack(nn.Module):
        @nn.compact
        def __call__(self, xs):
            out = 0.0
            for i, x in enumerate(xs):
                h = nn.BatchNorm(use_running_average=False, momentum=0.9,
                                 epsilon=2e-5, name=f"bn{i}")(x)
                out = out + jnp.sum(h ** 2)
            return out

    bn_shapes = enc_shapes + enc_shapes[::-1]  # 8 BNs enc+dec

    def gen_xs(seed, shapes):
        k = jax.random.key(seed)
        return tuple(jax.random.uniform(jax.random.fold_in(k, i),
                                        (B, h, w, 64), jnp.float32)
                     for i, (h, w) in enumerate(shapes))

    bn = BNStack()
    bn_v = jax.jit(lambda: bn.init(jax.random.key(0),
                                   gen_xs(0, bn_shapes)))()

    @jax.jit
    def bn_step(v, seed):
        xs = gen_xs(seed, bn_shapes)

        def loss(p):
            out, _ = bn.apply(p, xs, mutable=["batch_stats"])
            return out

        return jax.value_and_grad(loss)(v)[0]

    bench("BN x8 train-mode fwd+bwd", bn_step, bn_v)

    @jax.jit
    def pool_unpool(seed):
        xs = gen_xs(seed, enc_shapes)

        def loss(xs):
            total = 0.0
            for x in xs:
                p, idx = max_pool_argmax_2x2(x)
                u = max_unpool_2x2(p * 2.0, idx, out_hw=x.shape[1:3])
                total = total + jnp.sum(u ** 2)
            return total

        return jax.value_and_grad(loss)(xs)[0]

    bench("pool+unpool x4 fwd+bwd", pool_unpool)

    @jax.jit
    def lrn_step(seed):
        x = jax.random.uniform(jax.random.key(seed), (B, H, W, 3),
                               jnp.float32)

        def loss(x):
            return jnp.sum(local_response_normalization(
                x, n=5, k=1.0, alpha=1e-4 / 5.0, beta=0.75) ** 2)

        return jax.value_and_grad(loss)(x)[0]

    bench("LRN input fwd+bwd", lrn_step)

    @jax.jit
    def relu_sweep(seed):
        xs = gen_xs(seed, bn_shapes)

        def loss(xs):
            return sum(jnp.sum(jax.nn.relu(x)) for x in xs)

        return jax.value_and_grad(loss)(xs)[0]

    bench("relu x8 fwd+bwd (bandwidth ref)", relu_sweep)

    print("\n| piece | ms | GFLOP | % bf16 peak |")
    print("|---|---|---|---|")
    for n, ms, gf, pct in rows:
        print(f"| {n} | {ms:.1f} | {gf:.1f} | {pct:.1f} |")


if __name__ == "__main__":
    main()
