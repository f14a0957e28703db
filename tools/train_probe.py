"""Per-op attribution probe for the SegNetBasic train step on real TPU.

VERDICT r2 #3: bf16 buys only 1.24x where MXU-bound code would near 2x.
This probe decomposes the step into op families. Discipline (CLAUDE.md):
one process, interleaved variants, N dependent executions behind ONE
host fetch (the only real fence on this runtime), tunnel rtt subtracted.
Microbench inputs are generated on device ONCE and reused; a scalar
seed input defeats the runtime's input-memoization; GRADS ARE RETURNED
(returning only the loss lets XLA dead-code-eliminate the whole
backward pass — the round-3 first cut measured forward-only numbers).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/train_probe.py
Paste the final table into docs/train_profile.md.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

B, H, W = 8, 512, 1024
N_EXEC = 8

rows = []


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


def bench(name, fn, *static_args):
    out = fn(*static_args, jnp.uint32(9999))
    fence(out)  # warm + compile
    r = rtt()
    t0 = time.time()
    for i in range(N_EXEC):
        out = fn(*static_args, jnp.uint32(1000 + i))
    fence(out)
    dt = max(time.time() - t0 - r, 1e-9) / N_EXEC
    try:
        flops = fn.lower(*static_args, jnp.uint32(0)).compile(
        ).cost_analysis().get("flops", float("nan"))
    except Exception:
        flops = float("nan")
    rows.append((name, dt * 1e3, flops / 1e9, flops / dt / 197e12 * 100))
    print(f"  {name:<34} {dt * 1e3:8.1f} ms  {flops / 1e9:9.1f} GFLOP  "
          f"{flops / dt / 197e12 * 100:5.1f}% bf16-peak", flush=True)
    return dt


def main():
    from spalign_tpu.config import TrainConfig
    from spalign_tpu.models import SegNetBasic
    from spalign_tpu.ops.lrn import local_response_normalization
    from spalign_tpu.ops.pooling import (max_pool_argmax_2x2,
                                         max_unpool_2x2)
    from spalign_tpu.train.losses import softmax_cross_entropy
    from spalign_tpu.train.trainer import (create_train_state,
                                           make_train_step)

    print(f"train_probe: B={B} {H}x{W} (reference recipe); "
          f"N={N_EXEC} chained execs/fence", flush=True)

    # --- full train steps + forward-only splits --------------------------
    for dt_name, dt in (("float32", None), ("bfloat16", jnp.bfloat16)):
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

        fence(run(seed=jnp.uint32(9999)))
        r = rtt()
        t0 = time.time()
        for i in range(N_EXEC):
            out = run(seed=jnp.uint32(1000 + i))
        fence(out)
        dtime = max(time.time() - t0 - r, 1e-9) / N_EXEC
        fl = float("nan")
        try:
            fl = full.lower(state["s"], jnp.uint32(0)).compile(
            ).cost_analysis().get("flops", float("nan"))
        except Exception:
            pass
        rows.append((f"FULL step {dt_name}", dtime * 1e3, fl / 1e9,
                     fl / dtime / 197e12 * 100))
        print(f"  FULL step {dt_name:<24} {dtime * 1e3:8.1f} ms  "
              f"{fl / 1e9:9.1f} GFLOP  "
              f"{fl / dtime / 197e12 * 100:5.1f}% bf16-peak", flush=True)

        # forward-only (train mode, loss value; no grads requested)
        model = SegNetBasic(n_class=2, dtype=dt)
        variables = {"params": state["s"].params,
                     "batch_stats": state["s"].batch_stats}

        @jax.jit
        def fwd(v, seed, _m=model):
            k = jax.random.key(seed)
            imgs = jax.random.uniform(jax.random.fold_in(k, 0),
                                      (B, H, W, 3), jnp.float32)
            labels = jax.random.randint(jax.random.fold_in(k, 1),
                                        (B, H, W), -1, 2, jnp.int32)
            out, _ = _m.apply(v, imgs, train=True,
                              mutable=["batch_stats"])
            return softmax_cross_entropy(out, labels)

        bench(f"forward-only {dt_name}", fwd, variables)

    # --- op-family microbenches (fwd+bwd, grads returned) ----------------
    enc_shapes = [(H, W), (H // 2, W // 2), (H // 4, W // 4),
                  (H // 8, W // 8)]
    bn_shapes = enc_shapes + enc_shapes[::-1]

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

    # device-resident inputs, generated once
    @jax.jit
    def gen_img(seed):
        return jax.random.uniform(jax.random.key(seed), (B, H, W, 3),
                                  jnp.float32)

    @jax.jit
    def gen_stack(seed):
        k = jax.random.key(seed)
        return tuple(jax.random.uniform(jax.random.fold_in(k, i),
                                        (B, h, w, 64), jnp.float32)
                     for i, (h, w) in enumerate(bn_shapes))

    img0 = gen_img(0)
    stack0 = gen_stack(0)
    enc0 = stack0[:4]

    for dt_name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        m = ConvChain(dtype=dt)
        v = m.init(jax.random.key(0), jnp.zeros((1, H, W, 3)))

        @jax.jit
        def conv_step(v, x, seed, _m=m):
            def loss(p):
                return jnp.mean(_m.apply(p, x) ** 2) + seed * 0.0

            return jax.value_and_grad(loss)(v)  # grads kept alive

        bench(f"conv-chain fwd+bwd {dt_name}", conv_step, v, img0)

        @jax.jit
        def conv_fwd(v, x, seed, _m=m):
            return jnp.mean(_m.apply(v, x) ** 2) + seed * 0.0

        bench(f"conv-chain fwd-only {dt_name}", conv_fwd, v, img0)

    class BNStack(nn.Module):
        @nn.compact
        def __call__(self, xs):
            out = 0.0
            for i, x in enumerate(xs):
                h = nn.BatchNorm(use_running_average=False, momentum=0.9,
                                 epsilon=2e-5, name=f"bn{i}")(x)
                out = out + jnp.sum(h ** 2)
            return out

    bn = BNStack()
    bn_v = jax.jit(lambda xs: bn.init(jax.random.key(0), xs))(stack0)

    @jax.jit
    def bn_step(v, xs, seed):
        def loss(p):
            out, _ = bn.apply(p, xs, mutable=["batch_stats"])
            return out + seed * 0.0

        return jax.value_and_grad(loss)(v)

    bench("BN x8 train fwd+bwd(params)", bn_step, bn_v, stack0)

    @jax.jit
    def bn_step_x(v, xs, seed):
        def loss(xs):
            out, _ = bn.apply(v, xs, mutable=["batch_stats"])
            return out + seed * 0.0

        return jax.value_and_grad(loss)(xs)

    bench("BN x8 train fwd+bwd(inputs)", bn_step_x, bn_v, stack0)

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

    bench("pool+unpool x4 fwd+bwd", pool_unpool, enc0)

    @jax.jit
    def lrn_step(x, seed):
        def loss(x):
            return jnp.sum(local_response_normalization(
                x, n=5, k=1.0, alpha=1e-4 / 5.0, beta=0.75) ** 2) \
                + seed * 0.0

        return jax.value_and_grad(loss)(x)

    bench("LRN input fwd+bwd", lrn_step, img0)

    @jax.jit
    def relu_sweep(xs, seed):
        def loss(xs):
            return sum(jnp.sum(jax.nn.relu(x)) for x in xs) + seed * 0.0

        return jax.value_and_grad(loss)(xs)

    bench("relu x8 fwd+bwd (bandwidth ref)", relu_sweep, stack0)

    print("\n| piece | ms | GFLOP | % bf16 peak |")
    print("|---|---|---|---|")
    for n, ms, gf, pct in rows:
        print(f"| {n} | {ms:.1f} | {gf:.1f} | {pct:.1f} |")


if __name__ == "__main__":
    main()
