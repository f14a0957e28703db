"""BN-reduction A/B in the FULL SegNetBasic train step on real TPU.

VERDICT r4 #7 (the last named train-step bandwidth candidate): flax's
BatchNorm computes batch statistics as two reductions over the
activation (sum and sum-of-squares); if XLA schedules them as separate
HBM passes, fusing them into ONE pass — or pushing them onto the MXU as
a dot against a ones vector — could recover part of the ~25 ms the
isolated-family probe attributed to the 8 BNs.

Variants (all bit-compatible BN semantics: fast-variance mean2 - mean^2,
momentum 0.9, eps 2e-5, same param/stat names so the stock
create_train_state/make_train_step drive them):
  A. flax nn.BatchNorm                  (the shipped model)
  B. single-pass concat reduction:      sums = ones @ [x | x*x]
                                        — one (M, 2C) MXU dot, one read
  C. two explicit jnp.sum reductions    (what flax lowers to; control
                                        for framework overhead)

Discipline (CLAUDE.md + docs/perf_playbook.md §1): one process,
interleaved variants, N dependent executions behind ONE host fetch,
tunnel rtt measured and subtracted, inputs varied via a seed operand to
defeat the runtime's execution memoization.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python tools/bn_probe.py
Paste the table into docs/train_profile.md (A/B item 4).
"""

import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from spalign_tpu.ops.lrn import local_response_normalization
from spalign_tpu.ops.pooling import max_pool_argmax_2x2, max_unpool_2x2

B, H, W = 8, 512, 1024
N_EXEC = 8


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


from tools._probe import rtt  # shared tunnel probe (one impl)


class StatBatchNorm(nn.Module):
    """BN with swappable batch-statistic computation.  Matches flax
    nn.BatchNorm semantics (use_fast_variance path): var = E[x^2] -
    E[x]^2, running stats EMA with momentum, eps inside the rsqrt.
    Param/collection names match flax so TrainState plumbing is
    unchanged."""

    stats: str = "two_pass"  # "two_pass" | "concat_dot"
    momentum: float = 0.9
    epsilon: float = 2e-5
    dtype: Optional[jnp.dtype] = None
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x, use_running_average=None):
        ura = nn.merge_param("use_running_average",
                             self.use_running_average,
                             use_running_average)
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.constant(0.001), (c,),
                          jnp.float32)
        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            m = x.size // c
            if self.stats == "concat_dot":
                # ONE pass: [x | x*x] reduced by a ones-vector dot on
                # the MXU — (1, M) @ (M, 2C)
                x2 = jnp.concatenate(
                    [xf.reshape(m, c), (xf * xf).reshape(m, c)], axis=1)
                sums = jnp.ones((1, m), jnp.float32) @ x2
                mean = sums[0, :c] / m
                mean2 = sums[0, c:] / m
            else:
                mean = jnp.mean(xf, axis=(0, 1, 2))
                mean2 = jnp.mean(xf * xf, axis=(0, 1, 2))
            var = mean2 - mean * mean
            if not self.is_initializing():
                # EMA matches flax nn.BatchNorm (no Bessel correction)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + self.epsilon) * scale + bias
        return y.astype(self.dtype or x.dtype)


class SegNetBasicBN(nn.Module):
    """SegNetBasic with the probe BN (structure == models/segnet.py)."""

    stats: str = "two_pass"
    n_class: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(name):
            return nn.Conv(64, (7, 7), padding=((3, 3), (3, 3)),
                           use_bias=False,
                           kernel_init=nn.initializers.he_normal(),
                           name=name, dtype=self.dtype)

        def bn(name):
            return StatBatchNorm(stats=self.stats,
                                 use_running_average=not train,
                                 name=name, dtype=self.dtype)

        h = local_response_normalization(x, n=5, k=1.0, alpha=1e-4 / 5.0,
                                         beta=0.75)
        idxs, shapes = [], []
        for i in range(1, 5):
            h = nn.relu(bn(f"conv{i}_bn")(conv(f"conv{i}")(h)))
            shapes.append(h.shape[1:3])
            h, idx = max_pool_argmax_2x2(h)
            idxs.append(idx)
        for i in range(4, 0, -1):
            h = max_unpool_2x2(h, idxs[i - 1], out_hw=shapes[i - 1])
            h = bn(f"conv_decode{i}_bn")(conv(f"conv_decode{i}")(h))
        return nn.Conv(self.n_class, (1, 1), use_bias=True,
                       kernel_init=nn.initializers.he_normal(),
                       name="conv_classifier", dtype=self.dtype)(h)


def main():
    from spalign_tpu.config import TrainConfig
    from spalign_tpu.models import SegNetBasic
    from spalign_tpu.train.trainer import (create_train_state,
                                           make_train_step)

    print(f"bn_probe: B={B} {H}x{W}; N={N_EXEC} chained execs/fence; "
          f"rtt {rtt() * 1e3:.0f} ms", flush=True)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(-1, 2, (B, H, W)), jnp.int32)

    for dt_name, dt in (("float32", None), ("bfloat16", jnp.bfloat16)):
        cfg = TrainConfig(model="basic", batchsize=B, optimizer="Adam",
                          loss="ce", input_shape=(H, W),
                          compute_dtype=dt_name)
        variants = [
            ("flax BN", SegNetBasic(n_class=2, dtype=dt)),
            ("concat-dot BN", SegNetBasicBN(stats="concat_dot",
                                            n_class=2, dtype=dt)),
            ("two-pass BN", SegNetBasicBN(stats="two_pass",
                                          n_class=2, dtype=dt)),
        ]
        prepared = []
        for name, model in variants:
            state = create_train_state(cfg, model=model,
                                       sample_batch_shape=(H, W))
            step = make_train_step(cfg, model=model)
            # warm/compile + correctness cross-check on the loss
            s2, m = step(state, imgs, labels)
            fence(m["loss"])
            prepared.append((name, step,
                             create_train_state(
                                 cfg, model=model,
                                 sample_batch_shape=(H, W)),
                             float(m["loss"])))
        losses = [p[3] for p in prepared]
        print(f"[{dt_name}] first-step losses: "
              + ", ".join(f"{n}={l:.5f}" for (n, _, _, l) in prepared),
              flush=True)
        assert max(losses) - min(losses) < 5e-3, losses
        # interleaved timed rounds (the step donates its state buffers,
        # so thread each variant's live state through the rounds)
        states = {name: st for name, _, st, _ in prepared}
        for rnd in range(3):
            for name, step, _, _ in prepared:
                r = rtt()
                st = states[name]
                t0 = time.time()
                for _ in range(N_EXEC):
                    st, m = step(st, imgs, labels)
                fence(m["loss"])
                dt_ms = (time.time() - t0 - r) / N_EXEC * 1e3
                states[name] = st
                print(f"  [{dt_name}] round {rnd} {name:<14} "
                      f"{dt_ms:7.1f} ms/step (rtt {r * 1e3:.0f} ms)",
                      flush=True)


if __name__ == "__main__":
    main()
