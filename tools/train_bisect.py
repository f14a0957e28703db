"""Graph-surgery bisect of SegNetBasic's forward slowdown on real TPU.

train_probe r3 finding: the real forward (207 ms) runs 4x slower than a
conv chain with identical FLOPs (50 ms), yet each op family is fast in
isolation — so the slowdown lives in the COMPOSITION. This probe swaps
one op family at a time for a cheap stand-in and times the forward:

  full      : LRN + (conv-BN-relu-pool)x4 + (unpool-conv-BN)x4 + cls
  no_bn     : BN -> identity
  no_pool   : argmax pool -> strided slice, unpool -> 2x repeat
  no_lrn    : LRN -> identity
  bare      : all three stand-ins (should approach the conv chain)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/train_bisect.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

B, H, W = 8, 512, 1024
N_EXEC = 8


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


from tools._probe import rtt  # shared tunnel probe (one impl)


def main():
    import flax.linen as nn

    from spalign_tpu.ops.lrn import local_response_normalization
    from spalign_tpu.ops.pooling import (max_pool_argmax_2x2,
                                         max_unpool_2x2)

    class Variant(nn.Module):
        use_bn: bool = True
        use_pool: bool = True
        use_lrn: bool = True

        @nn.compact
        def __call__(self, x, train: bool = True):
            def conv(name):
                return nn.Conv(64, (7, 7), padding=((3, 3), (3, 3)),
                               use_bias=False, name=name)

            def bn(name, h):
                if not self.use_bn:
                    return h
                return nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=2e-5,
                                    name=name)(h)

            h = x
            if self.use_lrn:
                h = local_response_normalization(
                    h, n=5, k=1.0, alpha=1e-4 / 5.0, beta=0.75)
            idxs, shapes = [], []
            for i in range(1, 5):
                h = nn.relu(bn(f"conv{i}_bn", conv(f"conv{i}")(h)))
                shapes.append(h.shape[1:3])
                if self.use_pool:
                    h, idx = max_pool_argmax_2x2(h)
                    idxs.append(idx)
                else:
                    h = h[:, ::2, ::2, :]
                    idxs.append(None)
            for i in range(4, 0, -1):
                if self.use_pool:
                    h = max_unpool_2x2(h, idxs[i - 1],
                                       out_hw=shapes[i - 1])
                else:
                    h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = bn(f"conv_decode{i}_bn", conv(f"conv_decode{i}")(h))
            return nn.Conv(2, (1, 1), use_bias=True,
                           name="conv_classifier")(h)

    @jax.jit
    def gen_img(seed):
        return jax.random.uniform(jax.random.key(seed), (B, H, W, 3),
                                  jnp.float32)

    img0 = gen_img(0)

    variants = [
        ("full", dict()),
        ("no_bn", dict(use_bn=False)),
        ("no_pool", dict(use_pool=False)),
        ("no_lrn", dict(use_lrn=False)),
        ("bare", dict(use_bn=False, use_pool=False, use_lrn=False)),
    ]
    print(f"train_bisect fwd-only: B={B} {H}x{W}", flush=True)
    for name, kw in variants:
        m = Variant(**kw)
        v = jax.jit(lambda x, _m=m: _m.init(jax.random.key(0), x,
                                            train=False))(img0)

        @jax.jit
        def fwd(v, x, seed, _m=m):
            out = _m.apply(v, x, train=True,
                           mutable=["batch_stats"] if _m.use_bn else [])
            out = out[0] if isinstance(out, tuple) else out
            return jnp.sum(out ** 2) + seed * 0.0

        fence(fwd(v, img0, jnp.uint32(999)))
        r = rtt()
        t0 = time.time()
        for i in range(N_EXEC):
            out = fwd(v, img0, jnp.uint32(100 + i))
        fence(out)
        dt = max(time.time() - t0 - r, 1e-9) / N_EXEC
        print(f"  {name:<10} {dt * 1e3:8.1f} ms fwd", flush=True)


if __name__ == "__main__":
    main()
