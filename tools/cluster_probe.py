"""Decompose the align+prior+kmeans+paint stage (~121 ms/unit in
tools/label_probe.py) at the bench unit shape: which piece owns the
time — the anchor-sampling sort, the bilinear align, the prior segment
means, the Lloyd while_loop, or the painting gather?

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/cluster_probe.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

G, B = 5, 30
HW = (224, 224)
C = 512 + 2  # DRN map + append_pos
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


def bench(name, fn, *args):
    fence(fn(*args, jnp.uint32(999)))
    r = rtt()
    t0 = time.time()
    for i in range(N_EXEC):
        out = fn(*args, jnp.uint32(100 + i))
    fence(out)
    dt = max(time.time() - t0 - r, 1e-9) / N_EXEC
    print(f"  {name:<34} {dt * 1e3:8.1f} ms/unit", flush=True)
    return dt


def main():
    from spalign_tpu.kernels.slic import slic, slic_grid_size
    from spalign_tpu.ops.align import superpixel_align
    from spalign_tpu.ops.kmeans import paint_clusters, weighted_kmeans
    from spalign_tpu.ops.prior import pixel_prior
    from spalign_tpu.ops.segments import segment_mean

    n = G * B
    s = slic_grid_size(*HW, 100)
    print(f"cluster_probe: unit {G}x{B} imgs, S={s}, C={C}", flush=True)

    @jax.jit
    def gen_inputs(seed):
        k1, k2 = jax.random.split(jax.random.key(seed))
        fm = jax.random.normal(k1, (n, 28, 28, C - 2), jnp.float32)
        imgs = jax.random.randint(k2, (n, *HW, 3), 0, 255,
                                  jnp.int32).astype(jnp.uint8)
        sps = jax.vmap(lambda im: slic(im, n_segments=100,
                                       n_iter=10))(imgs)
        return fm, sps

    fm0, sps0 = gen_inputs(0)
    fence((fm0, sps0))

    @jax.jit
    def align_only(fm, sps, seed):
        keys = jax.random.split(jax.random.key(seed), n)
        feats, valid = jax.vmap(
            lambda f, sp, kk: superpixel_align(f, sp, kk, 10, s, True)
        )(fm, sps, keys)
        return jnp.sum(feats) + jnp.sum(valid)

    bench("align (sample+bilinear+segmean)", align_only, fm0, sps0)

    @jax.jit
    def prior_only(fm, sps, seed):
        pp = pixel_prior(*HW, 0.75, 0.5, 0.1, 0.1)
        pr = jax.vmap(lambda sp: segment_mean(
            pp.reshape(-1), sp.reshape(-1), s))(sps)
        return jnp.sum(pr) + seed * 0.0

    bench("prior segment-mean", prior_only, fm0, sps0)

    # k-means on realistic aligned features
    @jax.jit
    def make_fpv(fm, sps, seed):
        keys = jax.random.split(jax.random.key(seed), n)
        feats, valid = jax.vmap(
            lambda f, sp, kk: superpixel_align(f, sp, kk, 10, s, True)
        )(fm, sps, keys)
        pp = pixel_prior(*HW, 0.75, 0.5, 0.1, 0.1)
        pr = jax.vmap(lambda sp: segment_mean(
            pp.reshape(-1), sp.reshape(-1), s))(sps)
        return feats, valid, pr

    feats0, valid0, prior0 = make_fpv(fm0, sps0, 7)
    fence((feats0, valid0, prior0))

    @jax.jit
    def kmeans_only(feats, valid, prior, seed):
        def group(f, v, p, sd):
            res = weighted_kmeans(f.reshape(B * s, -1), p.reshape(-1),
                                  v.reshape(-1), jax.random.key(sd),
                                  k=4, n_iter=1000)
            return res.assignment.sum() + res.n_iter

        seeds = seed + jnp.arange(G, dtype=jnp.uint32)
        return jnp.sum(jax.vmap(group)(
            feats.reshape(G, B, s, -1), valid.reshape(G, B, s),
            prior.reshape(G, B, s), seeds))

    bench("weighted k-means (<=1000 iters)", kmeans_only, feats0,
          valid0, prior0)

    assign0 = jnp.zeros((n, s), jnp.int32)

    @jax.jit
    def paint_only(sps, assign, seed):
        return jnp.sum(paint_clusters(sps, assign + seed * 0))

    bench("paint (gather)", paint_only, sps0, assign0)


if __name__ == "__main__":
    main()
