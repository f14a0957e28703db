"""Decompose the fused label-gen device program at the bench unit shape.

Pieces, each its own program, N chained executions behind one fence:
  DRN features only | SLIC only | align+prior+kmeans+paint only | fused

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/label_probe.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

G, B = 5, 30
HW = (224, 224)
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
    print(f"  {name:<34} {dt * 1e3:8.1f} ms/unit "
          f"({G * B / dt:6.0f} img/s-bound)", flush=True)
    return dt


def main():
    from spalign_tpu.config import LabelGenConfig, SuperpixelConfig
    from spalign_tpu.kernels.slic import slic, slic_grid_size
    from spalign_tpu.pipeline.label_gen import (SpalignLabelGenerator,
                                                build_feature_fn,
                                                spalign_cluster)

    sp = SuperpixelConfig(method="slic", n_slic_segments=100,
                          slic_iters=10, max_superpixels=256,
                          slic_enforce_connectivity=False)
    cfg = LabelGenConfig(batchsize=B, superpixel=sp,
                         groups_per_dispatch=G, save_masks=False)
    gen = SpalignLabelGenerator(cfg)
    n = G * B
    s_grid = slic_grid_size(*HW, 100)
    print(f"label_probe: unit {G}x{B} imgs @ {HW}, "
          f"model_dtype={cfg.model_dtype}, s_grid={s_grid}", flush=True)

    @jax.jit
    def gen_imgs(seed):
        return jax.random.randint(jax.random.key(seed), (n, *HW, 3),
                                  0, 255, jnp.int32).astype(jnp.uint8)

    imgs0 = gen_imgs(0)
    feature_fn = jax.jit(build_feature_fn(gen.model, gen.variables,
                                          cfg.use_feature_maps))

    @jax.jit
    def feats_only(imgs, seed):
        # scalar output: the fence must not drag the 120 MB feature map
        # over the ~25 MB/s downlink (the first probe cut did, inflating
        # this row 11x)
        return jnp.sum(feature_fn(imgs).astype(jnp.float32)) + seed * 0.0

    bench("DRN features (bf16)", feats_only, imgs0)

    @jax.jit
    def slic_only(imgs, seed):
        return jnp.sum(jax.vmap(lambda im: slic(
            im, n_segments=100, compactness=sp.slic_compactness,
            n_iter=10))(imgs) + seed * 0)

    bench("SLIC x10 iters", slic_only, imgs0)

    sps0 = jax.jit(jax.vmap(lambda im: slic(
        im, n_segments=100, compactness=sp.slic_compactness,
        n_iter=10)))(imgs0)
    fm0 = feature_fn(imgs0)

    @jax.jit
    def cluster_only(fm, sps, seed):
        def group(fm, sp, s):
            return spalign_cluster(
                fm, sp, jax.random.key(s),
                n_anchors=cfg.align.n_anchors, num_segments=s_grid,
                append_pos=cfg.align.append_pos,
                k=cfg.kmeans.n_clusters, n_iter=cfg.kmeans.n_iter,
                prior_params=(0.75, 0.5, 0.1, 0.1))[0]

        seeds = seed + jnp.arange(G, dtype=jnp.uint32)
        return jnp.sum(jax.vmap(group)(
            fm.reshape(G, B, *fm.shape[1:]),
            sps.reshape(G, B, *sps.shape[1:]), seeds))

    bench("align+prior+kmeans+paint", cluster_only, fm0, sps0)

    prog = gen._fused_program()

    def fused(imgs, seed):
        seeds = seed + jnp.arange(G, dtype=jnp.uint32)
        return prog(imgs, seeds, np.int32(cfg.kmeans.n_clusters))[1]

    bench("FUSED program (packed out)", fused, imgs0)


if __name__ == "__main__":
    main()
