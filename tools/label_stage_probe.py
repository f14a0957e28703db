"""Per-STAGE device attribution of the fused label-gen program.

Decomposes the flagship fused program (wire decode -> SLIC -> DRN ->
anchors -> align+prior -> joint k-means -> painting) at the bench unit
shape (GROUPS x BATCH imgs @ 224^2, yuv420 wire, bf16 DRN) into
isolated device programs, each timed as N chained executions behind ONE
host fence with the tunnel round-trip subtracted (the only valid timing
method on this runtime — perf_playbook.md §1).

Caveats honored:
  * inputs are REALISTIC synthetic road scenes (kmeans/SLIC trip counts
    are data-dependent; random noise would distort them), varied per
    execution so the runtime memoizer cannot shortcut;
  * stage programs return SCALARS (a full-output fence would drag MB
    over the ~25 MB/s downlink and poison the number);
  * all stages run round-robin per round, min across rounds — the
    tunnel drifts on an hours scale, so A/B only within one process;
  * per-op rows OVER-attribute whatever XLA fuses across stage
    boundaries in the full program; the fused row is ground truth and
    the stage rows are its decomposition hypothesis (their sum >= it).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/label_stage_probe.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

G, B = 5, 30
HW = (224, 224)
N_EXEC = 8
ROUNDS = 3


def fence_scalar(x):
    return float(np.asarray(x))


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


class Stage:
    def __init__(self, name, fn, *args):
        self.name, self.fn, self.args = name, fn, args
        self.best = float("inf")

    def warm(self):
        fence_scalar(self.fn(*self.args, jnp.uint32(999)))

    def run(self, r):
        t0 = time.time()
        for i in range(N_EXEC):
            out = self.fn(*self.args, jnp.uint32(1000 + 16 * i))
        fence_scalar(out)
        dt = max(time.time() - t0 - r, 1e-9) / N_EXEC
        self.best = min(self.best, dt)


def main(part: str = "all"):
    from spalign_tpu.config import LabelGenConfig, SuperpixelConfig
    from spalign_tpu.data.synthetic import SyntheticRoadScenes
    from spalign_tpu.kernels.slic import (_init_centers, _update, rgb_to_lab,
                                          slic, slic_grid_size)
    from spalign_tpu.ops.kmeans import weighted_kmeans, paint_clusters
    from spalign_tpu.ops.segments import sample_segment_anchors
    from spalign_tpu.pipeline.label_gen import (SpalignLabelGenerator,
                                                _align_and_prior,
                                                build_feature_fn,
                                                pack_mask_bits)
    from spalign_tpu.pipeline.wire import decode_yuv420, pack_yuv420

    sp = SuperpixelConfig(method="slic", n_slic_segments=100,
                          slic_iters=10, max_superpixels=256,
                          slic_enforce_connectivity=False)
    cfg = LabelGenConfig(batchsize=B, superpixel=sp, resize_shape=HW,
                         groups_per_dispatch=G, upload_format="yuv420",
                         save_masks=False)
    gen = SpalignLabelGenerator(cfg)
    n = G * B
    s_grid = slic_grid_size(*HW, sp.n_slic_segments)
    print(f"label_stage_probe: unit {G}x{B} imgs @ {HW}, yuv420 wire, "
          f"model_dtype={cfg.model_dtype}, s_grid={s_grid}, "
          f"N={N_EXEC} execs/fence x {ROUNDS} rounds", flush=True)

    # ---- realistic inputs: synthetic road scenes, one variant per exec
    ds = SyntheticRoadScenes(n=n, full_shape=(512, 1024), seed=11)
    imgs_np, _ = ds.resized_batch(range(n), HW)
    wire_np = pack_yuv420(imgs_np)
    wire = jnp.asarray(wire_np)  # device-resident once

    @jax.jit
    def perturb(w, seed):
        # flip low bits as a function of seed: new input value every
        # exec (memoizer!) at zero host cost, visually unchanged
        return jnp.bitwise_xor(w, (seed % 2).astype(jnp.uint8))

    feature_fn = build_feature_fn(gen.model, gen.variables,
                                  cfg.use_feature_maps)

    # ---- precomputed intermediates (device-resident), LAZY: each part
    # compiles only what its stages consume (compiles cost minutes
    # through the tunnel and a full set blows the run budget)
    prior_params = gen._prior_params
    need_sps = part in ("all", "a2", "b1", "b2")
    need_fm = part in ("all", "b2")
    need_feats = part in ("all", "b2")
    imgs_rgb = (jax.jit(lambda w: decode_yuv420(w, HW))(wire)
                if need_sps else None)
    sps0 = (jax.jit(jax.vmap(lambda im: slic(
        im, n_segments=sp.n_slic_segments,
        compactness=sp.slic_compactness,
        n_iter=sp.slic_iters)))(imgs_rgb) if need_sps else None)
    fm0 = jax.jit(feature_fn)(imgs_rgb) if need_fm else None

    @jax.jit
    def align_part(fm, sps, seed):
        feats, valid, prior, _ = _align_and_prior(
            fm.astype(jnp.float32), sps, jax.random.key(seed),
            cfg.align.n_anchors, s_grid, cfg.align.append_pos,
            prior_params)
        return feats, valid, prior

    feats0 = valid0 = prior0 = None
    if need_feats:
        feats0, valid0, prior0 = align_part(fm0, sps0, jnp.uint32(0))
    assign0 = None  # filled below by the kmeans stage warmup

    # ---- stage programs (scalar outputs) ----
    @jax.jit
    def st_decode(w, seed):
        return jnp.sum(decode_yuv420(perturb(w, seed), HW)
                       .astype(jnp.float32))

    @jax.jit
    def st_slic(w, seed):
        imgs = decode_yuv420(perturb(w, seed), HW)
        sps = jax.vmap(lambda im: slic(
            im, n_segments=sp.n_slic_segments,
            compactness=sp.slic_compactness, n_iter=sp.slic_iters))(imgs)
        return jnp.sum(sps)

    @jax.jit
    def st_slic1(w, seed):
        imgs = decode_yuv420(perturb(w, seed), HW)
        sps = jax.vmap(lambda im: slic(
            im, n_segments=sp.n_slic_segments,
            compactness=sp.slic_compactness, n_iter=1))(imgs)
        return jnp.sum(sps)

    @jax.jit
    def st_drn(w, seed):
        imgs = decode_yuv420(perturb(w, seed), HW)
        return jnp.sum(feature_fn(imgs).astype(jnp.float32))

    @jax.jit
    def st_anchors(sps, seed):
        ayx, av = jax.vmap(lambda s, k: sample_segment_anchors(
            s, k, cfg.align.n_anchors, s_grid)
        )(sps, jax.random.split(jax.random.key(seed), n))
        return jnp.sum(ayx) + jnp.sum(av)

    @jax.jit
    def st_align(fm, sps, seed):
        feats, valid, prior = align_part(fm, sps, seed)[:3]
        return (jnp.sum(feats) + jnp.sum(valid) + jnp.sum(prior))

    @jax.jit
    def st_kmeans(feats, prior, valid, seed):
        def group(f, p, v, s):
            res = weighted_kmeans(
                f.reshape(B * s_grid, -1), p.reshape(-1), v.reshape(-1),
                jax.random.key(s), k=cfg.kmeans.n_clusters,
                n_iter=cfg.kmeans.n_iter)
            return res.assignment, res.n_iter

        seeds = seed + jnp.arange(G, dtype=jnp.uint32)
        a, ni = jax.vmap(group)(
            feats.reshape(G, B, s_grid, -1),
            prior.reshape(G, B, s_grid),
            valid.reshape(G, B, s_grid), seeds)
        return jnp.sum(a) + jnp.sum(ni) * 100000

    @jax.jit
    def st_paint(sps, assign, seed):
        cm = paint_clusters(sps, assign + (seed % 2).astype(jnp.int32) * 0,
                            max_id=cfg.kmeans.n_clusters)
        return jnp.sum(pack_mask_bits(cm == 0).astype(jnp.int32))

    # assignments for the paint stage
    def _km_assign():
        if part not in ("all", "b2"):
            return None
        def group(f, p, v, s):
            return weighted_kmeans(
                f.reshape(B * s_grid, -1), p.reshape(-1), v.reshape(-1),
                jax.random.key(s), k=cfg.kmeans.n_clusters,
                n_iter=cfg.kmeans.n_iter).assignment.reshape(B, s_grid)

        seeds = jnp.arange(G, dtype=jnp.uint32)
        return jax.jit(jax.vmap(group))(
            feats0.reshape(G, B, s_grid, -1),
            prior0.reshape(G, B, s_grid),
            valid0.reshape(G, B, s_grid), seeds).reshape(n, s_grid)

    assign0 = _km_assign()

    # candidate optimization: bf16 distance sweep inside SLIC (halves
    # the dominant (HW, K) materialization) — inline copy of the dense
    # assign/update loop with d2 in bf16
    centers_np, step, gy, gx = _init_centers(*HW, sp.n_slic_segments)
    k = centers_np.shape[0]

    def slic_bf16(image):
        h, w = HW
        img01 = image.astype(jnp.float32) / 255.0
        lab = rgb_to_lab(img01)
        yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        pix = jnp.concatenate(
            [lab.reshape(-1, 3),
             jnp.stack([yy.reshape(-1), xx.reshape(-1)], -1)], -1)
        cy = jnp.asarray(centers_np[:, 0])
        cx = jnp.asarray(centers_np[:, 1])
        c_lab = lab[jnp.clip(cy.astype(jnp.int32), 0, h - 1),
                    jnp.clip(cx.astype(jnp.int32), 0, w - 1)]
        centers = jnp.concatenate([c_lab, jnp.stack([cy, cx], -1)], -1)
        ratio2 = (sp.slic_compactness / step) ** 2
        scale = jnp.asarray([1, 1, 1, ratio2 ** 0.5, ratio2 ** 0.5],
                            jnp.float32)
        own_i = jnp.clip((yy * gy / h).astype(jnp.int32), 0, gy - 1)
        own_j = jnp.clip((xx * gx / w).astype(jnp.int32), 0, gx - 1)
        own_cell = (own_i * gx + own_j).reshape(-1)

        def assign(centers):
            ps = (pix * scale[None, :]).astype(jnp.bfloat16)
            cs = (centers * scale[None, :]).astype(jnp.bfloat16)
            d2 = (jnp.sum(ps * ps, -1, keepdims=True)
                  - 2.0 * (ps @ cs.T)
                  + jnp.sum(cs * cs, -1)[None, :])
            dy = jnp.abs(pix[:, 3:4] - centers[None, :, 3])
            dx = jnp.abs(pix[:, 4:5] - centers[None, :, 4])
            in_win = (dy <= 2.0 * step) & (dx <= 2.0 * step)
            big = jnp.asarray(jnp.inf, jnp.bfloat16)
            sel = jnp.argmin(jnp.where(in_win, d2, big), axis=-1)
            return jnp.where(jnp.any(in_win, axis=1), sel,
                             own_cell).astype(jnp.int32)

        def body(_, carry):
            return _update(pix, assign(carry), carry, k, h * w)

        centers = jax.lax.fori_loop(0, sp.slic_iters, body, centers)
        return assign(centers).reshape(h, w)

    @jax.jit
    def st_slic_bf16(w, seed):
        imgs = decode_yuv420(perturb(w, seed), HW)
        return jnp.sum(jax.vmap(slic_bf16)(imgs))

    # the REAL fused program, scalar-fenced and with the packed-mask
    # fetch separated out: fused_scalar isolates device time; the bench
    # fetches ~1 MB of packed masks per unit on top
    prog = gen._fused_program()

    def fused_packed(w, seed):
        seeds = seed + jnp.arange(G, dtype=jnp.uint32)
        out = prog(perturb(w, seed), seeds,
                   np.int32(cfg.kmeans.n_clusters))
        return out[1]  # packed masks (n, 224, 28) uint8

    @jax.jit
    def st_fused_scalar(w, seed):
        imgs = decode_yuv420(perturb(w, seed), HW)
        sps = jax.vmap(lambda im: slic(
            im, n_segments=sp.n_slic_segments,
            compactness=sp.slic_compactness, n_iter=sp.slic_iters))(imgs)
        fmaps = feature_fn(imgs)
        seeds = seed + jnp.arange(G, dtype=jnp.uint32)
        road, cluster, assign, res, ok = gen._group_cluster(
            fmaps, sps, seeds, np.int32(cfg.kmeans.n_clusters), s_grid)
        return (jnp.sum(pack_mask_bits(road).astype(jnp.int32))
                + jnp.sum(assign) + jnp.sum(res.n_iter))

    # ---- part "d": superpixel-resolution downscale A/B (d=1 vs d=2
    # fused programs, interleaved in THIS process — the only valid A/B
    # on the drifting tunnel).  st_fused_scalar above IS the d=1 side;
    # build the d=2 generator sharing the same weights.
    st_fused_d2 = None
    if part in ("all", "d"):
        import dataclasses

        cfg_d2 = dataclasses.replace(
            cfg, superpixel=dataclasses.replace(
                sp, slic_device_downscale=2))
        gen2 = SpalignLabelGenerator(cfg_d2, variables=gen.variables)
        prog2 = gen2._fused_program()

        @jax.jit
        def st_fused_d2(w, seed):
            seeds = seed + jnp.arange(G, dtype=jnp.uint32)
            out = prog2(perturb(w, seed), seeds,
                        np.int32(cfg.kmeans.n_clusters))
            # out[1] is the packed mask (at 1/d res) — scalar-fence it
            return jnp.sum(out[1].astype(jnp.int32)) + jnp.sum(out[3])

        @jax.jit
        def st_slic_d2(w, seed):
            imgs = decode_yuv420(perturb(w, seed), HW)
            h2, w2 = HW[0] // 2, HW[1] // 2
            imgs_sp = imgs.astype(jnp.float32).reshape(
                n, h2, 2, w2, 2, 3).mean(axis=(2, 4))
            sps = jax.vmap(lambda im: slic(
                im, n_segments=sp.n_slic_segments,
                compactness=sp.slic_compactness,
                n_iter=sp.slic_iters))(imgs_sp)
            return jnp.sum(sps)

    all_stages = [
        ("a", Stage("wire decode (yuv420)", st_decode, wire)),
        ("a", Stage("SLIC x10 (dense f32 sweep)", st_slic, wire)),
        ("a", Stage("SLIC x1 iter", st_slic1, wire)),
        ("a", Stage("SLIC x10 (bf16 d2 sweep)", st_slic_bf16, wire)),
        ("b1", Stage("DRN bf16 features", st_drn, wire)),
        ("b1", Stage("anchor sample (sort)", st_anchors, sps0)),
        ("b2", Stage("align+prior (incl anchors)", st_align, fm0, sps0)),
        ("b2", Stage("joint kmeans (G groups)", st_kmeans, feats0,
                     prior0, valid0)),
        ("b2", Stage("paint+pack", st_paint, sps0, assign0)),
        ("c", Stage("FUSED scalar-fenced", st_fused_scalar, wire)),
    ]
    if st_fused_d2 is not None:
        # interleaved d=1 vs d=2 A/B (docs/label_profile.md §4); under
        # part="d" the d=1 SLIC/fused rows are duplicated here so the
        # A/B is self-contained in one process ("all" already has them)
        all_stages += [
            ("d", Stage("SLIC x10 d=1", st_slic, wire)),
            (part, Stage("SLIC x10 d=2 (half-res)", st_slic_d2, wire)),
            ("d", Stage("FUSED scalar-fenced d=1", st_fused_scalar,
                        wire)),
            (part, Stage("FUSED scalar-fenced d=2", st_fused_d2, wire)),
        ]
    stages = [s for p, s in all_stages if part in ("all", p)]
    measure_fetch = part in ("all", "c")
    measure_fetch_d2 = st_fused_d2 is not None

    def fused_packed_d2(w, seed):
        seeds = seed + jnp.arange(G, dtype=jnp.uint32)
        return prog2(perturb(w, seed), seeds,
                     np.int32(cfg.kmeans.n_clusters))[1]

    print("warming (compiles)...", flush=True)
    for s in stages:
        t0 = time.time()
        s.warm()
        print(f"  {s.name:<30} compiled in {time.time() - t0:.1f}s",
              flush=True)
    # fused program with real packed fetch (bench configuration)
    fused_fetch_best = float("inf")
    fused_fetch_d2_best = float("inf")
    if measure_fetch:
        np.asarray(fused_packed(wire, jnp.uint32(998)))
    if measure_fetch_d2:
        np.asarray(fused_packed_d2(wire, jnp.uint32(997)))

    for rd in range(ROUNDS):
        r = rtt()
        print(f"round {rd}: rtt {r * 1e3:.0f} ms", flush=True)
        for s in stages:
            s.run(r)
            print(f"    {s.name:<30} {s.best * 1e3:8.1f} ms/unit",
                  flush=True)
        if measure_fetch:
            # fused with fetch: time ONE dispatch+full packed fetch
            t0 = time.time()
            out = fused_packed(wire, jnp.uint32(2000 + rd))
            np.asarray(out)
            fused_fetch_best = min(fused_fetch_best, time.time() - t0)
        if measure_fetch_d2:
            t0 = time.time()
            out = fused_packed_d2(wire, jnp.uint32(3000 + rd))
            np.asarray(out)
            fused_fetch_d2_best = min(fused_fetch_d2_best,
                                      time.time() - t0)

    print(f"\n=== per-stage device time ({G}x{B} imgs/unit) ===")
    for s in stages:
        print(f"  {s.name:<30} {s.best * 1e3:8.1f} ms/unit "
              f"({n / s.best:6.0f} img/s-bound)")
    if measure_fetch:
        print(f"  {'fused + packed fetch (1 unit)':<30} "
              f"{fused_fetch_best * 1e3:8.1f} ms incl. downlink")
    if measure_fetch_d2:
        print(f"  {'fused d2 + packed fetch':<30} "
              f"{fused_fetch_d2_best * 1e3:8.1f} ms incl. downlink")


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "all")
