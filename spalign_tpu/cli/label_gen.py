"""Label-generation CLI — one tool, three modes.

Replaces batch_spalign_kmeans.py, direct_clustering.py,
superpixel_overlaps.py and utils/apply_spalign_kmeans.py (flag surface
mirrors batch_spalign_kmeans.py:38-108).

Example (data-free demo):
  python -m spalign_tpu.cli.label_gen --synthetic 30 --superpixel_method \
      slic --out_dir results/demo_labels
"""

from __future__ import annotations

import argparse

from spalign_tpu.cli.common import (add_dataset_args, build_label_dataset,
                                    load_drn_weights)
from spalign_tpu.config import (AlignConfig, KMeansConfig, LabelGenConfig,
                                PriorConfig, SuperpixelConfig)
from spalign_tpu.eval.results import read_results, write_summary


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="spalign",
                   choices=["spalign", "direct", "overlaps"])
    p.add_argument("--model", default="drn_c_26")
    p.add_argument("--weights", type=str, default=None,
                   help=".pth donor checkpoint or converted pytree")
    p.add_argument("--superpixel_method", default="felzenszwalb",
                   choices=["felzenszwalb", "slic"])
    p.add_argument("--n_clusters", type=int, default=4)
    p.add_argument("--y_rel_pos", type=float, default=0.75)
    p.add_argument("--x_rel_pos", type=float, default=0.5)
    p.add_argument("--y_rel_sigma", type=float, default=0.1)
    p.add_argument("--x_rel_sigma", type=float, default=0.1)
    p.add_argument("--n_anchors", type=int, default=10)
    p.add_argument("--n_neighbors", type=int, default=4)
    p.add_argument("--without_pos", action="store_true", default=False)
    p.add_argument("--resize_shape", type=int, nargs=2, default=[224, 224])
    p.add_argument("--batchsize", type=int, default=30)
    p.add_argument("--felzenszwalb_scale", type=float, default=300.0)
    p.add_argument("--felzenszwalb_sigma", type=float, default=0.8)
    p.add_argument("--felzenszwalb_min_size", type=int, default=20)
    p.add_argument("--n_slic_segments", type=int, default=100)
    p.add_argument("--slic_no_connectivity", action="store_true",
                   default=False,
                   help="TPU-native fast path: skip the skimage-parity "
                        "connectivity pass and fuse SLIC into the device "
                        "program (one dispatch per batch; see PARITY.md "
                        "'SLIC connectivity modes')")
    p.add_argument("--slic_device_downscale", type=int, default=1,
                   help="device-SLIC frontends only: compute the "
                        "superpixel map at 1/d scale (overlaps mode: "
                        "d=2 quarters the full-frame upload, its "
                        "binding cost; fused spalign: d=2 cuts the "
                        "HBM-bound SLIC sweep ~4x, 887 -> 1576 img/s "
                        "device-bound, docs/label_profile.md; "
                        "documented deviation, quality-gated)")
    p.add_argument("--max_superpixels", type=int, default=1024)
    p.add_argument("--groups_per_dispatch", type=int, default=1,
                   help="independent clustering batches fused into one "
                        "device dispatch (amortizes the fixed per-"
                        "dispatch round-trip tax on remote-attached "
                        "TPUs; per-group results are bit-identical to "
                        "separate dispatches)")
    p.add_argument("--overlap_threshold", type=float, default=0.01)
    p.add_argument("--use_feature_maps", type=int, nargs="*", default=[7])
    p.add_argument("--out_dir", type=str, default="results/labels")
    p.add_argument("--start_index", type=int, default=0)
    p.add_argument("--end_index", type=int, default=None)
    p.add_argument("--seed", type=int, default=1111)
    p.add_argument("--kmeans_init", default="device",
                   choices=["device", "reference"],
                   help="'reference' replays the reference's exact "
                        "numpy seed-1111 k-means init stream (bit-parity "
                        "mode; slower)")
    p.add_argument("--save_images", action="store_true", default=False)
    p.add_argument("--no_save_masks", action="store_true", default=False)
    p.add_argument("--model_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="feature-extractor compute dtype (default "
                        "bfloat16: 2x MXU rate, quality-gated; parity "
                        "init pins float32 regardless)")
    p.add_argument("--upload_format", default="rgb8",
                   choices=["rgb8", "yuv420"],
                   help="image-uplink wire format (pipeline/wire.py): "
                        "yuv420 halves the bytes per image on the "
                        "remote-TPU uplink (quality-gated; needs the "
                        "fused-SLIC or direct path)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of the run")
    p.add_argument("--resume", action="store_true", default=False,
                   help="skip images already present in out_dir's "
                        "result.json (crash restart)")
    add_dataset_args(p)
    return p.parse_args(argv)


def config_from_args(args) -> LabelGenConfig:
    return LabelGenConfig(
        mode=args.mode,
        resize_shape=tuple(args.resize_shape),
        batchsize=args.batchsize,
        use_feature_maps=tuple(args.use_feature_maps),
        prior=PriorConfig(args.y_rel_pos, args.x_rel_pos,
                          args.y_rel_sigma, args.x_rel_sigma),
        superpixel=SuperpixelConfig(
            method=args.superpixel_method,
            felzenszwalb_scale=args.felzenszwalb_scale,
            felzenszwalb_sigma=args.felzenszwalb_sigma,
            felzenszwalb_min_size=args.felzenszwalb_min_size,
            n_slic_segments=args.n_slic_segments,
            slic_enforce_connectivity=not args.slic_no_connectivity,
            slic_device_downscale=args.slic_device_downscale,
            max_superpixels=args.max_superpixels),
        align=AlignConfig(n_anchors=args.n_anchors,
                          n_neighbors=args.n_neighbors,
                          append_pos=not args.without_pos),
        kmeans=KMeansConfig(n_clusters=args.n_clusters, seed=args.seed,
                            init=args.kmeans_init),
        overlap_threshold=args.overlap_threshold,
        groups_per_dispatch=args.groups_per_dispatch,
        out_dir=args.out_dir,
        save_images=args.save_images,
        save_masks=not args.no_save_masks,
        model_dtype=args.model_dtype,
        upload_format=args.upload_format)


def main(argv=None):
    args = get_args(argv)
    cfg = config_from_args(args)
    dataset = build_label_dataset(args, cfg.resize_shape)
    variables = load_drn_weights(args)

    from spalign_tpu.pipeline.direct import make_label_generator

    gen = make_label_generator(cfg, variables=variables,
                               model_name=args.model, seed=args.seed)
    from spalign_tpu.utils.timers import profiler_trace

    skip_done = None
    if args.resume:
        import os

        path = os.path.join(cfg.out_dir, "result.json")
        if os.path.exists(path):
            skip_done = {r["img_fn"] for r in read_results(path)}
            print(f"[label_gen] resume: {len(skip_done)} images done")

    with profiler_trace(args.profile_dir):
        records = gen.process_dataset(dataset,
                                      start_index=args.start_index,
                                      end_index=args.end_index,
                                      skip_done=skip_done)
    scored = [r for r in records if "road_iou" in r]
    if scored:
        import os

        summary = write_summary(cfg.out_dir, read_results(
            os.path.join(cfg.out_dir, "result.json"))
            if not args.no_save_masks else scored)
        print(f"[label_gen] {cfg.mode}: n={summary['n']} "
              f"road IoU={summary['road_mean_iou']:.4f} "
              f"P={summary['precision']:.4f} R={summary['recall']:.4f}")
    else:
        print(f"[label_gen] {cfg.mode}: {len(records)} images, no GT")
    return records


if __name__ == "__main__":
    main()
