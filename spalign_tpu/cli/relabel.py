"""Standalone relabel CLI: generate pseudo-labels from a trained snapshot
(replaces labels_from_segnet.py)."""

from __future__ import annotations

import argparse
import json
import os


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--param_dir", type=str, required=True,
                   help="training result dir (reads its args.txt)")
    p.add_argument("--iteration", type=int, default=None,
                   help="snapshot iteration; latest if omitted")
    p.add_argument("--img_zip_fn", type=str, required=True)
    p.add_argument("--label_zip_fn", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--soft_label", action="store_true", default=False)
    p.add_argument("--eval_shape", type=int, nargs=2,
                   default=[1024, 2048])
    p.add_argument("--batchsize", type=int, default=8)
    p.add_argument("--score_dtype", default="float32",
                   choices=["float32", "float16"],
                   help="on-disk dtype for soft-label scores (float16 "
                        "halves the output zip)")
    p.add_argument("--score_store", default="eval",
                   choices=["eval", "network"],
                   help="resolution of stored *_scores members: 'eval' "
                        "= reference disk format (scores bilinearly "
                        "upsampled to eval_shape, labels_from_segnet.py"
                        ":91-95); 'network' keeps the network output "
                        "resolution (same information, ~2x faster pass "
                        "and 4x smaller zip; the training reader "
                        "resizes either to the input shape)")
    p.add_argument("--save_panels", action="store_true", default=False,
                   help="write the 1x3 overlay/GT/prediction panel per "
                        "image (reference labels_from_segnet.py:97-119)")
    p.add_argument("--save_each", action="store_true", default=False,
                   help="per-image .npy outputs in out_dir instead of "
                        "one zip (reference run_train_rounds.py:36; its "
                        "pred-as-scores bug is NOT reproduced)")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)

    from spalign_tpu.data.cityscapes import ZippedCityscapesRoadDataset
    from spalign_tpu.models import SegNet, SegNetBasic
    from spalign_tpu.selftrain.relabel import relabel_dataset
    from spalign_tpu.train.checkpoints import (find_snapshot,
                                               load_predictor)

    train_args = json.load(open(os.path.join(args.param_dir, "args.txt")))
    model = (SegNetBasic(n_class=2) if train_args.get("model") == "basic"
             else SegNet(n_class=2))
    snapshot = find_snapshot(args.param_dir, args.iteration)
    variables = load_predictor(snapshot)
    print(f"loaded {snapshot}")

    dataset = ZippedCityscapesRoadDataset(
        args.img_zip_fn, args.label_zip_fn,
        tuple(train_args.get("input_shape", [512, 1024])))

    import numpy as np

    out_zip = os.path.join(args.out_dir.rstrip("/") + ".0.zip")
    records = relabel_dataset(
        model, variables, dataset, out_zip,
        eval_shape=tuple(args.eval_shape), batch_size=args.batchsize,
        soft_label=args.soft_label, out_dir=args.out_dir,
        score_dtype=getattr(np, args.score_dtype),
        score_store=args.score_store,
        save_panels=args.save_panels, save_each=args.save_each)
    print(f"wrote {len(records)} predictions to "
          f"{args.out_dir if args.save_each else out_zip}")


if __name__ == "__main__":
    main()
