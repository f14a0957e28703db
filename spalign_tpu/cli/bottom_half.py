"""Trivial 'bottom half = road' baseline CLI (replaces
utils/check_bottom_half_iou.py) — the sanity lower bound for every
label-generation result."""

from __future__ import annotations

import argparse

import numpy as np

from spalign_tpu.cli.common import add_dataset_args, build_label_dataset
from spalign_tpu.data.labels import create_label_mask
from spalign_tpu.ops.metrics import segmentation_scores
from spalign_tpu.eval.results import aggregate_results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_dataset_args(p)
    p.add_argument("--n_imgs", type=int, default=None)
    args = p.parse_args(argv)

    from spalign_tpu.pipeline.label_gen import _load_batch

    dataset = build_label_dataset(args, (224, 224))
    n = len(dataset) if args.n_imgs is None else min(args.n_imgs,
                                                     len(dataset))
    records = []
    for i in range(n):
        # raw labelIds via the label-gen loading convention
        _, labels = _load_batch(dataset, [i], (224, 224))
        gt = create_label_mask(np.asarray(labels[0]))
        pred = np.zeros_like(gt)
        pred[gt.shape[0] // 2:] = 1
        rec = segmentation_scores(pred, gt)
        records.append(rec)
    agg = aggregate_results(records)
    print(f"bottom-half baseline over {n} images:")
    print(f"  road IoU  : {agg['road_mean_iou']:.4f}")
    print(f"  precision : {agg['precision']:.4f}")
    print(f"  recall    : {agg['recall']:.4f}")


if __name__ == "__main__":
    main()
