"""Shared CLI plumbing: dataset construction + weight loading."""

from __future__ import annotations

import argparse



def add_dataset_args(p: argparse.ArgumentParser):
    p.add_argument("--cityscapes_img_zip", type=str, default=None)
    p.add_argument("--cityscapes_label_zip", type=str, default=None)
    p.add_argument("--img_file_list", type=str, default=None)
    p.add_argument("--label_file_list", type=str, default=None)
    p.add_argument("--cityscapes_dir", type=str, default=None,
                   help="root with leftImg8bit/ + gtFine/")
    p.add_argument("--split", type=str, default="val")
    p.add_argument("--synthetic", type=int, default=None,
                   help="use N procedural road scenes (no real data)")
    p.add_argument("--synthetic_shape", type=int, nargs=2,
                   default=[1024, 2048])
    p.add_argument("--synthetic_seed", type=int, default=0)


def build_label_dataset(args, resize_shape):
    """Dataset for label generation: raw uint8 images + full-res labels
    (mirrors batch_spalign_kmeans.create_dataset precedence :486-521)."""
    from spalign_tpu.data.cityscapes import (CityscapesRoadDataset,
                                             FileListDataset,
                                             ZippedCityscapesRoadDataset)
    from spalign_tpu.data.synthetic import SyntheticRoadScenes

    if args.synthetic is not None:
        return SyntheticRoadScenes(n=args.synthetic,
                                   full_shape=tuple(args.synthetic_shape),
                                   seed=args.synthetic_seed)
    if args.cityscapes_img_zip and args.cityscapes_label_zip:
        return ZippedCityscapesRoadDataset(
            args.cityscapes_img_zip, args.cityscapes_label_zip,
            resize_shape, standardize=False)
    if args.img_file_list:
        return FileListDataset(args.img_file_list, args.label_file_list,
                               resize_shape, standardize=False)
    if args.cityscapes_dir:
        return CityscapesRoadDataset(args.cityscapes_dir, resize_shape,
                                     split=args.split, standardize=False)
    raise SystemExit("no dataset source given (see --help); for a "
                     "data-free demo pass --synthetic N")


def load_drn_weights(args):
    """--weights accepts a torch .pth (converted on the fly) or a saved
    pytree; None -> randomly initialized (documented: real label quality
    requires the pretrained DRN checkpoint)."""
    if not getattr(args, "weights", None):
        return None
    path = args.weights
    if path.endswith(".pth"):
        from spalign_tpu.convert import load_drn_checkpoint

        _, variables = load_drn_checkpoint(path, args.model)
        return variables
    from spalign_tpu.convert import load_pytree

    return load_pytree(path)
