"""Demo-video CLI: predict road masks for frames with a trained SegNet
and write the overlay video (replaces utils/create_demovideo.py +
utils/create_movie.py)."""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--param_dir", type=str, required=True)
    p.add_argument("--iteration", type=int, default=None)
    p.add_argument("--frames_dir", type=str, required=True,
                   help="directory of frame .png images")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--out_video", type=str, default=None)
    p.add_argument("--input_shape", type=int, nargs=2,
                   default=[512, 1024])
    p.add_argument("--pred_shape", type=int, nargs=2,
                   default=[1024, 2048])
    p.add_argument("--batchsize", type=int, default=8)
    p.add_argument("--fps", type=int, default=30)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp

    from spalign_tpu.data.cityscapes import (CITYSCAPES_MEAN,
                                             CITYSCAPES_STD)
    from spalign_tpu.models import SegNet, SegNetBasic
    from spalign_tpu.models.segnet import predict_labels
    from spalign_tpu.train.checkpoints import (find_snapshot,
                                               load_predictor)
    from spalign_tpu.utils.video import write_overlay_video

    train_args = json.load(open(os.path.join(args.param_dir, "args.txt")))
    model = (SegNetBasic(n_class=2) if train_args.get("model") == "basic"
             else SegNet(n_class=2))
    variables = load_predictor(find_snapshot(args.param_dir,
                                             args.iteration))
    ih, iw = args.input_shape
    predict = jax.jit(lambda v, im: predict_labels(
        lambda vv, x, train: model.apply(vv, x, train=train), v, im,
        pred_shape=tuple(args.pred_shape)))

    frame_fns = sorted(glob.glob(os.path.join(args.frames_dir, "*.png")))
    os.makedirs(args.out_dir, exist_ok=True)

    def frames():
        bs = args.batchsize
        for i in range(0, len(frame_fns), bs):
            chunk = frame_fns[i: i + bs]
            raw = [cv2.imread(fn)[:, :, ::-1] for fn in chunk]
            batch = np.stack([
                (cv2.resize(im, (iw, ih),
                            interpolation=cv2.INTER_CUBIC).astype(
                    np.float32) - CITYSCAPES_MEAN) / CITYSCAPES_STD
                for im in raw])
            pad = bs - len(chunk)
            if pad:
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], pad, 0)])
            labels = np.asarray(predict(variables, jnp.asarray(batch)))
            for b, fn in enumerate(chunk):
                base = os.path.splitext(os.path.basename(fn))[0]
                np.save(os.path.join(args.out_dir, base),
                        labels[b].astype(np.uint8))
                yield raw[b], labels[b]

    out_video = args.out_video or os.path.join(args.out_dir, "demo.avi")
    n = write_overlay_video(frames(), out_video, fps=args.fps)
    print(f"wrote {n} frames to {out_video} (+ masks in {args.out_dir})")


if __name__ == "__main__":
    main()
