"""Felzenszwalb native-op probe: per-image latency + per-stage profile.

Measures the C++ op (native/felzenszwalb.cpp) on realistic synthetic
road scenes at the label-gen shape (224x224, scale=300 sigma=0.8
min_size=20 — the reference's headline config,
batch_spalign_kmeans.py:299-313 / create_val_labels.sh:17).

Usage:
  python tools/felz_probe.py [--n 16] [--hw 224] [--stages] [--mp2]

--stages sets SPALIGN_FELZ_TIMING=1 so the op prints per-stage
microseconds to stderr for each call (one representative call only).
--mp2 measures the 2 MP overlaps shape (1024x2048) as well.

All timing is pure host CPU — no TPU/tunnel involvement, so numbers are
stable; best-of-N per image, medians reported.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--mp2", action="store_true")
    args = ap.parse_args()

    if args.stages:
        os.environ["SPALIGN_FELZ_TIMING"] = "1"

    import numpy as np

    from spalign_tpu.data.synthetic import SyntheticRoadScenes
    from spalign_tpu import native

    assert native.get_lib() is not None, "native build failed"

    shapes = [(args.hw, args.hw)]
    if args.mp2:
        shapes.append((1024, 2048))

    ds = SyntheticRoadScenes(n=args.n, full_shape=(1024, 2048), seed=0)

    for hw in shapes:
        imgs = ds.resized_batch(list(range(args.n)), hw)[0]
        # label-gen convention: float32 in [0,1] (pipeline/label_gen.py)
        imgs = imgs.astype(np.float32) / 255.0

        if args.stages:
            # one representative stage-profiled call (median image)
            print(f"--- stages @ {hw} ---", flush=True)
            native.felzenszwalb(imgs[0], scale=300.0, sigma=0.8, min_size=20)

        per_img = []
        segs = []
        for i in range(args.n):
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                lab = native.felzenszwalb(
                    imgs[i], scale=300.0, sigma=0.8, min_size=20)
                best = min(best, time.perf_counter() - t0)
            per_img.append(best * 1e3)
            segs.append(int(lab.max()) + 1)
        med = statistics.median(per_img)
        print(f"felz @ {hw[0]}x{hw[1]}: median {med:.2f} ms/img "
              f"(min {min(per_img):.2f}, max {max(per_img):.2f}), "
              f"segments median {statistics.median(segs):.0f}")


if __name__ == "__main__":
    main()
