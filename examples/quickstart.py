"""spalign_tpu quickstart — the whole system on synthetic data.

The analog of the reference's exploration notebooks
(notebooks/Superpixel_Align.ipynb etc.), runnable anywhere:

  1. generate a synthetic Cityscapes-like dataset,
  2. pseudo-label it with the superpixel-align pipeline,
  3. self-train a SegNetBasic on the pseudo-labels for 2 rounds,
  4. report metrics.

Run:  python examples/quickstart.py [--cpu]
"""

import argparse
import os
import sys
import tempfile

# runnable straight from a clone: python examples/quickstart.py
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (8 virtual devices)")
parser.add_argument("--workdir", default=None)
args = parser.parse_args()

if args.cpu:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from spalign_tpu.config import (LabelGenConfig, RoundsConfig,  # noqa: E402
                                SuperpixelConfig, TrainConfig)
from spalign_tpu.data.cityscapes import (CITYSCAPES_MEAN,  # noqa: E402
                                         CITYSCAPES_STD)
from spalign_tpu.data.estimated import EstimatedCityscapesDataset  # noqa
from spalign_tpu.data.synthetic import SyntheticRoadScenes  # noqa: E402
from spalign_tpu.eval.results import aggregate_results  # noqa: E402
from spalign_tpu.pipeline.direct import make_label_generator  # noqa: E402
from spalign_tpu.selftrain import RoundsDriver  # noqa: E402

workdir = args.workdir or tempfile.mkdtemp(prefix="spalign_quickstart_")
print(f"workdir: {workdir}")
HW = (64, 128)  # training resolution for the demo
FULL = (128, 256)
N = 8

# -- 1. data ---------------------------------------------------------------
scenes = SyntheticRoadScenes(n=N, full_shape=FULL, seed=42)

# -- 2. pseudo-labels via superpixel-align ----------------------------------
cfg = LabelGenConfig(
    batchsize=N, resize_shape=(112, 112),
    superpixel=SuperpixelConfig(method="slic", n_slic_segments=60,
                                slic_iters=5, max_superpixels=256),
    out_dir=os.path.join(workdir, "labels"), save_masks=True)
gen = make_label_generator(cfg)
records = gen.process_dataset(scenes)
agg = aggregate_results(records)
print(f"pseudo-labels: road IoU {agg['road_mean_iou']:.3f} "
      f"P {agg['precision']:.3f} R {agg['recall']:.3f} "
      f"(random-init DRN; pass --weights for real quality)")

# -- 3. self-train a SegNet on them ------------------------------------------
import cv2  # noqa: E402

img_dir = os.path.join(workdir, "imgs")
os.makedirs(img_dir, exist_ok=True)
for i in range(N):
    img, _ = scenes[i]
    base = os.path.splitext(scenes.image_name(i))[0]
    cv2.imwrite(os.path.join(img_dir, base + ".png"), img[:, :, ::-1])


class RelabelView:
    def __len__(self):
        return N

    def image_name(self, i):
        return scenes.image_name(i)

    def __getitem__(self, i):
        img, lab = scenes[i]
        im = cv2.resize(img, (HW[1], HW[0]),
                        interpolation=cv2.INTER_CUBIC).astype(np.float32)
        im = (im - CITYSCAPES_MEAN) / CITYSCAPES_STD
        return im, (lab == 7).astype(np.int32)


rounds = RoundsDriver(
    RoundsConfig(n_round=2, iteration=20, val_iteration=20, batchsize=4,
                 loss="ce", result_base_dir=os.path.join(workdir, "rounds"),
                 eval_shape=FULL),
    TrainConfig(model="basic", optimizer="Adam", input_shape=HW,
                eval_shape=FULL),
    make_train_dataset=lambda src, use_soft: EstimatedCityscapesDataset(
        img_dir, src or cfg.out_dir, HW, use_soft_label=use_soft),
    make_relabel_dataset=lambda: RelabelView())
final_dir, final_zip = rounds.run()
print(f"self-training done: {final_dir}")
print(f"round-2 labels: {final_zip}")

# -- 4. evaluate the final student -------------------------------------------
from spalign_tpu.eval.results import read_results  # noqa: E402

recs = read_results(os.path.join(
    final_dir, "iter-40_eval-train", "result.json"))
agg = aggregate_results(recs)
print(f"student after 2 rounds: road IoU {agg['road_mean_iou']:.3f} "
      f"P {agg['precision']:.3f} R {agg['recall']:.3f}")
