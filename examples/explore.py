"""Stage-by-stage exploration of the superpixel-align pipeline.

The analog of the reference's `notebooks/Superpixel_Align.ipynb`: look at
every intermediate artifact of the label-generation pipeline on one
synthetic scene — input, superpixel boundaries, the Gaussian road prior
(pixel- and superpixel-level), the joint k-means cluster map, and the
final road mask — written as PNG figures instead of notebook cells, so
it runs anywhere (CPU included) with no jupyter dependency.

Run:  python examples/explore.py [--cpu] [--out_dir DIR]
"""

import argparse
import os
import sys

# runnable straight from a clone: python examples/explore.py
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
parser.add_argument("--out_dir", default="results/explore")
parser.add_argument("--seed", type=int, default=21)
args = parser.parse_args()

if args.cpu:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from spalign_tpu.config import LabelGenConfig, SuperpixelConfig  # noqa
from spalign_tpu.data.labels import create_label_mask  # noqa: E402
from spalign_tpu.data.synthetic import SyntheticRoadScenes  # noqa: E402
from spalign_tpu.ops.prior import pixel_prior  # noqa: E402
from spalign_tpu.ops.segments import segment_mean  # noqa: E402
from spalign_tpu.pipeline.label_gen import SpalignLabelGenerator  # noqa
from spalign_tpu.utils.timers import StageTimer  # noqa: E402

os.makedirs(args.out_dir, exist_ok=True)
B = 4
cfg = LabelGenConfig(
    batchsize=B, resize_shape=(224, 224),
    superpixel=SuperpixelConfig(method="slic", n_slic_segments=100,
                                slic_iters=10, max_superpixels=256),
    save_masks=False)
scenes = SyntheticRoadScenes(n=B, full_shape=(512, 1024), seed=args.seed)
imgs, labels = scenes.resized_batch(range(B), cfg.resize_shape)

gen = SpalignLabelGenerator(cfg)
timers = StageTimer()
prepared = gen._host_prepare(imgs, None, timers)
handles = gen.dispatch_batch(prepared, timers)
road, cluster, diag = gen.finish_batch(prepared, handles, timers)
road = np.asarray(road)
cluster = np.asarray(cluster)
sps = np.asarray(prepared["sps_host"]) if "sps_host" in prepared else None
if sps is None:
    # fused-superpixel mode keeps the maps on device; recompute for show
    from spalign_tpu.kernels.slic import slic

    sps = np.asarray(jax.vmap(lambda im: slic(
        im, n_segments=cfg.superpixel.n_slic_segments,
        n_iter=cfg.superpixel.slic_iters))(imgs))

h, w = cfg.resize_shape
prior_pix = np.asarray(pixel_prior(h, w, 0.75, 0.5, 0.1, 0.1))

for b in range(B):
    sp = sps[b]
    boundaries = np.zeros_like(sp, bool)
    boundaries[:-1] |= sp[:-1] != sp[1:]
    boundaries[:, :-1] |= sp[:, :-1] != sp[:, 1:]
    sp_prior = np.asarray(segment_mean(
        jax.numpy.asarray(prior_pix.reshape(-1)),
        jax.numpy.asarray(sp.reshape(-1)),
        int(sp.max()) + 1))

    fig, axes = plt.subplots(2, 3, figsize=(13, 7))
    over = imgs[b].copy()
    over[boundaries] = (255, 255, 0)
    for ax, im, title, kw in [
            (axes[0, 0], imgs[b], "input (224x224)", {}),
            (axes[0, 1], over, f"SLIC superpixels (n={sp.max() + 1})", {}),
            (axes[0, 2], prior_pix, "pixel Gaussian road prior",
             dict(cmap="viridis")),
            (axes[1, 0], sp_prior[sp], "per-superpixel prior",
             dict(cmap="viridis")),
            (axes[1, 1], cluster[b], f"joint k-means clusters "
             f"(iters={diag['kmeans_iters']})", dict(cmap="tab10",
                                                     vmin=0, vmax=9)),
            (axes[1, 2], road[b], "road mask (cluster 0)",
             dict(cmap="gray"))]:
        ax.imshow(im, **kw)
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    gt = create_label_mask(labels[b])
    fig.suptitle(
        f"superpixel-align stages — scene {b} "
        f"(GT road fraction {float((gt == 1).mean()):.2f})")
    fig.tight_layout()
    out = os.path.join(args.out_dir, f"stages_{b}.png")
    fig.savefig(out, dpi=110)
    plt.close(fig)
    print(f"wrote {out}")

print(f"stage times: { {k: round(v, 3) for k, v in timers.finish().items()} }")
