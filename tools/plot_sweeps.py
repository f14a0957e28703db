"""Render the fig-7/8/9 ablation grids (results/sweeps/*.csv) as PNGs.

One single-series line chart per grid (mean Road IoU vs the swept
parameter), mirroring the paper's Fig 7/8/9 axes; the CSVs come from
`python -m spalign_tpu.cli.sweep --grid fig{7,8,9}` (reference
utils/dmux/run_exp_fig-{7,8,9}.sh + calc_mean_proposed.py:43-63).

Run: PYTHONPATH=/root/repo python tools/plot_sweeps.py [results/sweeps]
"""

import csv
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

LABELS = {
    "fig7": ("number of clusters k", "fig 7: k sweep"),
    "fig8": ("clustering batch size", "fig 8: batch-size sweep"),
    "fig9": ("felzenszwalb scale", "fig 9: superpixel-scale sweep"),
}


def plot_one(csv_path: str, out_path: str, xlabel: str, title: str):
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    param = list(rows[0].keys())[0]
    xs = [float(r[param]) for r in rows]
    ys = [float(r["road_mean_iou"]) for r in rows]

    fig, ax = plt.subplots(figsize=(5.2, 3.4), dpi=150)
    ax.plot(xs, ys, color="#30507c", linewidth=2, marker="o",
            markersize=5)
    best = max(range(len(xs)), key=lambda i: ys[i])
    ax.annotate(f"{ys[best]:.3f}", (xs[best], ys[best]),
                textcoords="offset points", xytext=(0, 8),
                ha="center", fontsize=8, color="#444444")
    ax.set_xlabel(xlabel, fontsize=9, color="#444444")
    ax.set_ylabel("mean Road IoU", fontsize=9, color="#444444")
    ax.set_title(title, fontsize=10, loc="left")
    ax.grid(True, color="#e3e3e3", linewidth=0.6)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#bbbbbb")
    ax.tick_params(colors="#666666", labelsize=8)
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    print(f"wrote {out_path}")


def main(sweep_dir: str = "results/sweeps"):
    for fig, (xlabel, title) in LABELS.items():
        p = os.path.join(sweep_dir, f"{fig}.csv")
        if os.path.exists(p):
            plot_one(p, os.path.join(sweep_dir, f"{fig}.png"),
                     xlabel, title)
        else:
            print(f"skip {p} (not found)")


if __name__ == "__main__":
    main(*sys.argv[1:])
