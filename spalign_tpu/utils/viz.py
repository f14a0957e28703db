"""Diagnostic visualization (matplotlib, host-side, off the hot path).

Reference: the 2x2 panel per image written by batch_spalign_kmeans.py
save_image (:361-387) — estimated mask overlay, GT mask, all clusters,
road mask — and the 1x3 panel of labels_from_segnet.py (:97-119).
"""

from __future__ import annotations

import os

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def save_diagnostic_panel(out_dir, img_fn, img, road_mask, cluster_map,
                          label=None):
    """2x2 panel: overlay / GT / clusters / road mask."""
    plt = _plt()
    img = np.asarray(img)
    if road_mask.shape != img.shape[:2]:
        import cv2

        size = (img.shape[1], img.shape[0])
        road_mask = cv2.resize(road_mask.astype(np.uint8), size,
                               interpolation=cv2.INTER_NEAREST)
        cluster_map = cv2.resize(cluster_map.astype(np.uint8), size,
                                 interpolation=cv2.INTER_NEAREST)
    fig, axes = plt.subplots(2, 2)
    fig.set_dpi(150)
    for ax in axes.ravel():
        ax.axis("off")
    img = np.asarray(img)
    axes[0, 0].imshow(img / 255.0)
    axes[0, 0].imshow(road_mask, alpha=0.4, cmap="Set1_r")
    axes[0, 0].set_title("Estimated road mask (overlay)", fontsize=8)
    if label is not None:
        axes[0, 1].imshow(label == 1)
        axes[0, 1].set_title("Ground truth road mask", fontsize=8)
    axes[1, 0].imshow(cluster_map)
    axes[1, 0].set_title("All clusters", fontsize=8)
    axes[1, 1].imshow(road_mask)
    axes[1, 1].set_title("Estimated road mask", fontsize=8)
    os.makedirs(out_dir, exist_ok=True)
    fig.savefig(os.path.join(out_dir, os.path.basename(img_fn)),
                bbox_inches="tight")
    plt.close(fig)


def save_prediction_panel(out_dir, img_fn, img, pred, label=None):
    """1x3 panel: overlay / GT / prediction (labels_from_segnet style)."""
    plt = _plt()
    fig, axes = plt.subplots(1, 3)
    fig.set_dpi(150)
    for ax in axes.ravel():
        ax.axis("off")
    axes[0].imshow(np.asarray(img) / 255.0)
    axes[0].imshow(pred, alpha=0.4, cmap="Set1_r")
    axes[0].set_title("Estimated road mask (overlay)", fontsize=6)
    if label is not None:
        axes[1].imshow(label == 1)
        axes[1].set_title("Ground truth road mask", fontsize=6)
    axes[2].imshow(pred)
    axes[2].set_title("Estimated road mask", fontsize=6)
    os.makedirs(out_dir, exist_ok=True)
    fig.savefig(os.path.join(out_dir, os.path.basename(img_fn)),
                bbox_inches="tight")
    plt.close(fig)
