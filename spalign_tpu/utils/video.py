"""Demo-video composition (reference utils/create_movie.py): overlay
predicted road masks onto frames and write an MJPG video."""

from __future__ import annotations

import glob
import os
from typing import Iterable, Optional, Tuple

import numpy as np

ROAD_COLOR = (128, 64, 128)  # Cityscapes road RGB


def blend_road(img_rgb: np.ndarray, mask: np.ndarray,
               alpha: float = 0.5,
               color: Tuple[int, int, int] = ROAD_COLOR) -> np.ndarray:
    """Alpha-blend the road color into masked pixels."""
    out = img_rgb.astype(np.float32).copy()
    c = np.asarray(color, np.float32)
    out[mask > 0] = (1 - alpha) * out[mask > 0] + alpha * c
    return np.clip(out, 0, 255).astype(np.uint8)


def write_overlay_video(frames: Iterable[Tuple[np.ndarray, np.ndarray]],
                        out_fn: str, fps: int = 30,
                        size_wh: Optional[Tuple[int, int]] = None,
                        alpha: float = 0.5) -> int:
    """frames yields (img_rgb uint8 HWC, mask HW); returns frame count."""
    import cv2

    writer = None
    n = 0
    for img, mask in frames:
        over = blend_road(img, mask, alpha)
        if size_wh is not None and (over.shape[1], over.shape[0]) != size_wh:
            over = cv2.resize(over, size_wh)
        if writer is None:
            h, w = over.shape[:2]
            writer = cv2.VideoWriter(
                out_fn, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
        writer.write(over[:, :, ::-1])  # RGB -> BGR
        n += 1
    if writer is not None:
        writer.release()
    return n


def frames_from_dirs(img_dir: str, mask_dir: str):
    """Pair frame images with predicted .npy masks by basename."""
    import cv2

    for img_fn in sorted(glob.glob(os.path.join(img_dir, "*.png"))):
        base = os.path.splitext(os.path.basename(img_fn))[0]
        mask_fn = os.path.join(mask_dir, base + ".npy")
        if not os.path.exists(mask_fn):
            continue
        img = cv2.imread(img_fn)[:, :, ::-1]
        mask = np.load(mask_fn)
        if mask.shape != img.shape[:2]:
            mask = cv2.resize(mask.astype(np.uint8),
                              (img.shape[1], img.shape[0]),
                              interpolation=cv2.INTER_NEAREST)
        yield img, mask
