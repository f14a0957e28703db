"""Wire formats for the image uplink.

On remote-attached TPUs the serialized uplink (~40 ms fixed + ~45 MB/s,
tools-probed; CLAUDE.md) is the label-generation pipeline's binding
constraint once the device program is fused: raw uint8 RGB at 224^2 is
147 KB/img -> ~306 img/s of pure upload ceiling.  The reference has no
analog (its images sit in GPU-local host RAM); this module is the
TPU-native "minimize host<->device transfers" lever.

``yuv420``: BT.601 YCbCr with 2x2-subsampled chroma — 1.5 B/px, half
the bytes of rgb8.  The host packs with cv2 (SIMD, ~1 ms/img); the
fused device program decodes in a handful of element-wise ops before
the SLIC/DRN stages.  Chroma subsampling is the same transform JPEG and
every camera pipeline applies; the pipeline quality gate
(tests/test_wire.py) pins the Road-IoU delta vs rgb8 to run noise.
Opt-in via LabelGenConfig.upload_format; rgb8 stays the default and the
parity mode rejects yuv420 (its contract is bit-equality from raw RGB).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def yuv420_bytes_per_image(hw) -> int:
    h, w = hw
    if h % 2 or w % 2:
        raise ValueError(f"yuv420 needs even dimensions, got {hw}")
    return h * w + (h // 2) * (w // 2) * 2


def pack_yuv420(images_uint8: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) uint8 RGB -> (B, 1.5*H*W) uint8 YUV420 planes.

    Per image: [Y (H*W) | Cr (H/2*W/2) | Cb (H/2*W/2)], full-range
    BT.601 (cv2.COLOR_RGB2YCrCb), chroma 2x2 box-filtered."""
    import cv2

    b, h, w, _ = images_uint8.shape
    out = np.empty((b, yuv420_bytes_per_image((h, w))), np.uint8)
    n = h * w
    q = n // 4
    for i in range(b):
        ycrcb = cv2.cvtColor(images_uint8[i], cv2.COLOR_RGB2YCrCb)
        out[i, :n] = ycrcb[:, :, 0].ravel()
        out[i, n:n + q] = cv2.resize(
            ycrcb[:, :, 1], (w // 2, h // 2),
            interpolation=cv2.INTER_AREA).ravel()
        out[i, n + q:] = cv2.resize(
            ycrcb[:, :, 2], (w // 2, h // 2),
            interpolation=cv2.INTER_AREA).ravel()
    return out


def decode_yuv420(packed: jnp.ndarray, hw) -> jnp.ndarray:
    """(B, 1.5*H*W) uint8 -> (B, H, W, 3) uint8 RGB, on device.

    Inverts cv2's full-range BT.601 (delta 128): R = Y + 1.403 Cr',
    G = Y - 0.714 Cr' - 0.344 Cb', B = Y + 1.773 Cb'; chroma upsampled
    nearest-neighbor."""
    h, w = hw
    n = h * w
    q = n // 4

    def chroma(plane):
        c = plane.reshape(-1, h // 2, 1, w // 2, 1).astype(jnp.float32)
        c = jnp.broadcast_to(c, (c.shape[0], h // 2, 2, w // 2, 2))
        return c.reshape(-1, h, w) - 128.0

    y = packed[:, :n].reshape(-1, h, w).astype(jnp.float32)
    cr = chroma(packed[:, n:n + q])
    cb = chroma(packed[:, n + q:])
    r = y + 1.403 * cr
    g = y - 0.714 * cr - 0.344 * cb
    bch = y + 1.773 * cb
    rgb = jnp.stack([r, g, bch], axis=-1)
    return jnp.clip(jnp.round(rgb), 0.0, 255.0).astype(jnp.uint8)
