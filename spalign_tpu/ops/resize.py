"""On-device resize ops matching the reference's OpenCV/chainercv usage.

- Nearest-neighbor mask upsampling matches cv2.INTER_NEAREST's coordinate
  convention src = floor(dst * src_size / dst_size)
  (reference batch_spalign_kmeans.py:470-477).
- Bilinear score resize (chainercv transforms.resize with PIL/cv2 bilinear,
  half-pixel centers) uses jax.image.resize
  (reference models/segnet_basic.py:105-110).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nn_resize_cv2(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """cv2.INTER_NEAREST-compatible resize of the last two (or only two)
    spatial dims.  x: (..., H, W)."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = out_hw
    ys = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    return x[..., ys, :][..., :, xs]


def bilinear_resize(x: jnp.ndarray, out_hw, spatial_axes=(0, 1)):
    """Half-pixel-center bilinear resize along two axes (default leading).

    For CHW score tensors pass spatial_axes=(1, 2); for HWC use (0, 1).
    """
    shape = list(x.shape)
    shape[spatial_axes[0]] = out_hw[0]
    shape[spatial_axes[1]] = out_hw[1]
    return jax.image.resize(x, shape, method="linear")
