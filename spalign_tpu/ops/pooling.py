"""Max pooling with argmax indices + index-based unpooling (SegNet).

Reference: models/segnet_basic.py:48-76 uses Chainer's
F.MaxPooling2D(2, 2) with stored indexes and F.upsampling_2d to scatter
decoder activations back to the encoder's max positions.

XLA-native design: 2x2/stride-2 pooling is a reshape + max over the window
axis; the argmax within each window is kept as a (0..3) code, and unpooling
is a one-hot expansion — no scatter, fully fusible, differentiable.
Odd inputs are padded with -inf (Chainer's cover_all=True output size).
Ties pick the first (lowest window-offset) element, matching Chainer.
"""

from __future__ import annotations

import jax.numpy as jnp


def max_pool_argmax_2x2(x: jnp.ndarray):
    """x: (N, H, W, C) -> (pooled (N, ceil(H/2), ceil(W/2), C), idx int32
    with values in [0, 4): window offset 2*dy + dx of the max."""
    n, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    h2, w2 = x.shape[1] // 2, x.shape[2] // 2
    xr = x.reshape(n, h2, 2, w2, 2, c)
    win = xr.transpose(0, 1, 3, 5, 2, 4).reshape(n, h2, w2, c, 4)
    idx = jnp.argmax(win, axis=-1).astype(jnp.int32)
    pooled = jnp.max(win, axis=-1)
    return pooled, idx


def max_unpool_2x2(x: jnp.ndarray, idx: jnp.ndarray,
                   out_hw=None) -> jnp.ndarray:
    """Scatter x back to the argmax positions recorded by
    max_pool_argmax_2x2; zeros elsewhere.

    If x and idx spatial shapes differ (decoder/encoder mismatch on odd
    sizes), both are cropped to the common min shape first
    (reference models/segnet_basic.py:49-53).

    Args:
      x: (N, h, w, C) decoder activations.
      idx: (N, h, w, C) int32 window offsets from the paired pooling.
      out_hw: optional (H, W) to crop the 2h x 2w output to.
    """
    if x.shape != idx.shape:
        mh = min(x.shape[1], idx.shape[1])
        mw = min(x.shape[2], idx.shape[2])
        x = x[:, :mh, :mw]
        idx = idx[:, :mh, :mw]
    n, h, w, c = x.shape
    onehot = (idx[..., None] == jnp.arange(4, dtype=jnp.int32)).astype(
        x.dtype)  # (N, h, w, C, 4)
    win = x[..., None] * onehot
    out = win.reshape(n, h, w, c, 2, 2).transpose(0, 1, 4, 2, 5, 3).reshape(
        n, 2 * h, 2 * w, c)
    if out_hw is not None:
        out = out[:, : out_hw[0], : out_hw[1]]
    return out
