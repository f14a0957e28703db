"""Local response normalization across channels (channels-last).

Chainer semantics (used by SegNetBasic, reference models/segnet_basic.py:64
with F.local_response_normalization(x, n=5, k=1, alpha=1e-4/5, beta=0.75)):

  y_c = x_c / (k + alpha * sum_{c' in window(c, n)} x_{c'}^2) ** beta

where the window covers n channels centered on c (n//2 each side,
truncated at the edges).
"""

from __future__ import annotations

import jax.numpy as jnp


def local_response_normalization(x: jnp.ndarray, n: int = 5, k: float = 2.0,
                                 alpha: float = 1e-4,
                                 beta: float = 0.75) -> jnp.ndarray:
    """x: (..., C) channels-last."""
    sq = x * x
    half = n // 2
    c = x.shape[-1]
    # Sliding-window channel sum via padded cumulative sum: with one extra
    # leading zero, the window over channel j (covering [j-half, j+half])
    # is cs[j + n] - cs[j].
    pad = [(0, 0)] * (x.ndim - 1) + [(half + 1, half)]
    cs = jnp.cumsum(jnp.pad(sq, pad), axis=-1)
    window_sum = cs[..., n:n + c] - cs[..., 0:c]
    scale = (k + alpha * window_sum) ** beta
    return x / scale
