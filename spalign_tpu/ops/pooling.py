"""Max pooling with argmax indices + index-based unpooling (SegNet).

Reference: models/segnet_basic.py:48-76 uses Chainer's
F.MaxPooling2D(2, 2) with stored indexes and F.upsampling_2d to scatter
decoder activations back to the encoder's max positions.

XLA-native design with ZERO transposes and ZERO gathers: the window
tensor (N, h, 2, w, 2, C) is a pure reshape of the contiguous NHWC
input, the max/argmax are reductions over the two size-2 axes, the
argmax code comes from a broadcasted-iota position grid (ties pick the
lowest window offset, matching Chainer/jnp.argmax), and unpooling
broadcasts back into the same 6D layout and reshapes — (h, 2) and
(w, 2) merge contiguously, so no data reordering ever happens.

The argmax code is carried as **int8** (values 0..3): in the real model
the idx tensors persist encoder -> decoder AND are saved as backward
residuals, so their dtype is HBM traffic; int8 quarters it vs int32.

Formulations measured on real TPU in the FULL SegNetBasic train step
(tools/pool_step_probe.py, B=8 512x1024, interleaved A/B):
  6D int32 (round 2)                     347 ms f32 / 250 ms bf16
  6D int8  (this file)                   338 ms f32 / 240 ms bf16
  lane-packed (.., 2C) + int8            368 ms f32 / 265 ms bf16
(the packed form loses despite full-lane tiles — the lane-64 slices/
concats cost more than the 6D form's (2, C) tiles); an interior-padded
lax.pad variant measured 4.6x worse still (tools/train_probe.py notes).

Backward: the pooled value is SELECTED through the argmax mask (the max
reduction itself is detached), so its gradient routes exactly to the
argmax element — Chainer's semantics.  (jnp.max's vjp splits gradients
among tied elements; after relu, exact ties at 0.0 are common, so the
distinction is real.)

Odd inputs are padded with -inf (Chainer's cover_all=True output size).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# 'xla' (default) | 'pallas' — hand-streamed Pallas kernels exist
# (kernels/pooling_pallas.py, bit-equal incl. gradients) but MEASURED
# SLOWER in the full train step (tools/pool_pallas_probe.py, real TPU,
# interleaved A/B: f32 345 vs 337 ms/step, bf16 261 vs 240): under jit
# XLA fuses this file's reshape-native form into the surrounding
# BN/relu/conv elementwise chains, and a custom call severs exactly
# those fusions.  The kernels stay in-repo as the measured alternative;
# force with SPALIGN_POOL_IMPL=pallas for A/B probes.
POOL_IMPL = os.environ.get("SPALIGN_POOL_IMPL", "xla")


def _use_pallas(shape, dtype) -> bool:
    if POOL_IMPL != "pallas":
        return False
    from spalign_tpu.kernels.pooling_pallas import pallas_pool_eligible

    return pallas_pool_eligible(shape, dtype)


def _pos_grid(dtype=jnp.int32):
    """(1, 1, 2, 1, 2, 1) window-offset codes 2*dy + dx."""
    dy = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2, 1, 2, 1), 2)
    dx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2, 1, 2, 1), 4)
    return (2 * dy + dx).astype(dtype)


def max_pool_argmax_2x2(x: jnp.ndarray):
    """x: (N, H, W, C) -> (pooled (N, ceil(H/2), ceil(W/2), C), idx int8
    with values in [0, 4): window offset 2*dy + dx of the max."""
    n, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    if _use_pallas(x.shape, x.dtype):
        from spalign_tpu.kernels.pooling_pallas import \
            max_pool_argmax_2x2_pallas

        return max_pool_argmax_2x2_pallas(x)
    h2, w2 = x.shape[1] // 2, x.shape[2] // 2
    xr = x.reshape(n, h2, 2, w2, 2, c)
    m = jax.lax.stop_gradient(jnp.max(xr, axis=(2, 4), keepdims=True))
    pos = _pos_grid()
    # first max in window order: min position among elements == max
    cand = jnp.where(xr == m, pos, 4)
    idx = jnp.min(cand, axis=(2, 4)).astype(jnp.int8)  # (n, h2, w2, c)
    sel = cand.astype(jnp.int8) == idx[:, :, None, :, None, :]
    # select (not reduce): gradient flows to the argmax element only
    pooled = jnp.sum(jnp.where(sel, xr, 0.0), axis=(2, 4))
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
      idx: (N, h, w, C) int8/int32 window offsets from the paired pooling.
      out_hw: optional (H, W) to crop the 2h x 2w output to.
    """
    if x.shape != idx.shape:
        mh = min(x.shape[1], idx.shape[1])
        mw = min(x.shape[2], idx.shape[2])
        x = x[:, :mh, :mw]
        idx = idx[:, :mh, :mw]
    if _use_pallas(x.shape, x.dtype):
        from spalign_tpu.kernels.pooling_pallas import \
            max_unpool_2x2_pallas

        out = max_unpool_2x2_pallas(x, idx.astype(jnp.int8))
        if out_hw is not None:
            out = out[:, : out_hw[0], : out_hw[1]]
        return out
    n, h, w, c = x.shape
    sel = idx[:, :, None, :, None, :] == _pos_grid(idx.dtype)
    out6 = jnp.where(sel, x[:, :, None, :, None, :], 0.0)
    out = out6.astype(x.dtype).reshape(n, 2 * h, 2 * w, c)
    if out_hw is not None:
        out = out[:, : out_hw[0], : out_hw[1]]
    return out
