"""SegNet students (SegNetBasic + full SegNet) in flax, NHWC.

Reference: models/segnet_basic.py and models/segnet.py.  Encoder max-pool
positions are remembered and decoders scatter activations back through
them (index unpooling) — here via ops.pooling's reshape/argmax form, which
XLA fuses, instead of Chainer's cuDNN-disabled MaxPooling2D workaround
(reference segnet_basic.py:11-13).

Synchronized batch norm: the reference wraps every BN in
MultiNodeBatchNormalization (NCCL allreduce of batch statistics,
segnet_basic.py:21-24) because per-GPU batch is 1.  Under pjit the batch
dimension is sharded over the mesh but remains one logical array, so
flax's plain BatchNorm already computes GLOBAL batch statistics — XLA
inserts the cross-chip reductions.  No distributed-BN machinery needed.

Conv bias conventions preserved from the reference ctor args:
SegNetBasic's 7x7 convs carry no bias (nobias=True at segnet_basic.py:26),
its 1x1 classifier does; SegNet's CBR convs carry none, its score conv
does.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from spalign_tpu.ops.lrn import local_response_normalization
from spalign_tpu.ops.pooling import max_pool_argmax_2x2, max_unpool_2x2
from spalign_tpu.ops.resize import bilinear_resize


def _he():
    return nn.initializers.he_normal()


class SegNetBasic(nn.Module):
    """4-down/4-up SegNet-Basic (reference models/segnet_basic.py:16-78)."""

    n_class: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(name):
            return nn.Conv(64, (7, 7), padding=((3, 3), (3, 3)),
                           use_bias=False, kernel_init=_he(), name=name,
                           dtype=self.dtype)

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=2e-5,
                                bias_init=nn.initializers.constant(0.001),
                                name=name, dtype=self.dtype)

        h = local_response_normalization(x, n=5, k=1.0, alpha=1e-4 / 5.0,
                                         beta=0.75)
        idxs = []
        shapes = []
        for i in range(1, 5):
            h = nn.relu(bn(f"conv{i}_bn")(conv(f"conv{i}")(h)))
            shapes.append(h.shape[1:3])
            h, idx = max_pool_argmax_2x2(h)
            idxs.append(idx)
        for i in range(4, 0, -1):
            h = max_unpool_2x2(h, idxs[i - 1], out_hw=shapes[i - 1])
            h = bn(f"conv_decode{i}_bn")(conv(f"conv_decode{i}")(h))
        score = nn.Conv(self.n_class, (1, 1), use_bias=True,
                        kernel_init=_he(), name="conv_classifier",
                        dtype=self.dtype)(h)
        return score


class _CBR(nn.Module):
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=_he(), name="conv",
                    dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=2e-5, name="bn", dtype=self.dtype)(h)
        return nn.relu(h)


class _Block(nn.Module):
    n_cbr: int
    mid: int
    out: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_cbr - 1):
            x = _CBR(self.mid, self.dtype, name=f"cbr{i}")(x, train)
        return _CBR(self.out, self.dtype,
                    name=f"cbr{self.n_cbr - 1}")(x, train)


class SegNet(nn.Module):
    """VGG-style 5-down/5-up SegNet (reference models/segnet.py:47-95)."""

    n_class: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc = [(2, 64, 64), (2, 128, 128), (3, 256, 256), (3, 512, 512),
               (3, 512, 512)]
        dec = [(3, 512, 512), (3, 512, 256), (3, 256, 128), (2, 128, 64)]
        idxs, shapes = [], []
        h = x
        for i, (n, mid, out) in enumerate(enc, start=1):
            h = _Block(n, mid, out, self.dtype, name=f"block{i}")(h, train)
            shapes.append(h.shape[1:3])
            h, idx = max_pool_argmax_2x2(h)
            idxs.append(idx)
        for i, (n, mid, out) in zip(range(5, 1, -1), dec):
            h = max_unpool_2x2(h, idxs[i - 1], out_hw=shapes[i - 1])
            h = _Block(n, mid, out, self.dtype,
                       name=f"up_block{i}")(h, train)
        h = max_unpool_2x2(h, idxs[0], out_hw=shapes[0])
        h = _CBR(64, self.dtype, name="up_block1")(h, train)
        return nn.Conv(self.n_class, (3, 3), padding=((1, 1), (1, 1)),
                       use_bias=True, kernel_init=_he(), name="score",
                       dtype=self.dtype)(h)


def predict_labels(apply_fn, variables, images_nhwc, pred_shape=None,
                   return_score: bool = False,
                   return_small_score: bool = False):
    """Inference helper mirroring the reference predict semantics
    (segnet_basic.py:80-115): forward in eval mode, optional softmax,
    resize scores to pred_shape (bilinear), argmax over classes.

    Operates on a whole batch at once (the reference loops per image).
    Returns labels (N, H', W') int32 [and scores (N, H', W', C)].
    With return_small_score the score slot is a (resized, pre-resize)
    pair — the pre-resize softmax carries the same information in
    1/upsample-factor of the bytes (the relabel downlink lever).
    """
    score = apply_fn(variables, images_nhwc, train=False)
    if return_score:
        score = nn.softmax(score, axis=-1)
    small = score
    if pred_shape is not None and tuple(score.shape[1:3]) != tuple(
            pred_shape):
        score = bilinear_resize(score, pred_shape, spatial_axes=(1, 2))
    labels = jnp.argmax(score, axis=-1).astype(jnp.int32)
    if return_score:
        return labels, ((score, small) if return_small_score else score)
    return labels
