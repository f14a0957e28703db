"""Training losses, exactly matching the reference's three modes
(train_segnet.py:209-223):

  * 'ce'   — chainer F.softmax_cross_entropy: mean over non-ignored
             (label >= 0) pixels of -log softmax[label].
  * 'soft' — softmax CE with soft labels: -F.average(t * log_softmax(y)),
             i.e. the mean over ALL elements (pixels AND classes) of the
             elementwise product (yes, this divides by n_class too — we
             reproduce the reference's arithmetic).
  * 'mse'  — F.mean_squared_error(y, t) on raw logits vs score targets.

Layouts are channels-last: logits (B, H, W, C); hard labels (B, H, W)
int32 with -1 = ignore; soft labels (B, H, W, C) float.
"""

from __future__ import annotations

import jax.nn
import jax.numpy as jnp


def softmax_cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = labels >= 0
    safe = jnp.where(valid, labels, 0)
    # one-hot contraction instead of take_along_axis: the per-pixel
    # gather lowers to a serialized TPU gather costing ~60 ms fwd+bwd at
    # the (8, 512, 1024, 2) recipe shape; the one-hot multiply runs in
    # ~1.4 ms with bit-identical values (measured, tools/ce_probe.py)
    onehot = (safe[..., None]
              == jnp.arange(logits.shape[-1])).astype(logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


def soft_label_cross_entropy(logits, soft_targets):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(soft_targets * logp)


def mean_squared_error(logits, targets):
    d = logits - targets
    return jnp.mean(d * d)


def get_loss_fn(name: str):
    return {"ce": softmax_cross_entropy,
            "soft": soft_label_cross_entropy,
            "mse": mean_squared_error}[name]
