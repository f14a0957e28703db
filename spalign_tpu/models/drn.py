"""Dilated Residual Networks (DRN-C / DRN-D) in flax, NHWC, TPU-first.

Architecture per Yu, Koltun & Funkhouser, "Dilated Residual Networks"
(CVPR 2017), matching the reference feature extractor
(/root/reference/models/drn.py — Chainer; /root/reference/models/
drn_pytorch.py — the public torch donor whose pretrained checkpoints we
convert).  The label-generation pipeline consumes stage-8's output: with
224x224 input, a 512-channel 28x28 map (output stride 8, reference
batch_spalign_kmeans.py:431-435, map index 7).

Differences from the reference implementation (not the architecture):
NHWC layout, fused-BN inference via flax, no Sequential container —
composition is plain module code.  Parameter tree paths are chosen so the
torch->flax converter (spalign_tpu.convert) is a pure name map.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def preprocess_imagenet(x_rgb_0_255: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) RGB in [0, 255] -> normalized float32
    (reference models/drn.py:304-321 batch_predict)."""
    x = x_rgb_0_255.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


def _conv(features, kernel, stride=1, dilation=1, pad=None, name=None,
          use_bias=False, dtype=None):
    if pad is None:
        pad = kernel // 2 * dilation
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)),
                   kernel_dilation=(dilation, dilation), use_bias=use_bias,
                   name=name, dtype=dtype)


def _bn(name, train, dtype=None):
    # torch BatchNorm2d defaults: eps=1e-5, momentum 0.1 (=> EMA decay 0.9)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name, dtype=dtype)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: Tuple[int, int] = (1, 1)
    residual: bool = True
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        h = _conv(self.planes, 3, self.stride, self.dilation[0],
                  pad=self.dilation[0], name="conv1", dtype=self.dtype)(x)
        h = _bn("bn1", train, self.dtype)(h)
        h = nn.relu(h)
        h = _conv(self.planes, 3, 1, self.dilation[1],
                  pad=self.dilation[1], name="conv2", dtype=self.dtype)(h)
        h = _bn("bn2", train, self.dtype)(h)
        if self.downsample:
            res = _conv(self.planes, 1, self.stride, 1, pad=0,
                        name="downsample_conv", dtype=self.dtype)(x)
            res = _bn("downsample_bn", train, self.dtype)(res)
        if self.residual:
            h = h + res
        return nn.relu(h)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: Tuple[int, int] = (1, 1)
    residual: bool = True  # bottlenecks always add the skip (ref :86-106)
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        h = _conv(self.planes, 1, 1, 1, pad=0, name="conv1",
                  dtype=self.dtype)(x)
        h = _bn("bn1", train, self.dtype)(h)
        h = nn.relu(h)
        h = _conv(self.planes, 3, self.stride, self.dilation[1],
                  pad=self.dilation[1], name="conv2", dtype=self.dtype)(h)
        h = _bn("bn2", train, self.dtype)(h)
        h = nn.relu(h)
        h = _conv(self.planes * 4, 1, 1, 1, pad=0, name="conv3",
                  dtype=self.dtype)(h)
        h = _bn("bn3", train, self.dtype)(h)
        if self.downsample:
            res = _conv(self.planes * 4, 1, self.stride, 1, pad=0,
                        name="downsample_conv", dtype=self.dtype)(x)
            res = _bn("downsample_bn", train, self.dtype)(res)
        return nn.relu(h + res)


class _ResLayer(nn.Module):
    """A stage of residual blocks (reference DRN._make_layer)."""

    block: type
    in_planes: int
    planes: int
    n_blocks: int
    stride: int = 1
    dilation: int = 1
    new_level: bool = True
    residual: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        exp = self.block.expansion
        need_ds = (self.stride != 1
                   or self.in_planes != self.planes * exp)
        if self.dilation == 1:
            first_dil = (1, 1)
        else:
            d0 = self.dilation // 2 if self.new_level else self.dilation
            first_dil = (d0, self.dilation)
        x = self.block(self.planes, self.stride, first_dil, self.residual,
                       need_ds, self.dtype, name="block0")(x, train)
        for i in range(1, self.n_blocks):
            x = self.block(self.planes, 1, (self.dilation, self.dilation),
                           self.residual, False, self.dtype,
                           name=f"block{i}")(x, train)
        return x


class _ConvLayer(nn.Module):
    """conv-bn-relu x n (reference DRN._make_conv_layers, arch D).

    kernel=7, n_convs=1 expresses the arch-D stem (layer0)."""

    channels: int
    n_convs: int
    stride: int = 1
    dilation: int = 1
    kernel: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_convs):
            s = self.stride if i == 0 else 1
            x = _conv(self.channels, self.kernel, s, self.dilation,
                      pad=(self.kernel // 2) * self.dilation,
                      name=f"conv{i}", dtype=self.dtype)(x)
            x = _bn(f"bn{i}", train, self.dtype)(x)
            x = nn.relu(x)
        return x


class DRN(nn.Module):
    """8-stage dilated residual network.

    Args mirror the reference factory surface; input is NHWC RGB already
    preprocessed (see preprocess_imagenet).  ``__call__`` returns
    (head_output, middle_maps) where middle_maps is a tuple of the 8 stage
    outputs when out_middle else ().
    """

    block: type = BasicBlock
    layers: Sequence[int] = (1, 1, 2, 2, 2, 2, 1, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512, 512, 512)
    num_classes: int = 1000
    arch: str = "C"
    out_map: bool = True
    out_middle: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        ly = self.layers
        blk = self.block
        exp = blk.expansion
        maps = []

        if self.arch == "C":
            x = _conv(ch[0], 7, 1, 1, pad=3, name="conv1",
                      dtype=self.dtype)(x)
            x = _bn("bn1", train, self.dtype)(x)
            x = nn.relu(x)
            x = _ResLayer(BasicBlock, ch[0], ch[0], ly[0], 1, 1,
                          dtype=self.dtype, name="layer1")(x, train)
            maps.append(x)
            x = _ResLayer(BasicBlock, ch[0], ch[1], ly[1], 2, 1,
                          dtype=self.dtype, name="layer2")(x, train)
            maps.append(x)
            in_planes = ch[1]
        elif self.arch == "D":
            x = _ConvLayer(ch[0], 1, 1, 1, kernel=7, dtype=self.dtype,
                           name="layer0")(x, train)
            x = _ConvLayer(ch[0], ly[0], 1, 1, dtype=self.dtype,
                           name="layer1")(x, train)
            maps.append(x)
            x = _ConvLayer(ch[1], ly[1], 2, 1, dtype=self.dtype,
                           name="layer2")(x, train)
            maps.append(x)
            in_planes = ch[1]
        else:
            raise ValueError(f"unknown arch {self.arch!r}")

        x = _ResLayer(blk, in_planes, ch[2], ly[2], 2, 1,
                      dtype=self.dtype, name="layer3")(x, train)
        maps.append(x)
        x = _ResLayer(blk, ch[2] * exp, ch[3], ly[3], 2, 1,
                      dtype=self.dtype, name="layer4")(x, train)
        maps.append(x)
        x = _ResLayer(blk, ch[3] * exp, ch[4], ly[4], 1, 2,
                      new_level=False, dtype=self.dtype,
                      name="layer5")(x, train)
        maps.append(x)
        in_planes = ch[4] * exp
        if ly[5] > 0:
            x = _ResLayer(blk, in_planes, ch[5], ly[5], 1, 4,
                          new_level=False, dtype=self.dtype,
                          name="layer6")(x, train)
            maps.append(x)
            in_planes = ch[5] * exp

        if self.arch == "C":
            if ly[6] > 0:
                x = _ResLayer(BasicBlock, in_planes, ch[6], ly[6], 1, 2,
                              new_level=False, residual=False,
                              dtype=self.dtype, name="layer7")(x, train)
                maps.append(x)
                in_planes = ch[6]
            if ly[7] > 0:
                x = _ResLayer(BasicBlock, in_planes, ch[7], ly[7], 1, 1,
                              new_level=False, residual=False,
                              dtype=self.dtype, name="layer8")(x, train)
                maps.append(x)
        else:
            if ly[6] > 0:
                x = _ConvLayer(ch[6], ly[6], 1, 2, dtype=self.dtype,
                               name="layer7")(x, train)
                maps.append(x)
            if ly[7] > 0:
                x = _ConvLayer(ch[7], ly[7], 1, 1, dtype=self.dtype,
                               name="layer8")(x, train)
                maps.append(x)

        if self.num_classes > 0:
            fc = nn.Conv(self.num_classes, (1, 1), use_bias=True, name="fc",
                         dtype=self.dtype)
            if self.out_map:
                out = fc(x)
            else:
                pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
                out = fc(pooled).reshape(x.shape[0], -1)
        else:
            out = x

        return (out, tuple(maps)) if self.out_middle else (out, ())


def drn_c_26(**kw):
    return DRN(BasicBlock, (1, 1, 2, 2, 2, 2, 1, 1), arch="C", **kw)


def drn_c_42(**kw):
    return DRN(BasicBlock, (1, 1, 3, 4, 6, 3, 1, 1), arch="C", **kw)


def drn_c_58(**kw):
    return DRN(Bottleneck, (1, 1, 3, 4, 6, 3, 1, 1), arch="C", **kw)


def drn_d_22(**kw):
    return DRN(BasicBlock, (1, 1, 2, 2, 2, 2, 1, 1), arch="D", **kw)


def drn_d_38(**kw):
    return DRN(BasicBlock, (1, 1, 3, 4, 6, 3, 1, 1), arch="D", **kw)


def drn_d_54(**kw):
    return DRN(Bottleneck, (1, 1, 3, 4, 6, 3, 1, 1), arch="D", **kw)


def drn_d_105(**kw):
    return DRN(Bottleneck, (1, 1, 3, 4, 23, 3, 1, 1), arch="D", **kw)


def batch_predict(model: "DRN", variables, images_rgb_0_255,
                  train: bool = False):
    """Reference-API convenience (models/drn.py:304-325 batch_predict):
    (B, H, W, 3) RGB in [0, 255] -> (head_output, middle_maps), with the
    ImageNet normalization applied inside."""
    x = preprocess_imagenet(images_rgb_0_255)
    return model.apply(variables, x, train=train)


def predict(model: "DRN", variables, image_rgb_0_255):
    """Per-image convenience (reference models/drn.py:287-302 predict):
    a single (H, W, 3) RGB [0, 255] image -> (head_output, middle_maps)
    with the leading batch dim added, normalization inside, eval mode."""
    return batch_predict(model, variables, image_rgb_0_255[None],
                         train=False)


DRN_FACTORIES = {
    "drn_c_26": drn_c_26, "drn_c_42": drn_c_42, "drn_c_58": drn_c_58,
    "drn_d_22": drn_d_22, "drn_d_38": drn_d_38, "drn_d_54": drn_d_54,
    "drn_d_105": drn_d_105,
}
