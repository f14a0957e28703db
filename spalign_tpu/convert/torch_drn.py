"""PyTorch DRN donor module — the checkpoint format specification.

The public pretrained DRN checkpoints (tigress-web.princeton.edu/~fy/drn,
referenced by /root/reference/models/drn_pytorch.py:10-20) are plain
state_dicts with keys like ``layer3.0.conv1.weight``.  This module is a
fresh, minimal torch implementation whose state_dict layout and forward
semantics match those checkpoints; it serves two purposes:

  1. the numeric-parity oracle for the flax DRN + converter (the
     reference's own test strategy: convert_pth2ch.py:57-73 asserts
     param-count equality and output agreement to 1e-4);
  2. documentation of the donor key layout the converter consumes.

torch runs CPU-only here; it is never on the TPU compute path.
"""

from __future__ import annotations

import torch.nn as tnn


def _conv3(cin, cout, stride=1, dilation=1):
    return tnn.Conv2d(cin, cout, 3, stride=stride, padding=dilation,
                      dilation=dilation, bias=False)


class TorchBasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, cin, planes, stride=1, downsample=None,
                 dilation=(1, 1), residual=True):
        super().__init__()
        self.conv1 = _conv3(cin, planes, stride, dilation[0])
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = _conv3(planes, planes, 1, dilation[1])
        self.bn2 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample
        self.residual = residual

    def forward(self, x):
        r = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            r = self.downsample(x)
        if self.residual:
            y = y + r
        return self.relu(y)


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, downsample=None,
                 dilation=(1, 1), residual=True):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=dilation[1], dilation=dilation[1],
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        r = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            r = self.downsample(x)
        return self.relu(y + r)


class TorchDRN(tnn.Module):
    def __init__(self, block, layers,
                 channels=(16, 32, 64, 128, 256, 512, 512, 512),
                 num_classes=1000, arch="C"):
        super().__init__()
        self.arch = arch
        self.inplanes = channels[0]

        if arch == "C":
            self.conv1 = tnn.Conv2d(3, channels[0], 7, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(channels[0])
            self.relu = tnn.ReLU(inplace=True)
            self.layer1 = self._res(TorchBasicBlock, channels[0], layers[0])
            self.layer2 = self._res(TorchBasicBlock, channels[1], layers[1],
                                    stride=2)
        else:
            self.layer0 = tnn.Sequential(
                tnn.Conv2d(3, channels[0], 7, padding=3, bias=False),
                tnn.BatchNorm2d(channels[0]), tnn.ReLU(inplace=True))
            self.layer1 = self._convs(channels[0], layers[0])
            self.layer2 = self._convs(channels[1], layers[1], stride=2)

        self.layer3 = self._res(block, channels[2], layers[2], stride=2)
        self.layer4 = self._res(block, channels[3], layers[3], stride=2)
        self.layer5 = self._res(block, channels[4], layers[4], dilation=2,
                                new_level=False)
        self.layer6 = self._res(block, channels[5], layers[5], dilation=4,
                                new_level=False) if layers[5] else None
        if arch == "C":
            self.layer7 = self._res(TorchBasicBlock, channels[6], layers[6],
                                    dilation=2, new_level=False,
                                    residual=False) if layers[6] else None
            self.layer8 = self._res(TorchBasicBlock, channels[7], layers[7],
                                    dilation=1, new_level=False,
                                    residual=False) if layers[7] else None
        else:
            self.layer7 = self._convs(channels[6], layers[6],
                                      dilation=2) if layers[6] else None
            self.layer8 = self._convs(channels[7], layers[7],
                                      dilation=1) if layers[7] else None
        # self.inplanes tracks the final stage's output width
        self.fc = tnn.Conv2d(self.inplanes, num_classes, 1)

    def _res(self, block, planes, n, stride=1, dilation=1, new_level=True,
             residual=True):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * block.expansion, 1,
                           stride=stride, bias=False),
                tnn.BatchNorm2d(planes * block.expansion))
        if dilation == 1:
            fd = (1, 1)
        else:
            fd = ((dilation // 2 if new_level else dilation), dilation)
        blocks = [block(self.inplanes, planes, stride, downsample, fd,
                        residual)]
        self.inplanes = planes * block.expansion
        for _ in range(1, n):
            blocks.append(block(self.inplanes, planes,
                                dilation=(dilation, dilation),
                                residual=residual))
        return tnn.Sequential(*blocks)

    def _convs(self, channels, n, stride=1, dilation=1):
        mods = []
        for i in range(n):
            mods += [tnn.Conv2d(self.inplanes, channels, 3,
                                stride=stride if i == 0 else 1,
                                padding=dilation, dilation=dilation,
                                bias=False),
                     tnn.BatchNorm2d(channels), tnn.ReLU(inplace=True)]
            self.inplanes = channels
        return tnn.Sequential(*mods)

    def forward(self, x):
        maps = []
        if self.arch == "C":
            x = self.relu(self.bn1(self.conv1(x)))
        else:
            x = self.layer0(x)
        for name in ("layer1", "layer2", "layer3", "layer4", "layer5",
                     "layer6", "layer7", "layer8"):
            layer = getattr(self, name)
            if layer is not None:
                x = layer(x)
                maps.append(x)
        return self.fc(x), maps


def torch_drn_c_26(num_classes=1000):
    return TorchDRN(TorchBasicBlock, [1, 1, 2, 2, 2, 2, 1, 1], arch="C",
                    num_classes=num_classes)


def torch_drn_c_42(num_classes=1000):
    return TorchDRN(TorchBasicBlock, [1, 1, 3, 4, 6, 3, 1, 1], arch="C",
                    num_classes=num_classes)


def torch_drn_c_58(num_classes=1000):
    # Bottleneck body; arch-C de-gridding layers 7/8 stay BasicBlock
    # (drn_pytorch.py:273-278 + :150-158)
    return TorchDRN(TorchBottleneck, [1, 1, 3, 4, 6, 3, 1, 1], arch="C",
                    num_classes=num_classes)


def torch_drn_d_22(num_classes=1000):
    return TorchDRN(TorchBasicBlock, [1, 1, 2, 2, 2, 2, 1, 1], arch="D",
                    num_classes=num_classes)


def torch_drn_d_38(num_classes=1000):
    return TorchDRN(TorchBasicBlock, [1, 1, 3, 4, 6, 3, 1, 1], arch="D",
                    num_classes=num_classes)


def torch_drn_d_54(num_classes=1000):
    return TorchDRN(TorchBottleneck, [1, 1, 3, 4, 6, 3, 1, 1], arch="D",
                    num_classes=num_classes)


def torch_drn_d_105(num_classes=1000):
    return TorchDRN(TorchBottleneck, [1, 1, 3, 4, 23, 3, 1, 1], arch="D",
                    num_classes=num_classes)


TORCH_DRN_FACTORIES = {
    "drn_c_26": torch_drn_c_26, "drn_c_42": torch_drn_c_42,
    "drn_c_58": torch_drn_c_58, "drn_d_22": torch_drn_d_22,
    "drn_d_38": torch_drn_d_38, "drn_d_54": torch_drn_d_54,
    "drn_d_105": torch_drn_d_105,
}
