"""Minimal torch models with torchvision-compatible state_dict names.

torchvision/timm/lpips are not installed in this environment, so these tiny
CPU-torch replicas stand in for the real zoo checkpoints: their state_dicts
use the exact names the converters in tools/convert_torch_weights.py expect,
and their forwards give the ground truth the flax ports must match.  Only the
sub-networks the framework actually consumes are modelled (reference:
network/res_encoder.py:349-362 resnet trunk w/ stride-1 layer4;
utils/perceptual_loss.py:28 vgg19 features[:14]; lpips AlexNet five taps).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(y + identity)


class TorchResNet50Trunk(nn.Module):
    """torchvision resnet50 trunk (no fc) with the reference's stride-1
    layer4 modification (network/res_encoder.py:354-362).  Returns
    (layer2 'low' features, layer4 features), NCHW."""

    def __init__(self, layer4_stride1=True):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, 3, 1)
        self.layer2 = self._make_layer(128, 4, 2)
        self.layer3 = self._make_layer(256, 6, 2)
        self.layer4 = self._make_layer(512, 3, 1 if layer4_stride1 else 2)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [Bottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        x = self.layer1(x)
        low = self.layer2(x)
        x = self.layer3(low)
        x = self.layer4(x)
        return low, x


class TorchVGG19Relu32(nn.Module):
    """torchvision vgg19 `features[:14]` (through relu3_2) with matching
    indices in the state_dict (features.0/2/5/7/10/12)."""

    def __init__(self):
        super().__init__()
        layers = []
        cfg = [(3, 64), (64, 64), "M", (64, 128), (128, 128), "M",
               (128, 256), (256, 256)]
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(v[0], v[1], 3, padding=1))
                layers.append(nn.ReLU(inplace=False))
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        return self.features(x)


class TorchAlexFeatures(nn.Module):
    """torchvision alexnet `features` emitting the 5 relu taps LPIPS uses."""

    def __init__(self):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(),
            nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
        )

    def forward(self, x):
        taps = []
        for i, m in enumerate(self.features):
            x = m(x)
            if i in (1, 4, 7, 9, 11):  # relu outputs
                taps.append(x)
        return taps


def lpips_lin_state_dict(rng_seed=0):
    """Random LPIPS linear-head checkpoint in the released naming scheme
    (lin{i}.model.1.weight, 1x1 convs over tap channels)."""
    g = torch.Generator().manual_seed(rng_seed)
    chans = [64, 192, 384, 256, 256]
    return {
        f"lin{i}.model.1.weight": torch.rand((1, c, 1, 1), generator=g)
        for i, c in enumerate(chans)
    }


def torch_lpips_distance(alex, lin_sd, img0, img1):
    """Ground-truth LPIPS forward: unit-normalised tap diffs -> 1x1 lin ->
    spatial mean -> sum over taps.  imgs NCHW in [-1,1]."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    f0 = alex((img0 - shift) / scale)
    f1 = alex((img1 - shift) / scale)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        an = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        bn = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        d = (an - bn) ** 2
        w = lin_sd[f"lin{i}.model.1.weight"]
        total = total + F.conv2d(d, w).mean(dim=(1, 2, 3))
    return total
