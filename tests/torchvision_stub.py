"""Minimal torch ResNet standing in for torchvision (not installed here).

The reference's networks/resnet_encoder.py imports torchvision.models for
the standard ResNet architecture (conv1/bn1/maxpool/layer1-4 with
BasicBlock / Bottleneck-v1.5 semantics). This module recreates exactly
that structural contract so the reference modules import and run for
parity tests; no pretrained weights (tests randomize all state).

Install as: tests.torchvision_stub.install() BEFORE importing reference
networks. No-op if real torchvision is importable.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn


def conv3x3(in_planes, out_planes, stride=1):
    return nn.Conv2d(in_planes, out_planes, 3, stride=stride, padding=1,
                     bias=False)


def conv1x1(in_planes, out_planes, stride=1):
    return nn.Conv2d(in_planes, out_planes, 1, stride=stride, bias=False)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = conv3x3(inplanes, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = conv3x3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        # torchvision v1.5: stride on the 3x3 conv
        self.conv1 = conv1x1(inplanes, planes)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = conv3x3(planes, planes, stride)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = conv1x1(planes, planes * self.expansion)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                        nonlinearity="relu")
            elif isinstance(m, nn.BatchNorm2d):
                nn.init.constant_(m.weight, 1)
                nn.init.constant_(m.bias, 0)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                conv1x1(self.inplanes, planes * block.expansion, stride),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def _factory(layers, block):
    def make(pretrained=False, **kw):
        assert not pretrained, "stub torchvision has no pretrained weights"
        return ResNet(block, layers, **kw)

    return make


def install():
    """Register the stub as `torchvision` unless the real one exists."""
    try:
        import torchvision  # noqa: F401

        return
    except ImportError:
        pass
    tv = types.ModuleType("torchvision")
    models_mod = types.ModuleType("torchvision.models")
    resnet_mod = types.ModuleType("torchvision.models.resnet")
    for mod in (models_mod, resnet_mod):
        mod.ResNet = ResNet
        mod.BasicBlock = BasicBlock
        mod.Bottleneck = Bottleneck
        mod.resnet18 = _factory([2, 2, 2, 2], BasicBlock)
        mod.resnet34 = _factory([3, 4, 6, 3], BasicBlock)
        mod.resnet50 = _factory([3, 4, 6, 3], Bottleneck)
        mod.resnet101 = _factory([3, 4, 23, 3], Bottleneck)
        mod.resnet152 = _factory([3, 8, 36, 3], Bottleneck)
        mod.model_urls = {}
    models_mod.resnet = resnet_mod
    tv.models = models_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models_mod
    sys.modules["torchvision.models.resnet"] = resnet_mod
