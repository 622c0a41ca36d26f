"""ResNet backbones (NHWC, flax) for the ICM task heads.

Behavioral parity with the reference torchvision-style ResNet used by
RetinaNet (reference: ``compressai/models/retinanet/model.py:155-260``,
BasicBlock/Bottleneck with the standard stage layout) and by DeepLab's
backbone with output-stride dilation (reference:
``compressai/models/deeplab/backbone/resnet.py``).

Returns the stage features (C2, C3, C4, C5); heads select what they need.
``output_stride`` < 32 converts later stages to dilated convs (DeepLab).
BatchNorm runs in inference mode by default (these are frozen teacher /
fine-tuned student nets; set ``train_bn=True`` to update statistics).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        d = self.dilation
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((d, d), (d, d)), kernel_dilation=(d, d), use_bias=False,
        )(x)
        out = nn.BatchNorm(use_running_average=not self.train_bn)(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), padding=((d, d), (d, d)),
            kernel_dilation=(d, d), use_bias=False,
        )(out)
        out = nn.BatchNorm(use_running_average=not self.train_bn)(out)
        if self.downsample:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False,
            )(x)
            identity = nn.BatchNorm(use_running_average=not self.train_bn)(
                identity
            )
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output = 4x
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        d = self.dilation
        out = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        out = nn.BatchNorm(use_running_average=not self.train_bn)(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((d, d), (d, d)), kernel_dilation=(d, d), use_bias=False,
        )(out)
        out = nn.BatchNorm(use_running_average=not self.train_bn)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False)(out)
        out = nn.BatchNorm(use_running_average=not self.train_bn)(out)
        if self.downsample:
            identity = nn.Conv(
                self.features * 4, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
            )(x)
            identity = nn.BatchNorm(use_running_average=not self.train_bn)(
                identity
            )
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    block: str = "bottleneck"  # "basic" | "bottleneck"
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    output_stride: int = 32  # 32 (det) | 16 | 8 (deeplab dilation)
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        Block = Bottleneck if self.block == "bottleneck" else BasicBlock

        # stem
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not self.train_bn)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        strides = [1, 2, 2, 2]
        dilations = [1, 1, 1, 1]
        if self.output_stride == 16:
            strides[3], dilations[3] = 1, 2
        elif self.output_stride == 8:
            strides[2], dilations[2] = 1, 2
            strides[3], dilations[3] = 1, 4

        feats = []
        for si, (w, n) in enumerate(zip(widths, self.layers)):
            for bi in range(n):
                stride = strides[si] if bi == 0 else 1
                expansion = 4 if self.block == "bottleneck" else 1
                need_ds = bi == 0 and (
                    stride != 1 or x.shape[-1] != w * expansion
                )
                x = Block(
                    features=w,
                    stride=stride,
                    dilation=dilations[si],
                    downsample=need_ds,
                    train_bn=self.train_bn,
                    name=f"layer{si + 1}_{bi}",
                )(x)
            feats.append(x)
        return feats  # [C2, C3, C4, C5]


def resnet18(**kw):
    return ResNetBackbone(block="basic", layers=(2, 2, 2, 2), **kw)


def resnet34(**kw):
    return ResNetBackbone(block="basic", layers=(3, 4, 6, 3), **kw)


def resnet50(**kw):
    return ResNetBackbone(block="bottleneck", layers=(3, 4, 6, 3), **kw)


def resnet101(**kw):
    return ResNetBackbone(block="bottleneck", layers=(3, 4, 23, 3), **kw)


def resnet152(**kw):
    return ResNetBackbone(block="bottleneck", layers=(3, 8, 36, 3), **kw)


class _InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual block."""

    features: int
    stride: int = 1
    expand: int = 6
    dilation: int = 1
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        hidden = inp * self.expand
        h = x
        if self.expand != 1:
            h = nn.Conv(hidden, (1, 1), use_bias=False)(h)
            h = nn.BatchNorm(use_running_average=not self.train_bn)(h)
            h = nn.relu6(h)
        d = self.dilation
        h = nn.Conv(
            hidden, (3, 3), strides=(self.stride, self.stride),
            padding=((d, d), (d, d)), kernel_dilation=(d, d),
            feature_group_count=hidden, use_bias=False,
        )(h)
        h = nn.BatchNorm(use_running_average=not self.train_bn)(h)
        h = nn.relu6(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not self.train_bn)(h)
        if self.stride == 1 and inp == self.features:
            h = h + x
        return h


class MobileNetV2Backbone(nn.Module):
    """MobileNetV2 feature extractor returning (low_level, out) features
    (reference deeplab/backbone/mobilenetv2.py equivalent)."""

    output_stride: int = 16
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        cfg = [  # t, c, n, s
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
        ]
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not self.train_bn)(x)
        x = nn.relu6(x)
        feats = []
        stride_so_far = 2
        dilation = 1
        for t, c, n, s in cfg:
            for i in range(n):
                stride = s if i == 0 else 1
                if stride_so_far >= self.output_stride and stride > 1:
                    dilation *= stride
                    stride = 1
                else:
                    stride_so_far *= stride if i == 0 else 1
                x = _InvertedResidual(
                    features=c, stride=stride, expand=t,
                    dilation=dilation, train_bn=self.train_bn,
                )(x)
            feats.append(x)
        # low-level = after 2nd stage (24ch, /4); out = final (320ch)
        return feats[1], feats[-1]
