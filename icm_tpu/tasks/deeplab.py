"""DeepLabV3 / V3+ semantic segmentation (NHWC flax).

Behavioral parity with the reference DeepLab package (reference:
``compressai/models/deeplab/modeling.py`` 221 LoC factory over
resnet/mobilenet backbones; ``_deeplab.py`` DeepLabHead / DeepLabHeadV3Plus
/ ASPP): ResNet backbone at output-stride 16 (or 8), ASPP with rates
(6, 12, 18) x (os16) and image pooling, V3+ low-level feature projection
(48ch) + decoder, bilinear upsample to input size. Factory names mirror
``deeplabv3_resnet50`` etc. (modeling.py:134).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import MobileNetV2Backbone, ResNetBackbone


def _resize_bilinear(x, out_hw):
    return jax.image.resize(
        x, (x.shape[0], out_hw[0], out_hw[1], x.shape[-1]), method="bilinear"
    )


class ASPPConv(nn.Module):
    features: int
    dilation: int
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        x = nn.Conv(
            self.features, (3, 3), padding=((d, d), (d, d)),
            kernel_dilation=(d, d), use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=not self.train_bn)(x)
        return nn.relu(x)


class ASPP(nn.Module):
    features: int = 256
    rates: Tuple[int, ...] = (6, 12, 18)
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        res = []
        h = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not self.train_bn)(h)
        res.append(nn.relu(h))
        for r in self.rates:
            res.append(ASPPConv(self.features, r, self.train_bn)(x))
        # image pooling
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.features, (1, 1), use_bias=False)(g)
        g = nn.BatchNorm(use_running_average=not self.train_bn)(g)
        g = nn.relu(g)
        res.append(jnp.broadcast_to(g, res[0].shape))
        h = jnp.concatenate(res, axis=-1)
        h = nn.Conv(self.features, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not self.train_bn)(h)
        return nn.relu(h)


class DeepLabV3(nn.Module):
    num_classes: int = 21
    backbone: str = "resnet50"
    output_stride: int = 16
    plus: bool = False  # V3+ decoder with low-level features
    train_bn: bool = False

    def setup(self):
        if self.backbone == "mobilenetv2":
            self.encoder = MobileNetV2Backbone(
                output_stride=self.output_stride, train_bn=self.train_bn
            )
        elif self.backbone == "xception":
            from .backbones import XceptionBackbone

            self.encoder = XceptionBackbone(
                output_stride=self.output_stride, train_bn=self.train_bn
            )
        elif self.backbone.startswith("hrnetv2"):
            from .backbones import HRNetV2Backbone

            self.encoder = HRNetV2Backbone(
                c=int(self.backbone.split("_")[-1]), train_bn=self.train_bn
            )
        else:
            layers = {
                "resnet18": ("basic", (2, 2, 2, 2)),
                "resnet34": ("basic", (3, 4, 6, 3)),
                "resnet50": ("bottleneck", (3, 4, 6, 3)),
                "resnet101": ("bottleneck", (3, 4, 23, 3)),
            }[self.backbone]
            self.encoder = ResNetBackbone(
                block=layers[0],
                layers=layers[1],
                output_stride=self.output_stride,
                train_bn=self.train_bn,
            )
        # HRNetV2 feeds ASPP at 1/4 resolution -> the reference fixes its
        # rates at (12, 24, 36) regardless of output_stride (modeling.py:19)
        if self.backbone.startswith("hrnetv2"):
            rates = (12, 24, 36)
        else:
            rates = (6, 12, 18) if self.output_stride == 16 else (12, 24, 36)
        self.aspp = ASPP(rates=rates, train_bn=self.train_bn)

    @nn.compact
    def __call__(self, x):
        H, W = x.shape[1:3]
        if self.backbone == "mobilenetv2" or self.backbone == "xception" \
                or self.backbone.startswith("hrnetv2"):
            c2, c5 = self.encoder(x)
        else:
            c2, c3, c4, c5 = self.encoder(x)
        h = self.aspp(c5)
        if self.plus:
            low = nn.Conv(48, (1, 1), use_bias=False, name="project")(c2)
            low = nn.BatchNorm(
                use_running_average=not self.train_bn, name="project_bn"
            )(low)
            low = nn.relu(low)
            h = _resize_bilinear(h, low.shape[1:3])
            h = jnp.concatenate([low, h], axis=-1)
            h = nn.Conv(
                256, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                name="fuse",
            )(h)
            h = nn.BatchNorm(
                use_running_average=not self.train_bn, name="fuse_bn"
            )(h)
            h = nn.relu(h)
        logits = nn.Conv(self.num_classes, (1, 1), name="classifier")(h)
        return _resize_bilinear(logits, (H, W))


def deeplabv3_resnet50(num_classes: int = 21, output_stride: int = 16, **kw):
    return DeepLabV3(
        num_classes=num_classes, backbone="resnet50",
        output_stride=output_stride, **kw,
    )


def _factory(backbone: str, plus: bool):
    def make(num_classes: int = 21, output_stride: int = 16, **kw):
        return DeepLabV3(
            num_classes=num_classes, backbone=backbone,
            output_stride=output_stride, plus=plus, **kw,
        )

    return make


# name -> factory, mirroring the reference modeling.py __dict__ surface
deeplab_models = {
    "deeplabv3_resnet18": _factory("resnet18", False),
    "deeplabv3_resnet34": _factory("resnet34", False),
    "deeplabv3_resnet50": _factory("resnet50", False),
    "deeplabv3_resnet101": _factory("resnet101", False),
    "deeplabv3plus_resnet18": _factory("resnet18", True),
    "deeplabv3plus_resnet34": _factory("resnet34", True),
    "deeplabv3plus_resnet50": _factory("resnet50", True),
    "deeplabv3plus_resnet101": _factory("resnet101", True),
    "deeplabv3_mobilenet": _factory("mobilenetv2", False),
    "deeplabv3plus_mobilenet": _factory("mobilenetv2", True),
    "deeplabv3_xception": _factory("xception", False),
    "deeplabv3plus_xception": _factory("xception", True),
    "deeplabv3_hrnetv2_32": _factory("hrnetv2_32", False),
    "deeplabv3_hrnetv2_48": _factory("hrnetv2_48", False),
    "deeplabv3plus_hrnetv2_32": _factory("hrnetv2_32", True),
    "deeplabv3plus_hrnetv2_48": _factory("hrnetv2_48", True),
}
