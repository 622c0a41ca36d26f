"""Xception and HRNetV2 segmentation backbones (NHWC flax).

Behavioral parity with the reference DeepLab backbones:

  - ``XceptionBackbone`` (reference
    ``compressai/models/deeplab/backbone/xception.py:45-230``): aligned
    Xception-65 trunk — VALID-padded 3x3 stem, 12 separable-conv blocks
    with 1x1-conv skips and max-pool strides, strides replaced by
    dilation per ``replace_stride_with_dilation`` derived from the
    output stride (modeling.py:60-67). Returns (low_level, out) =
    (block1 @128ch 1/4, conv4 @2048ch).
  - ``HRNetV2Backbone`` (reference
    ``backbone/hrnetv2.py:93-310``, wiring ``modeling.py:10-31``):
    stride-4 stem + 4 bottlenecks, then 2/3/4-branch multi-resolution
    stages with all-pairs fusion (1x1+nearest-upsample for coarser
    inputs, strided 3x3 chains for finer inputs); the V2 head
    concatenates all branches at 1/4 resolution, so the segmentation
    output stride is 4 and ASPP rates are (12, 24, 36). Returns
    (low_level, out) = (layer1 @256ch 1/4, concat @15c).

Both are TPU-shaped: NHWC, depthwise convs via ``feature_group_count``,
static branch lists, `jax.image.resize` for the fixed 2^k fusions.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import BasicBlock, Bottleneck

__all__ = ["XceptionBackbone", "HRNetV2Backbone"]


class SeparableConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 (xception.py:45-56)."""

    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        x = nn.Conv(
            x.shape[-1], (3, 3), padding=((d, d), (d, d)),
            kernel_dilation=(d, d), feature_group_count=x.shape[-1],
            use_bias=False,
        )(x)
        return nn.Conv(self.features, (1, 1), use_bias=False)(x)


class XceptionBlock(nn.Module):
    """Residual separable-conv block (xception.py:58-106): `reps`
    relu->sepconv->BN units (first unit grows channels when
    ``grow_first``), optional leading relu, max-pool stride, and a
    1x1-conv skip whenever channels or stride change."""

    features: int
    reps: int
    stride: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dilation: int = 1
    train_bn: bool = False

    @nn.compact
    def __call__(self, x):
        inp = x
        widths = (
            [self.features] * self.reps
            if self.grow_first
            else [x.shape[-1]] * (self.reps - 1) + [self.features]
        )
        for i, w in enumerate(widths):
            if i > 0 or self.start_with_relu:
                x = nn.relu(x)
            x = SeparableConv(w, self.dilation)(x)
            x = nn.BatchNorm(use_running_average=not self.train_bn)(x)
        if self.stride != 1:
            x = nn.max_pool(
                x, (3, 3), strides=(self.stride, self.stride),
                padding=((1, 1), (1, 1)),
            )
        if self.features != inp.shape[-1] or self.stride != 1:
            skip = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False,
            )(inp)
            skip = nn.BatchNorm(use_running_average=not self.train_bn)(skip)
        else:
            skip = inp
        return x + skip


class XceptionBackbone(nn.Module):
    output_stride: int = 16
    train_bn: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        # strides -> dilation, per modeling.py:60-67
        if self.output_stride == 8:
            dilate = (False, False, True, True)
        else:
            dilate = (False, False, False, True)
        bn = self.train_bn

        # stem: VALID-padded like the torch convs with padding=0
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="VALID",
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not bn)(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), padding="VALID", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not bn)(x)
        x = nn.relu(x)

        dilation = 1

        def entry(feats, dil_flag, **kw):
            nonlocal dilation
            stride = 2
            if dil_flag:
                dilation *= stride
                stride = 1
            return XceptionBlock(
                feats, reps=2, stride=stride, dilation=dilation,
                train_bn=bn, **kw,
            )

        x = entry(128, dilate[0], start_with_relu=False)(x)
        low_level = x  # block1, 1/4 resolution (modeling.py:73)
        x = entry(256, dilate[1])(x)
        x = entry(728, dilate[2])(x)
        for _ in range(8):  # middle flow blocks 4-11
            x = XceptionBlock(
                728, reps=3, stride=1, dilation=dilation, train_bn=bn
            )(x)
        # exit flow: block12 shrinks last (grow_first=False)
        nonloc_stride = 2
        if dilate[3]:
            dilation *= nonloc_stride
            nonloc_stride = 1
        x = XceptionBlock(
            1024, reps=2, stride=nonloc_stride, grow_first=False,
            dilation=dilation, train_bn=bn,
        )(x)
        x = SeparableConv(1536, dilation)(x)
        x = nn.BatchNorm(use_running_average=not bn)(x)
        x = nn.relu(x)
        x = SeparableConv(2048, dilation)(x)
        x = nn.BatchNorm(use_running_average=not bn)(x)
        return low_level, x


class _HRStage(nn.Module):
    """One HRNet stage module (hrnetv2.py:93-171): 4 BasicBlocks per
    branch, then every output branch sums contributions from every input
    branch — identity on the diagonal, 1x1 conv + nearest 2^k upsample
    from coarser branches, strided 3x3 conv chains from finer ones."""

    c: int
    num_branches: int
    train_bn: bool = False

    @nn.compact
    def __call__(self, xs):
        bn = self.train_bn
        xs = list(xs)
        for i in range(self.num_branches):
            for _ in range(4):
                xs[i] = BasicBlock(self.c * 2 ** i, train_bn=bn)(xs[i])

        fused = []
        for o in range(self.num_branches):
            acc = xs[o]
            for i in range(self.num_branches):
                if i == o:
                    continue
                h = xs[i]
                if i > o:  # coarser -> 1x1 conv, BN, nearest upsample
                    h = nn.Conv(self.c * 2 ** o, (1, 1), use_bias=False)(h)
                    h = nn.BatchNorm(use_running_average=not bn)(h)
                    tgt = xs[o].shape
                    h = jax.image.resize(
                        h, (h.shape[0], tgt[1], tgt[2], h.shape[-1]),
                        method="nearest",
                    )
                else:  # finer -> chain of strided 3x3 convs
                    for step in range(o - i):
                        last = step == o - i - 1
                        w = self.c * 2 ** (o if last else i)
                        h = nn.Conv(
                            w, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), use_bias=False,
                        )(h)
                        h = nn.BatchNorm(use_running_average=not bn)(h)
                        if not last:
                            h = nn.relu(h)
                acc = acc + h
            fused.append(nn.relu(acc))
        return fused


class HRNetV2Backbone(nn.Module):
    c: int = 48  # width: hrnetv2_48 / hrnetv2_32
    num_blocks: Tuple[int, ...] = (1, 4, 3)  # stage2/3/4 repeats
    train_bn: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        bn = self.train_bn
        # stem: two stride-2 3x3 convs (hrnetv2.py:178-183)
        for _ in range(2):
            x = nn.Conv(64, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not bn)(x)
            x = nn.relu(x)
        # layer1: 4 bottlenecks @ 64 (output 256ch, 1/4 res)
        x = Bottleneck(64, downsample=True, train_bn=bn)(x)
        for _ in range(3):
            x = Bottleneck(64, train_bn=bn)(x)
        low_level = x

        def transition_new(h, width):
            h = nn.Conv(width, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=False)(h)
            h = nn.BatchNorm(use_running_average=not bn)(h)
            return nn.relu(h)

        # transition1: full-res branch (3x3 s1) + half-res branch (3x3 s2)
        b0 = nn.Conv(self.c, (3, 3), padding=((1, 1), (1, 1)),
                     use_bias=False)(x)
        b0 = nn.BatchNorm(use_running_average=not bn)(b0)
        xs = [nn.relu(b0), transition_new(x, self.c * 2)]

        for stage_idx, reps in enumerate(self.num_blocks):
            nb = stage_idx + 2
            for _ in range(reps):
                xs = _HRStage(self.c, nb, train_bn=bn)(xs)
            if stage_idx < len(self.num_blocks) - 1:
                xs.append(transition_new(xs[-1], self.c * 2 ** nb))

        # V2 head: upsample every branch to 1/4 and concat
        tgt = xs[0].shape
        ups = [xs[0]] + [
            jax.image.resize(
                h, (h.shape[0], tgt[1], tgt[2], h.shape[-1]),
                method="bilinear",
            )
            for h in xs[1:]
        ]
        return low_level, jnp.concatenate(ups, axis=-1)
