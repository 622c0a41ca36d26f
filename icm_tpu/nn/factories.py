"""Shared CNN transform factories for the CRC/ICM model family.

Behavioral parity with the reference ``baseLayer.py`` factory functions
(reference: ``compressai/models/baseLayer.py:23-221``): WACNN-style conv+
GDN+window-attention encoders/decoders (also 6-channel CRC variants),
split decoders, context-scale decoders, hyper encoder/decoder, and the
shallow per-slice context conv stacks used by the zigzag coders.

All NHWC flax modules; upsampling uses ConvTranspose 'SAME' (2x) like the
reference's deconv (output geometry identical).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax

from .gdn import GDN
from .layers import SubpelConv, Win_noShift_Attention, conv, conv3x3, deconv


class MainCNNEncoder(nn.Module):
    """reference ``mainCNNencoder`` (baseLayer.py:69-80); ``in_ch=6`` gives
    ``CRC_two_mainCNNencoder`` (82-93)."""

    N: int = 192
    M: int = 384

    @nn.compact
    def __call__(self, x):
        N, M = self.N, self.M
        x = conv(N, 5, 2)(x)
        x = GDN(N)(x)
        x = conv(N, 5, 2)(x)
        x = GDN(N)(x)
        x = Win_noShift_Attention(N, num_heads=8, window_size=8, shift_size=4)(x)
        x = conv(N, 5, 2)(x)
        x = GDN(N)(x)
        x = conv(M, 5, 2)(x)
        x = Win_noShift_Attention(M, num_heads=8, window_size=4, shift_size=2)(x)
        return x


class MainCNNDecoder(nn.Module):
    """reference ``mainCNNdecoder`` (baseLayer.py:115-126); ``mid=256``.
    ``in_mult=2`` gives ``CRC_two_mainCNNdecoder`` (128-139)."""

    N: int = 192
    M: int = 384
    mid: int = 256
    out_ch: int = 3
    in_mult: int = 1

    @nn.compact
    def __call__(self, y):
        N, M, mid = self.N, self.M, self.mid
        y = Win_noShift_Attention(
            M * self.in_mult, num_heads=8, window_size=4, shift_size=2
        )(y)
        y = deconv(N, 5, 2)(y)
        y = GDN(N, inverse=True)(y)
        y = deconv(mid, 5, 2)(y)
        y = GDN(mid, inverse=True)(y)
        y = Win_noShift_Attention(mid, num_heads=8, window_size=8, shift_size=4)(y)
        y = deconv(N, 5, 2)(y)
        y = GDN(N, inverse=True)(y)
        y = deconv(self.out_ch, 5, 2)(y)
        return y


class MainCNNDecoderPart1(nn.Module):
    """reference ``mainCNNdecoderPart1`` (baseLayer.py:95-106): first half
    of the decoder, output 256ch at 1/4 scale."""

    N: int = 192
    M: int = 384
    mid: int = 256

    @nn.compact
    def __call__(self, y):
        N, M, mid = self.N, self.M, self.mid
        y = Win_noShift_Attention(M, num_heads=8, window_size=4, shift_size=2)(y)
        y = deconv(N, 5, 2)(y)
        y = GDN(N, inverse=True)(y)
        y = deconv(mid, 5, 2)(y)
        y = GDN(mid, inverse=True)(y)
        y = Win_noShift_Attention(mid, num_heads=8, window_size=8, shift_size=4)(y)
        return y


class MainCNNDecoderPart2(nn.Module):
    """reference ``mainCNNdecoderPart2`` (baseLayer.py:108-113)."""

    N: int = 192
    mid: int = 256
    out_ch: int = 3

    @nn.compact
    def __call__(self, h):
        h = deconv(self.N, 5, 2)(h)
        h = GDN(self.N, inverse=True)(h)
        return deconv(self.out_ch, 5, 2)(h)


class ContextScale1(nn.Module):
    """reference ``mainCNNcontextScale1`` (baseLayer.py:142-153): full
    decoder to a 3-channel image-scale conditioning signal."""

    N: int = 192
    M: int = 384
    mid: int = 256
    out_ch: int = 3

    @nn.compact
    def __call__(self, y):
        return MainCNNDecoder(self.N, self.M, self.mid, self.out_ch)(y)


class ContextScale2(nn.Module):
    """reference ``mainCNNcontextScale2`` (baseLayer.py:154-165): partial
    decoder to an N-channel 1/4-scale conditioning signal."""

    N: int = 192
    M: int = 384

    @nn.compact
    def __call__(self, y):
        y = Win_noShift_Attention(self.M, num_heads=8, window_size=4, shift_size=2)(y)
        y = deconv(self.N, 3, 2)(y)
        y = GDN(self.N, inverse=True)(y)
        return deconv(self.N, 3, 2)(y)


class HyperEncoder384(nn.Module):
    """reference ``hyperEncoder`` (baseLayer.py:167-178): 384->192, /4."""

    widths: Tuple[int, ...] = (384, 336, 288, 240, 192)

    @nn.compact
    def __call__(self, y):
        strides = (1, 1, 2, 1, 2)
        for i, (w, s) in enumerate(zip(self.widths, strides)):
            if i > 0:
                y = jax.nn.gelu(y, approximate=False)
            y = conv3x3(w, stride=s)(y)
        return y


class HyperMean384(nn.Module):
    """reference ``hyperMean`` (baseLayer.py:180-191): 192->384, x4.
    ``extra_convs`` appends GELU+3x3-conv pairs (the human-layer hyper
    decoders of stf9/12/14 add five, reference stf9.py:806-848)."""

    widths: Tuple[int, ...] = (240, 288, 336, 384, 384)
    extra_convs: int = 0

    @nn.compact
    def __call__(self, z):
        w = self.widths
        z = conv3x3(w[0])(z)
        z = jax.nn.gelu(z, approximate=False)
        z = SubpelConv(w[1], r=2)(z)
        z = jax.nn.gelu(z, approximate=False)
        z = conv3x3(w[2])(z)
        z = jax.nn.gelu(z, approximate=False)
        z = SubpelConv(w[3], r=2)(z)
        z = jax.nn.gelu(z, approximate=False)
        z = conv3x3(w[4])(z)
        for _ in range(self.extra_convs):
            z = jax.nn.gelu(z, approximate=False)
            z = conv(w[4], kernel_size=3, stride=1)(z)
        return z


class ShallowCC(nn.Module):
    """Shallow per-slice context stack (reference ``hyperContextMean`` /
    ``hyperContextLRP``, baseLayer.py:192-221): 3 convs 224->64->out."""

    out_ch: int
    widths: Tuple[int, ...] = (224, 64)

    @nn.compact
    def __call__(self, x):
        for ch in self.widths:
            x = conv(ch, kernel_size=3, stride=1)(x)
            x = jax.nn.gelu(x, approximate=False)
        return conv(self.out_ch, kernel_size=3, stride=1)(x)
