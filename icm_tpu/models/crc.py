"""Conditional residual coding family: stf9/stf11, stf12, stf13, stf14.

Machine-vision base layer (CNN analysis + zigzag ChARM coder + split
decoder) with human-vision enhancement layers conditioned on the machine
latent, and (stf13) a segmentation layer in between.

Behavioral parity:
  - stf9 ``SymmetricalTransFormer6`` == stf11 ``ConditionalResidualCoding``
    (verified identical in SURVEY.md §2.2; reference stf9.py:387-1204):
    machine layer with LRP computed but NOT applied (stf9.py:1094-1106),
    split decoder g_s1/g_s2, human layer: decode-side conditioning image
    ``human_g_s2(y_hat)`` concat with input -> conv encoder -> own
    hyper (one-shot GaussianConditional, no slice context) -> decoder
    conditioned on ``human_context_decoder(y_hat)``.
  - stf12 ``ConditionalResidualCoding2`` (stf12.py:387-1259): two-stage
    residual encoder (residual1 = x - decoded image at image scale,
    residual2 = human_y_1 - conditionalScale2 at 1/4 scale), two context
    decoders into a split human decoder with residual adds.
  - stf13 ``ConditionalResidualCoding3`` (stf13.py:11-747): three layers —
    machine base, segmentation layer conditioned on base recon, human
    layer conditioned on BOTH via learned softmax masks
    (generate_mask_scale1/2, stf13.py:203-219, 641-699).
  - stf14 ``ResidualCoding`` (stf14.py:387-1204): plain residual ablation
    (human layer encodes residual1 = decoded - x directly; recon adds it
    back).

Note on likelihoods: the reference's returned ``likelihoods`` dict contains
ONLY the human layer's y/z (its training stage optimizes that layer); the
machine (and seg) layers' likelihoods are exposed here additionally under
``machine_likelihoods`` / ``seg_likelihoods`` so the RD loss can include
them when training from scratch. The reference also computes the human/seg
z-likelihoods on the WRONG tensor (the machine ``z`` — stf9.py:1137,
stf13.py:570,677); per SURVEY.md §0 we reproduce the behavioral surface,
not the bugs: likelihoods here use each layer's own z.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy import EntropyBottleneck, GaussianConditional
from ..nn.factories import (
    ContextScale1,
    ContextScale2,
    HyperEncoder384,
    HyperMean384,
    MainCNNDecoder,
    MainCNNDecoderPart1,
    MainCNNDecoderPart2,
    MainCNNEncoder,
)
from ..nn.layers import Win_noShift_Attention, conv, conv3x3, deconv, SubpelConv
from ..ops import ste_round
from .base import CompressionModel
from .zigzag_coder import ZigzagCharmCoder


class _ConvStack(nn.Module):
    """n x (3x3 conv s1 + GELU except last) at a fixed width."""

    width: int
    depth: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            if i > 0:
                x = jax.nn.gelu(x, approximate=False)
            x = conv(self.width, kernel_size=3, stride=1)(x)
        return x


class _DeconvHyperDec(nn.Module):
    """stf13-style human hyper decoder: conv3x3 -> deconv x2 (reference
    stf13.py:223-267)."""

    widths: Tuple[int, ...] = (240, 288, 384)

    @nn.compact
    def __call__(self, z):
        z = conv3x3(self.widths[0])(z)
        z = jax.nn.gelu(z, approximate=False)
        z = deconv(self.widths[1], 3, 2)(z)
        z = jax.nn.gelu(z, approximate=False)
        return deconv(self.widths[2], 3, 2)(z)


class _SimpleHyper(nn.Module):
    """One-shot human-layer hyper: EB on z, GC with full-tensor mean/scale
    (no slice context) — reference stf9.py:1136-1150."""

    extra_convs: int = 5
    enc_widths: Tuple[int, ...] = (384, 336, 288, 240, 192)
    dec_widths: Tuple[int, ...] = (240, 288, 336, 384, 384)
    deconv_style: bool = False  # stf13 variant (stf13.py:223-267)

    def setup(self):
        self.h_a = HyperEncoder384(self.enc_widths)
        if self.deconv_style:
            self.h_mean_s = _DeconvHyperDec(
                (self.dec_widths[0], self.dec_widths[1], self.dec_widths[-1])
            )
            self.h_scale_s = _DeconvHyperDec(
                (self.dec_widths[0], self.dec_widths[1], self.dec_widths[-1])
            )
        else:
            self.h_mean_s = HyperMean384(
                self.dec_widths, extra_convs=self.extra_convs
            )
            self.h_scale_s = HyperMean384(
                self.dec_widths, extra_convs=self.extra_convs
            )
        self.entropy_bottleneck = EntropyBottleneck(self.enc_widths[-1])
        self.gaussian_conditional = GaussianConditional()

    def code(self, y, training: bool = True):
        z = self.h_a(y)
        _, z_lik = self.entropy_bottleneck(z, training=training)
        z_off = self.entropy_bottleneck.medians()[:, 0, 0]
        z_hat = ste_round(z - z_off) + z_off
        scales = self.h_scale_s(z_hat)
        means = self.h_mean_s(z_hat)
        _, y_lik = self.gaussian_conditional(y, scales, means, training=training)
        y_hat = ste_round(y - means) + means
        return y_hat, {"y": y_lik, "z": z_lik}


class _MachineLayer(nn.Module):
    """CNN analysis + zigzag coder + split decoder (shared by the CRC
    family and the ICM codecs)."""

    N: int = 192
    M: int = 384
    num_slices: int = 6
    max_support: int = 12
    support_num: int = 24
    apply_lrp: bool = True
    hyper_enc_widths: Tuple[int, ...] = (384, 336, 288, 240, 192)
    hyper_dec_widths: Tuple[int, ...] = (240, 288, 336, 384, 384)
    cc_widths: Tuple[int, ...] = (224, 64)
    scan_charm: bool = False  # lax.scan AR loop (see ZigzagCharmCoder.scan)

    def setup(self):
        self.g_a = MainCNNEncoder(self.N, self.M)
        self.coder = ZigzagCharmCoder(
            scan=self.scan_charm,
            latent_dim=self.M,
            num_slices=self.num_slices,
            max_support=self.max_support,
            support_num=self.support_num,
            apply_lrp=self.apply_lrp,
            hyper_enc_widths=self.hyper_enc_widths,
            hyper_dec_widths=self.hyper_dec_widths,
            cc_widths=self.cc_widths,
        )

    def encode_code(self, x, training: bool = True):
        y = self.g_a(x)
        y_hat, likelihoods = self.coder.code(y, training=training)
        return y_hat, likelihoods


class _HumanEncoder(nn.Module):
    """stf9 human_g_a (stf9.py:770-780): 4x stride-2 convs, GELU between."""

    N: int = 192
    M: int = 384

    @nn.compact
    def __call__(self, h):
        for w, last in ((self.N, False), (self.N, False), (self.N, False),
                        (self.M, True)):
            h = conv(w, kernel_size=5, stride=2)(h)
            if not last:
                h = jax.nn.gelu(h, approximate=False)
        return h


class _HumanDecoder(nn.Module):
    """stf9 human_g_s (stf9.py:782-793): 4x stride-2 deconvs, GELU between."""

    N: int = 192
    out_ch: int = 3

    @nn.compact
    def __call__(self, d):
        for w, last in ((self.N, False), (self.N, False), (self.N, False),
                        (self.out_ch, True)):
            d = deconv(w, 5, 2)(d)
            if not last:
                d = jax.nn.gelu(d, approximate=False)
        return d


class ConditionalResidualCoding(CompressionModel):
    """stf9 / stf11 (CRC v1). Registry names: "stf9", "stf11"."""

    N: int = 192
    M: int = 384
    num_slices: int = 6
    max_support: int = 12
    support_num: int = 24
    hyper_enc_widths: Tuple[int, ...] = (384, 336, 288, 240, 192)
    hyper_dec_widths: Tuple[int, ...] = (240, 288, 336, 384, 384)
    # reference stf9/12/14 use their own 5-conv context stacks
    # (stf9.py inline: 224->176->128->64->out; stf13 uses the
    # 3-conv baseLayer.hyperContextMean variant instead)
    cc_widths: Tuple[int, ...] = (224, 176, 128, 64)
    mid: int = 256
    scan_charm: bool = False

    def setup(self):
        self.machine = _MachineLayer(
            self.N, self.M, self.num_slices, self.max_support,
            self.support_num, scan_charm=self.scan_charm, apply_lrp=False,
            hyper_enc_widths=self.hyper_enc_widths,
            hyper_dec_widths=self.hyper_dec_widths,
            cc_widths=self.cc_widths,
        )
        self.g_s1 = MainCNNDecoderPart1(self.N, self.M, self.mid)
        self.g_s2 = MainCNNDecoderPart2(self.N, self.mid)
        self.human_g_s2 = MainCNNDecoder(self.N, self.M, self.mid)  # decode-side cond image
        self.human_g_a = _HumanEncoder(self.N, self.M)
        self.human_g_s = _HumanDecoder(self.N)
        self.human_hyper = _SimpleHyper(
            enc_widths=self.hyper_enc_widths, dec_widths=self.hyper_dec_widths
        )
        self.human_context_decoder = _ConvStack(self.M, 5)

    def __call__(self, x, training: bool = True):
        y_hat, m_lik = self.machine.encode_code(x, training=training)
        h_hat1 = self.g_s1(y_hat)
        decompress_image = self.g_s2(h_hat1)

        # human enhancement layer (stf9.py:1132-1154)
        human_y, _ = self.human_encode(x, y_hat)
        human_y_hat, h_lik = self.human_hyper.code(human_y, training=training)
        human_deimage = self.human_synthesize(human_y_hat, y_hat)

        return {
            "x_hat": human_deimage,
            "decompressedImage": human_deimage,
            "machine_x_hat": decompress_image,
            "likelihoods": h_lik,
            "machine_likelihoods": m_lik,
        }

    # --- coder-facing stages (crc_codec.CRCCodec) ---------------------------
    def human_encode(self, x, y_hat):
        cond_image = self.human_g_s2(y_hat)
        human_y = self.human_g_a(jnp.concatenate([x, cond_image], axis=-1))
        return human_y, self.human_hyper.h_a(human_y)

    def human_eb_medians(self):
        return self.human_hyper.entropy_bottleneck.medians()[:, 0, 0]

    def human_synthesize(self, human_y_hat, y_hat):
        context = self.human_context_decoder(y_hat)
        return self.human_g_s(jnp.concatenate([human_y_hat, context], axis=-1))

    def aux_loss(self):
        return (
            self.machine.coder.entropy_bottleneck.aux_loss()
            + self.human_hyper.entropy_bottleneck.aux_loss()
        )

    def eb_dict(self):
        return {
            "entropy_bottleneck": self.machine.coder.entropy_bottleneck,
            "entropy_bottleneck_human": self.human_hyper.entropy_bottleneck,
        }


class ResidualCoding(CompressionModel):
    """stf14: plain additive-residual ablation. Registry name: "stf14"."""

    N: int = 192
    M: int = 384
    num_slices: int = 6
    max_support: int = 12
    support_num: int = 24
    hyper_enc_widths: Tuple[int, ...] = (384, 336, 288, 240, 192)
    hyper_dec_widths: Tuple[int, ...] = (240, 288, 336, 384, 384)
    # reference stf9/12/14 use their own 5-conv context stacks
    # (stf9.py inline: 224->176->128->64->out; stf13 uses the
    # 3-conv baseLayer.hyperContextMean variant instead)
    cc_widths: Tuple[int, ...] = (224, 176, 128, 64)
    mid: int = 256
    scan_charm: bool = False

    def setup(self):
        self.machine = _MachineLayer(
            self.N, self.M, self.num_slices, self.max_support,
            self.support_num, scan_charm=self.scan_charm, apply_lrp=False,
            hyper_enc_widths=self.hyper_enc_widths,
            hyper_dec_widths=self.hyper_dec_widths,
            cc_widths=self.cc_widths,
        )
        self.g_s1 = MainCNNDecoderPart1(self.N, self.M, self.mid)
        self.g_s2 = MainCNNDecoderPart2(self.N, self.mid)
        self.human_g_s2 = MainCNNDecoder(self.N, self.M, self.mid)
        self.human_g_a = _HumanEncoder(self.N, self.M)
        self.human_g_s = _HumanDecoder(self.N)
        self.human_hyper = _SimpleHyper(
            enc_widths=self.hyper_enc_widths, dec_widths=self.hyper_dec_widths
        )

    def __call__(self, x, training: bool = True):
        y_hat, m_lik = self.machine.encode_code(x, training=training)
        decompress_image = self.g_s2(self.g_s1(y_hat))

        cond_image = self.human_g_s2(y_hat)
        residual1 = cond_image - x  # reference stf14.py:1133
        human_y, _ = self.human_encode(x, y_hat)
        human_y_hat, h_lik = self.human_hyper.code(human_y, training=training)
        # reference training path adds the ENCODER-side residual back
        # (stf14.py:1157) — kept for parity; the decodable reconstruction
        # is human_synthesize below (x_hat = cond - r_hat).
        human_deimage = self.human_g_s(human_y_hat) + residual1

        return {
            "x_hat": human_deimage,
            "decompressedImage": human_deimage,
            "machine_x_hat": decompress_image,
            "likelihoods": h_lik,
            "machine_likelihoods": m_lik,
        }

    # --- coder-facing stages: the decodable interpretation ------------------
    def human_encode(self, x, y_hat):
        cond_image = self.human_g_s2(y_hat)
        residual1 = cond_image - x
        human_y = self.human_g_a(residual1)
        return human_y, self.human_hyper.h_a(human_y)

    def human_eb_medians(self):
        return self.human_hyper.entropy_bottleneck.medians()[:, 0, 0]

    def human_synthesize(self, human_y_hat, y_hat):
        """Decoder-side reconstruction: x_hat = cond - r_hat (the reference
        training formula adds the encoder-side residual, stf14.py:1157,
        which a real decoder cannot have)."""
        cond_image = self.human_g_s2(y_hat)
        return cond_image - self.human_g_s(human_y_hat)

    def aux_loss(self):
        return (
            self.machine.coder.entropy_bottleneck.aux_loss()
            + self.human_hyper.entropy_bottleneck.aux_loss()
        )

    def eb_dict(self):
        return {
            "entropy_bottleneck": self.machine.coder.entropy_bottleneck,
            "entropy_bottleneck_human": self.human_hyper.entropy_bottleneck,
        }


class _StrideConvPair(nn.Module):
    """conv k,s2 + GELU + conv k,s2 (stf12 human_g_a1 / stf13 seg_g_a1)."""

    N: int
    kernel: int = 3

    @nn.compact
    def __call__(self, h):
        h = conv(self.N, kernel_size=self.kernel, stride=2)(h)
        h = jax.nn.gelu(h, approximate=False)
        return conv(self.N, kernel_size=self.kernel, stride=2)(h)


class _EncTail(nn.Module):
    """conv N,5,2 + GELU + conv M,5,2 + GELU [+ WinAttn]
    (stf12 human_g_a2 / stf13 seg_g_a2)."""

    N: int
    M: int
    with_attn: bool = True

    @nn.compact
    def __call__(self, h):
        h = conv(self.N, kernel_size=5, stride=2)(h)
        h = jax.nn.gelu(h, approximate=False)
        h = conv(self.M, kernel_size=5, stride=2)(h)
        h = jax.nn.gelu(h, approximate=False)
        if self.with_attn:
            h = Win_noShift_Attention(
                self.M, num_heads=8, window_size=4, shift_size=2
            )(h)
        return h


class _DecHead(nn.Module):
    """WinAttn(2M) + GELU + deconv N + GELU + deconv N (stf12 human_g_s1)."""

    N: int
    M: int

    @nn.compact
    def __call__(self, d):
        d = Win_noShift_Attention(
            2 * self.M, num_heads=8, window_size=4, shift_size=2
        )(d)
        d = jax.nn.gelu(d, approximate=False)
        d = deconv(self.N, 3, 2)(d)
        d = jax.nn.gelu(d, approximate=False)
        return deconv(self.N, 3, 2)(d)


class _DecTail(nn.Module):
    """deconv N + GELU + conv N s1 + GELU + deconv 3 (stf12/13 human_g_s2)."""

    N: int
    out_ch: int = 3

    @nn.compact
    def __call__(self, d):
        d = deconv(self.N, 3, 2)(d)
        d = jax.nn.gelu(d, approximate=False)
        d = conv(self.N, kernel_size=3, stride=1)(d)
        d = jax.nn.gelu(d, approximate=False)
        return deconv(self.out_ch, 3, 2)(d)


class _SubpelContext(nn.Module):
    """conv M x2 + subpel x2 -> N at image scale (stf12
    human_context_decoder2, stf12.py:888-901)."""

    N: int
    M: int

    @nn.compact
    def __call__(self, y_hat):
        c = conv(self.M, kernel_size=3, stride=1)(y_hat)
        c = jax.nn.gelu(c, approximate=False)
        c = conv(self.M, kernel_size=3, stride=1)(c)
        c = jax.nn.gelu(c, approximate=False)
        c = SubpelConv(self.N, r=2)(c)
        c = jax.nn.gelu(c, approximate=False)
        return SubpelConv(self.N, r=2)(c)


class ConditionalResidualCoding2(CompressionModel):
    """stf12 (CRC v2): two-stage residual human encoder. Registry: "stf12"."""

    N: int = 192
    M: int = 384
    num_slices: int = 6
    max_support: int = 12
    support_num: int = 24
    hyper_enc_widths: Tuple[int, ...] = (384, 336, 288, 240, 192)
    hyper_dec_widths: Tuple[int, ...] = (240, 288, 336, 384, 384)
    # reference stf9/12/14 use their own 5-conv context stacks
    # (stf9.py inline: 224->176->128->64->out; stf13 uses the
    # 3-conv baseLayer.hyperContextMean variant instead)
    cc_widths: Tuple[int, ...] = (224, 176, 128, 64)
    mid: int = 256
    scan_charm: bool = False

    def setup(self):
        self.machine = _MachineLayer(
            self.N, self.M, self.num_slices, self.max_support,
            self.support_num, scan_charm=self.scan_charm, apply_lrp=False,
            hyper_enc_widths=self.hyper_enc_widths,
            hyper_dec_widths=self.hyper_dec_widths,
            cc_widths=self.cc_widths,
        )
        self.g_s1 = MainCNNDecoderPart1(self.N, self.M, self.mid)
        self.g_s2 = MainCNNDecoderPart2(self.N, self.mid)
        self.human_g_enc2 = ContextScale1(self.N, self.M, self.mid)  # image-scale cond
        self.human_g_enc3 = ContextScale2(self.N, self.M)  # 1/4-scale cond
        self.human_hyper = _SimpleHyper(
            enc_widths=self.hyper_enc_widths, dec_widths=self.hyper_dec_widths
        )
        # reference stf12 human_context_decoder is a 3-conv stack
        # (stf12.py — 6 tensors), unlike stf9's 5-conv version
        self.human_context_decoder = _ConvStack(self.M, 3)
        self.human_g_a1 = _StrideConvPair(self.N, kernel=3)
        self.human_g_a2 = _EncTail(self.N, self.M, with_attn=True)
        self.human_g_s1 = _DecHead(self.N, self.M)
        self.human_g_s2 = _DecTail(self.N)
        self.human_context_decoder2 = _SubpelContext(self.N, self.M)

    def __call__(self, x, training: bool = True):
        y_hat, m_lik = self.machine.encode_code(x, training=training)
        decompress_image = self.g_s2(self.g_s1(y_hat))

        human_y, _ = self.human_encode(x, y_hat)
        human_y_hat, h_lik = self.human_hyper.code(human_y, training=training)
        human_deimage = self.human_synthesize(human_y_hat, y_hat)

        return {
            "x_hat": human_deimage,
            "decompressedImage": human_deimage,
            "machine_x_hat": decompress_image,
            "likelihoods": h_lik,
            "machine_likelihoods": m_lik,
        }

    # --- coder-facing stages (crc_codec) ------------------------------------
    def human_encode(self, x, y_hat):
        cond_img = self.human_g_enc2(y_hat)
        cond_quarter = self.human_g_enc3(y_hat)
        residual1 = x - cond_img
        human_y_1 = self.human_g_a1(jnp.concatenate([x, residual1], axis=-1))
        residual2 = human_y_1 - cond_quarter
        human_y = self.human_g_a2(
            jnp.concatenate([human_y_1, residual2], axis=-1)
        )
        return human_y, self.human_hyper.h_a(human_y)

    def human_eb_medians(self):
        return self.human_hyper.entropy_bottleneck.medians()[:, 0, 0]

    def human_synthesize(self, human_y_hat, y_hat):
        cond_img = self.human_g_enc2(y_hat)
        cond_quarter = self.human_g_enc3(y_hat)
        context = self.human_context_decoder(y_hat)
        d1 = self.human_g_s1(
            jnp.concatenate([human_y_hat, context], axis=-1)
        ) + cond_quarter
        context2 = self.human_context_decoder2(y_hat)
        return self.human_g_s2(
            jnp.concatenate([d1, context2], axis=-1)
        ) + cond_img

    def aux_loss(self):
        return (
            self.machine.coder.entropy_bottleneck.aux_loss()
            + self.human_hyper.entropy_bottleneck.aux_loss()
        )

    def eb_dict(self):
        return {
            "entropy_bottleneck": self.machine.coder.entropy_bottleneck,
            "entropy_bottleneck_human": self.human_hyper.entropy_bottleneck,
        }


class _DeconvPair(nn.Module):
    """deconv N + GELU + deconv N (stf13 human_g_s1_2)."""

    N: int

    @nn.compact
    def __call__(self, d):
        d = deconv(self.N, 3, 2)(d)
        d = jax.nn.gelu(d, approximate=False)
        return deconv(self.N, 3, 2)(d)


class _DeconvContext(nn.Module):
    """conv N s1 + GELU + deconv N x2 (stf13 human_context_decoder2_2/4,
    stf13.py:276-305): M-latent -> N at image scale."""

    N: int

    @nn.compact
    def __call__(self, y_hat):
        c = conv(self.N, kernel_size=3, stride=1)(y_hat)
        c = jax.nn.gelu(c, approximate=False)
        c = deconv(self.N, 3, 2)(c)
        c = jax.nn.gelu(c, approximate=False)
        return deconv(self.N, 3, 2)(c)


class _MaskNet(nn.Module):
    """conv3x3 stack + channel softmax (stf13 generate_mask_scale1/2,
    stf13.py:203-219)."""

    widths: Tuple[int, ...]

    @nn.compact
    def __call__(self, h):
        for i, w in enumerate(self.widths):
            if i > 0:
                h = jax.nn.gelu(h, approximate=False)
            h = conv3x3(w)(h)
        return jax.nn.softmax(h, axis=-1)


class ConditionalResidualCoding3(CompressionModel):
    """stf13 (CRC v3, three layers with masked fusion). Registry: "stf13".

    Machine base -> segmentation layer (own zigzag coder, conditioned on
    base recon) -> human layer conditioned on BOTH via learned softmax
    masks (reference stf13.py:445-699)."""

    N: int = 192
    M: int = 384
    num_slices: int = 6
    max_support: int = 12
    support_num: int = 24
    hyper_enc_widths: Tuple[int, ...] = (384, 336, 288, 240, 192)
    hyper_dec_widths: Tuple[int, ...] = (240, 288, 336, 384, 384)
    cc_widths: Tuple[int, ...] = (224, 64)
    mid: int = 256
    scan_charm: bool = False

    def setup(self):
        N, M = self.N, self.M
        self.machine = _MachineLayer(
            N, M, self.num_slices, self.max_support, self.support_num,
            scan_charm=self.scan_charm,
            apply_lrp=True,
            hyper_enc_widths=self.hyper_enc_widths,
            hyper_dec_widths=self.hyper_dec_widths,
            cc_widths=self.cc_widths,
        )
        self.g_s = MainCNNDecoder(N, M, self.mid)
        # segmentation layer
        self.seg_g_enc2 = ContextScale1(N, M, self.mid)
        self.seg_g_enc3 = ContextScale2(N, M)
        self.seg_coder = ZigzagCharmCoder(
            scan=self.scan_charm,
            latent_dim=M, num_slices=self.num_slices,
            max_support=self.max_support, support_num=self.support_num,
            hyper_enc_widths=self.hyper_enc_widths,
            hyper_dec_widths=self.hyper_dec_widths,
            cc_widths=self.cc_widths,
        )
        self.seg_g_s = MainCNNDecoder(N, M, self.mid)
        # human layer conditioning decoders
        self.human_g_enc2 = ContextScale1(N, M, self.mid)
        self.human_g_enc3 = ContextScale2(N, M)
        self.human_g_enc4 = ContextScale1(N, M, self.mid)
        self.human_g_enc5 = ContextScale2(N, M)
        self.human_hyper = _SimpleHyper(
            enc_widths=self.hyper_enc_widths,
            dec_widths=self.hyper_dec_widths,
            deconv_style=True,
        )
        self.human_context_decoder = _ConvStack(M, 2)
        self.human_context_decoder3 = _ConvStack(M, 2)
        self.seg_g_a1 = _StrideConvPair(N, kernel=3)
        self.seg_g_a2 = _EncTail(N, M, with_attn=True)
        self.human_g_a1_2 = _StrideConvPair(N, kernel=3)
        self.human_g_a2_2 = _EncTail(N, M, with_attn=False)
        self.generate_mask_scale1 = _MaskNet((12, 12, 9))
        self.generate_mask_scale2 = _MaskNet((4 * N, 4 * N, 3 * N))
        self.human_context_decoder2_2 = _DeconvContext(N)
        self.human_context_decoder4 = _DeconvContext(N)
        self.human_g_s1_2 = _DeconvPair(N)
        self.human_g_s2_2 = _DecTail(N)

    def __call__(self, x, training: bool = True):
        y_hat, m_lik = self.machine.encode_code(x, training=training)
        x_hat_machine = self.g_s(y_hat)

        # --- segmentation layer (stf13.py:556-636) -------------------------
        seg_y = self.seg_encode(x, y_hat)
        seg_y_hat, seg_lik = self.seg_coder.code(seg_y, training=training)
        seg_x_hat = self.seg_g_s(seg_y_hat)

        # --- human layer with masked fusion (stf13.py:641-699) -------------
        human_y = self.human_encode(x, y_hat, seg_y_hat)
        human_y_hat, h_lik = self.human_hyper.code(human_y, training=training)
        human_deimage = self.human_synthesize(human_y_hat, y_hat, seg_y_hat)

        return {
            "x_hat": human_deimage,
            "decompressedImage": human_deimage,
            "machine_x_hat": x_hat_machine,
            "seg_x_hat": seg_x_hat,
            "likelihoods": h_lik,
            "machine_likelihoods": m_lik,
            "seg_likelihoods": seg_lik,
        }

    # --- coder-facing stages (crc_codec) ------------------------------------
    def seg_encode(self, x, y_hat):
        seg_cond_img = self.seg_g_enc2(y_hat)
        seg_cond_quarter = self.seg_g_enc3(y_hat)
        seg_y_1 = self.seg_g_a1(jnp.concatenate([x, seg_cond_img], axis=-1))
        return self.seg_g_a2(
            jnp.concatenate([seg_y_1, seg_cond_quarter], axis=-1)
        )

    def _masks_and_conds(self, y_hat, seg_y_hat):
        N = self.N
        dec2 = self.human_g_enc2(y_hat)
        cond2 = self.human_g_enc3(y_hat)
        dec3 = self.human_g_enc4(seg_y_hat)
        cond4 = self.human_g_enc5(seg_y_hat)
        m1 = self.generate_mask_scale1(
            jnp.concatenate([dec2, dec3], axis=-1)
        )
        m2 = self.generate_mask_scale2(
            jnp.concatenate([cond2, cond4], axis=-1)
        )
        return (
            dec2, cond2, dec3, cond4,
            m1[..., 0:3], m1[..., 3:6],
            m2[..., 0:N], m2[..., N : 2 * N],
        )

    def human_encode(self, x, y_hat, seg_y_hat):
        (dec2, cond2, dec3, cond4, mo1, ms1, mo2, ms2) = self._masks_and_conds(
            y_hat, seg_y_hat
        )
        residual1 = x - mo1 * dec2 - ms1 * dec3
        human_y_1 = self.human_g_a1_2(
            jnp.concatenate([residual1, dec2, dec3], axis=-1)
        )
        residual2 = human_y_1 - mo2 * cond2 - ms2 * cond4
        return self.human_g_a2_2(
            jnp.concatenate([residual2, cond2, cond4], axis=-1)
        )

    def human_eb_medians(self):
        return self.human_hyper.entropy_bottleneck.medians()[:, 0, 0]

    def human_synthesize(self, human_y_hat, y_hat, seg_y_hat):
        (dec2, cond2, dec3, cond4, mo1, ms1, mo2, ms2) = self._masks_and_conds(
            y_hat, seg_y_hat
        )
        context = self.human_context_decoder(y_hat)
        context3 = self.human_context_decoder3(seg_y_hat)
        context2 = self.human_context_decoder2_2(y_hat)
        context4 = self.human_context_decoder4(seg_y_hat)
        d1 = self.human_g_s1_2(
            jnp.concatenate([human_y_hat, context, context3], axis=-1)
        )
        d1 = d1 + mo2 * cond2 + ms2 * cond4
        d2 = self.human_g_s2_2(
            jnp.concatenate([d1, context2, context4], axis=-1)
        )
        return d2 + mo1 * dec2 + ms1 * dec3

    def aux_loss(self):
        return (
            self.machine.coder.entropy_bottleneck.aux_loss()
            + self.seg_coder.entropy_bottleneck.aux_loss()
            + self.human_hyper.entropy_bottleneck.aux_loss()
        )

    def eb_dict(self):
        return {
            "entropy_bottleneck": self.machine.coder.entropy_bottleneck,
            "entropy_bottleneck_seg": self.seg_coder.entropy_bottleneck,
            "entropy_bottleneck_human": self.human_hyper.entropy_bottleneck,
        }
