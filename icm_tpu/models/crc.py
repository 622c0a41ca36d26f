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
                x = jax.nn.gelu(x)
            x = conv(self.width, kernel_size=3, stride=1)(x)
        return x


class _DeconvHyperDec(nn.Module):
    """stf13-style human hyper decoder: conv3x3 -> deconv x2 (reference
    stf13.py:223-267)."""

    widths: Tuple[int, ...] = (240, 288, 384)

    @nn.compact
    def __call__(self, z):
        z = conv3x3(self.widths[0])(z)
        z = jax.nn.gelu(z)
        z = deconv(self.widths[1], 3, 2)(z)
        z = jax.nn.gelu(z)
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

    def setup(self):
        self.g_a = MainCNNEncoder(self.N, self.M)
        self.coder = ZigzagCharmCoder(
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
                h = jax.nn.gelu(h)
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
                d = jax.nn.gelu(d)
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
    cc_widths: Tuple[int, ...] = (224, 64)
    mid: int = 256

    def setup(self):
        self.machine = _MachineLayer(
            self.N, self.M, self.num_slices, self.max_support,
            self.support_num, apply_lrp=False,
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
    cc_widths: Tuple[int, ...] = (224, 64)
    mid: int = 256

    def setup(self):
        self.machine = _MachineLayer(
            self.N, self.M, self.num_slices, self.max_support,
            self.support_num, apply_lrp=False,
            hyper_enc_widths=self.hyper_enc_widths,
            hyper_dec_widths=self.hyper_dec_widths,
            cc_widths=self.cc_widths,
        )
        self.g_s1 = MainCNNDecoderPart1(self.N, self.M, self.mid)
        self.g_s2 = MainCNNDecoderPart2(self.N, self.mid)
        self.human_g_s2 = MainCNNDecoder(self.N, self.M, self.mid)
        self.human_hyper = _SimpleHyper(
            enc_widths=self.hyper_enc_widths, dec_widths=self.hyper_dec_widths
        )

    @nn.compact
    def __call__(self, x, training: bool = True):
        y_hat, m_lik = self.machine.encode_code(x, training=training)
        decompress_image = self.g_s2(self.g_s1(y_hat))

        cond_image = self.human_g_s2(y_hat)
        residual1 = cond_image - x  # reference stf14.py:1133
        h = residual1
        for w, k in ((self.N, 5), (self.N, 5), (self.N, 5), (self.M, 5)):
            h = conv(w, kernel_size=k, stride=2)(h)
            if w != self.M:
                h = jax.nn.gelu(h)
        human_y_hat, h_lik = self.human_hyper.code(h, training=training)

        d = human_y_hat
        for w, last in ((self.N, False), (self.N, False), (self.N, False), (3, True)):
            d = deconv(w, 5, 2)(d)
            if not last:
                d = jax.nn.gelu(d)
        human_deimage = d + residual1

        return {
            "x_hat": human_deimage,
            "decompressedImage": human_deimage,
            "machine_x_hat": decompress_image,
            "likelihoods": h_lik,
            "machine_likelihoods": m_lik,
        }

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


class ConditionalResidualCoding2(CompressionModel):
    """stf12 (CRC v2): two-stage residual human encoder. Registry: "stf12"."""

    N: int = 192
    M: int = 384
    num_slices: int = 6
    max_support: int = 12
    support_num: int = 24
    hyper_enc_widths: Tuple[int, ...] = (384, 336, 288, 240, 192)
    hyper_dec_widths: Tuple[int, ...] = (240, 288, 336, 384, 384)
    cc_widths: Tuple[int, ...] = (224, 64)
    mid: int = 256

    def setup(self):
        self.machine = _MachineLayer(
            self.N, self.M, self.num_slices, self.max_support,
            self.support_num, apply_lrp=False,
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
        self.human_context_decoder = _ConvStack(self.M, 5)

    @nn.compact
    def __call__(self, x, training: bool = True):
        N, M = self.N, self.M
        y_hat, m_lik = self.machine.encode_code(x, training=training)
        decompress_image = self.g_s2(self.g_s1(y_hat))

        cond_img = self.human_g_enc2(y_hat)
        cond_quarter = self.human_g_enc3(y_hat)

        residual1 = x - cond_img
        h1 = jnp.concatenate([x, residual1], axis=-1)
        h1 = conv(N, kernel_size=3, stride=2)(h1)
        h1 = jax.nn.gelu(h1)
        human_y_1 = conv(N, kernel_size=3, stride=2)(h1)

        residual2 = human_y_1 - cond_quarter
        h2 = jnp.concatenate([human_y_1, residual2], axis=-1)
        h2 = conv(N, kernel_size=5, stride=2)(h2)
        h2 = jax.nn.gelu(h2)
        h2 = conv(M, kernel_size=5, stride=2)(h2)
        h2 = jax.nn.gelu(h2)
        human_y = Win_noShift_Attention(M, num_heads=8, window_size=4, shift_size=2)(h2)

        human_y_hat, h_lik = self.human_hyper.code(human_y, training=training)

        context = self.human_context_decoder(y_hat)
        d = jnp.concatenate([human_y_hat, context], axis=-1)
        d = Win_noShift_Attention(2 * M, num_heads=8, window_size=4, shift_size=2)(d)
        d = jax.nn.gelu(d)
        d = deconv(N, 3, 2)(d)
        d = jax.nn.gelu(d)
        human_deimage1 = deconv(N, 3, 2)(d) + cond_quarter

        # second context decoder: convs + 2x subpel x2 to image scale
        c2 = conv(M, kernel_size=3, stride=1)(y_hat)
        c2 = jax.nn.gelu(c2)
        c2 = conv(M, kernel_size=3, stride=1)(c2)
        c2 = jax.nn.gelu(c2)
        c2 = SubpelConv(N, r=2)(c2)
        c2 = jax.nn.gelu(c2)
        context2 = SubpelConv(N, r=2)(c2)

        d2 = jnp.concatenate([human_deimage1, context2], axis=-1)
        d2 = deconv(N, 3, 2)(d2)
        d2 = jax.nn.gelu(d2)
        d2 = conv(N, kernel_size=3, stride=1)(d2)
        d2 = jax.nn.gelu(d2)
        human_deimage = deconv(3, 3, 2)(d2) + cond_img

        return {
            "x_hat": human_deimage,
            "decompressedImage": human_deimage,
            "machine_x_hat": decompress_image,
            "likelihoods": h_lik,
            "machine_likelihoods": m_lik,
        }

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

    def setup(self):
        N, M = self.N, self.M
        self.machine = _MachineLayer(
            N, M, self.num_slices, self.max_support, self.support_num,
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

    @nn.compact
    def __call__(self, x, training: bool = True):
        N, M = self.N, self.M
        y_hat, m_lik = self.machine.encode_code(x, training=training)
        x_hat_machine = self.g_s(y_hat)

        # --- segmentation layer (stf13.py:556-636) -------------------------
        seg_cond_img = self.seg_g_enc2(y_hat)
        seg_cond_quarter = self.seg_g_enc3(y_hat)
        s1 = jnp.concatenate([x, seg_cond_img], axis=-1)
        s1 = conv(N, kernel_size=3, stride=2)(s1)
        s1 = jax.nn.gelu(s1)
        seg_y_1 = conv(N, kernel_size=3, stride=2)(s1)
        s2 = jnp.concatenate([seg_y_1, seg_cond_quarter], axis=-1)
        s2 = conv(N, kernel_size=5, stride=2)(s2)
        s2 = jax.nn.gelu(s2)
        s2 = conv(M, kernel_size=5, stride=2)(s2)
        s2 = jax.nn.gelu(s2)
        seg_y = Win_noShift_Attention(M, num_heads=8, window_size=4, shift_size=2)(s2)
        seg_y_hat, seg_lik = self.seg_coder.code(seg_y, training=training)
        seg_x_hat = self.seg_g_s(seg_y_hat)

        # --- human layer with masked fusion (stf13.py:641-699) -------------
        dec2 = self.human_g_enc2(y_hat)
        cond2 = self.human_g_enc3(y_hat)
        dec3 = self.human_g_enc4(seg_y_hat)
        cond4 = self.human_g_enc5(seg_y_hat)

        m1 = jnp.concatenate([dec2, dec3], axis=-1)
        m1 = conv3x3(12)(m1)
        m1 = jax.nn.gelu(m1)
        m1 = conv3x3(12)(m1)
        m1 = jax.nn.gelu(m1)
        m1 = conv3x3(9)(m1)
        mask1 = jax.nn.softmax(m1, axis=-1)
        mask_obj1, mask_seg1 = mask1[..., 0:3], mask1[..., 3:6]

        residual1 = x - mask_obj1 * dec2 - mask_seg1 * dec3
        h1 = jnp.concatenate([residual1, dec2, dec3], axis=-1)
        h1 = conv(N, kernel_size=3, stride=2)(h1)
        h1 = jax.nn.gelu(h1)
        human_y_1 = conv(N, kernel_size=3, stride=2)(h1)

        m2 = jnp.concatenate([cond2, cond4], axis=-1)
        m2 = conv3x3(4 * N)(m2)
        m2 = jax.nn.gelu(m2)
        m2 = conv3x3(4 * N)(m2)
        m2 = jax.nn.gelu(m2)
        m2 = conv3x3(3 * N)(m2)
        mask2 = jax.nn.softmax(m2, axis=-1)
        mask_obj2, mask_seg2 = mask2[..., 0:N], mask2[..., N : 2 * N]

        residual2 = human_y_1 - mask_obj2 * cond2 - mask_seg2 * cond4
        h2 = jnp.concatenate([residual2, cond2, cond4], axis=-1)
        h2 = conv(N, kernel_size=5, stride=2)(h2)
        h2 = jax.nn.gelu(h2)
        h2 = conv(M, kernel_size=5, stride=2)(h2)
        human_y = jax.nn.gelu(h2)

        human_y_hat, h_lik = self.human_hyper.code(human_y, training=training)

        context = self.human_context_decoder(y_hat)
        context3 = self.human_context_decoder3(seg_y_hat)
        # 1/4-scale context decoders (stf13.py:276-305)
        c2 = conv(N, kernel_size=3, stride=1)(y_hat)
        c2 = jax.nn.gelu(c2)
        c2 = deconv(N, 3, 2)(c2)
        c2 = jax.nn.gelu(c2)
        context2 = deconv(N, 3, 2)(c2)
        c4 = conv(N, kernel_size=3, stride=1)(seg_y_hat)
        c4 = jax.nn.gelu(c4)
        c4 = deconv(N, 3, 2)(c4)
        c4 = jax.nn.gelu(c4)
        context4 = deconv(N, 3, 2)(c4)

        d = jnp.concatenate([human_y_hat, context, context3], axis=-1)
        d = deconv(N, 3, 2)(d)
        d = jax.nn.gelu(d)
        human_deimage1 = deconv(N, 3, 2)(d)
        human_deimage1 = human_deimage1 + mask_obj2 * cond2 + mask_seg2 * cond4

        d2 = jnp.concatenate([human_deimage1, context2, context4], axis=-1)
        d2 = deconv(N, 3, 2)(d2)
        d2 = jax.nn.gelu(d2)
        d2 = conv(N, kernel_size=3, stride=1)(d2)
        d2 = jax.nn.gelu(d2)
        human_deimage = deconv(3, 3, 2)(d2)
        human_deimage = human_deimage + mask_obj1 * dec2 + mask_seg1 * dec3

        return {
            "x_hat": human_deimage,
            "decompressedImage": human_deimage,
            "machine_x_hat": x_hat_machine,
            "seg_x_hat": seg_x_hat,
            "likelihoods": h_lik,
            "machine_likelihoods": m_lik,
            "seg_likelihoods": seg_lik,
        }

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
