"""ICM codecs with task networks: oj_ICM, seg_oj_ICM, cnn2, stf10.

Behavioral parity:
  - ``FasterRCNN_Coding`` (registry "oj_ICM"; reference
    ``fasterRCNN_ICM.py:17-326``): frozen R50-FPN task net run on the
    input (teacher) and the reconstruction (student); codec = CNN
    analysis/synthesis + zigzag ChARM coder (num_slices=2, sliding
    support 4, mean window 8). Returns teacher/student feature dicts for
    the feature-distillation loss (train_oj.py:58-92).
  - ``MaskedRCNN_FasterRCNN_Coding`` (registry "seg_oj_ICM"; reference
    ``MaskedRCNN_OBJ_ICM.py:17-420``): same pattern with Mask-R-CNN FPN
    weights plus a second segmentation coding layer on
    cat(x_hat, x) whose reconstruction is added residually. (The
    reference evaluates the seg layer's Gaussian on the machine layer's
    zigzag latent and conditions on the machine means — stale-variable
    bugs, MaskedRCNN_OBJ_ICM.py:363,336; this rebuild uses the seg
    layer's own tensors per SURVEY.md §0.)
  - ``WACNN2`` (registry "cnn2"; reference ``cnn2.py:26-381``): WACNN
    plus a RetinaNet student on the reconstruction; returns the detection
    tuple fields for the ICM loss.
  - ``SymmetricalTransFormer7`` (registry "stf10"; reference
    ``stf10.py:388-1056``): prompt ("promot") adapters added residually
    at every codec stage around a base CNN codec; reconstruction feeds a
    DeepLabV3-ResNet50 student; returns ``Student_output``. (The
    reference decodes with ``g_s1`` applied twice — a shape-incompatible
    slip, stf10.py:1009-1012; this rebuild uses g_s2 for the second
    stage.)

Task nets are constructed inside the model (like the reference) but can be
disabled with ``with_task_net=False`` for codec-only training/eval; frozen
weights come from ``icm_tpu/utils/torch_weights.py`` converters.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.factories import MainCNNDecoder, MainCNNEncoder
from ..nn.layers import Win_noShift_Attention, conv, deconv
from ..nn.gdn import GDN
from ..tasks.deeplab import DeepLabV3
from ..tasks.fpn import FPN
from ..tasks.resnet import ResNetBackbone
from ..tasks.retinanet import RetinaNet
from .base import CompressionModel
from .cnn import WACNN
from .zigzag_coder import ZigzagCharmCoder


class _FrozenFPN(nn.Module):
    """R50-FPN feature extractor (the reference's Detectron2 bridge,
    fasterRCNN_ICM.py:41-55). Parameters are frozen by the training mask
    (train/optim filters 'task_net')."""

    block: str = "bottleneck"
    layers: Tuple[int, ...] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x):
        feats = ResNetBackbone(block=self.block, layers=self.layers)(x)
        return FPN()(feats)


class FasterRCNN_Coding(CompressionModel):
    N: int = 192
    M: int = 384
    num_slices: int = 2
    max_support: int = 4
    support_num: int = 8
    mid: int = 256
    hyper_enc_widths: Tuple[int, ...] = (384, 336, 288, 240, 192)
    hyper_dec_widths: Tuple[int, ...] = (240, 288, 336, 384, 384)
    cc_widths: Tuple[int, ...] = (224, 64)
    with_task_net: bool = True
    scan_charm: bool = False
    task_layers: Tuple[int, ...] = (3, 4, 6, 3)

    def setup(self):
        self.g_a = MainCNNEncoder(self.N, self.M)
        self.g_s = MainCNNDecoder(self.N, self.M, self.mid)
        self.coder = ZigzagCharmCoder(
            scan=self.scan_charm,
            latent_dim=self.M,
            num_slices=self.num_slices,
            max_support=self.max_support,
            support_num=self.support_num,
            hyper_enc_widths=self.hyper_enc_widths,
            hyper_dec_widths=self.hyper_dec_widths,
            cc_widths=self.cc_widths,
        )
        if self.with_task_net:
            self.task_net = _FrozenFPN(layers=self.task_layers)

    def __call__(self, x, training: bool = True):
        teacher_out = None
        if self.with_task_net:
            teacher_out = jax.tree_util.tree_map(
                jax.lax.stop_gradient, self.task_net(x)
            )
        y = self.g_a(x)
        y_hat, likelihoods = self.coder.code(y, training=training)
        x_hat = self.g_s(y_hat)
        student_out = self.task_net(x_hat) if self.with_task_net else None
        return {
            "x_hat": x_hat,
            "decompressedImage": x_hat,
            "likelihoods": likelihoods,
            "Student_output_features": student_out,
            "Teacher_output_features": teacher_out,
        }

    def aux_loss(self):
        return self.coder.entropy_bottleneck.aux_loss()

    def eb_dict(self):
        return {"entropy_bottleneck": self.coder.entropy_bottleneck}

    # --- ChARM protocol: delegate to the zigzag coder (CharmCodec codes
    # the machine bitstream; task nets are eval-side only) ------------------
    def analyze(self, x, training: bool = False):
        y = self.g_a(x)
        return y, self.coder.h_a(y)

    def synthesize(self, y_hat, training: bool = False):
        return self.g_s(y_hat)

    def ctx_prepare(self, z_hat):
        return self.coder.ctx_prepare(z_hat)

    def latent_slices(self, y):
        return self.coder.latent_slices(y)

    @property
    def ctx_slices(self) -> int:
        # (accessible outside apply: derived from config, not submodules)
        return self.num_slices * 4

    def ctx_support(self, i, decoded):
        from .base import sliding_support

        return sliding_support(self.max_support)(i, decoded)

    def slice_context(self, i, state, support):
        return self.coder.slice_context(i, state, support)

    def slice_lrp(self, i, mean_support, y_hat_slice):
        return self.coder.slice_lrp(i, mean_support, y_hat_slice)

    def ctx_assemble(self, y_hat_slices):
        return self.coder.ctx_assemble(y_hat_slices)

    def eb_medians(self):
        return self.coder.eb_medians()


class MaskedRCNN_FasterRCNN_Coding(CompressionModel):
    N: int = 192
    M: int = 384
    num_slices: int = 2
    max_support: int = 4
    support_num: int = 8
    mid: int = 256
    hyper_enc_widths: Tuple[int, ...] = (384, 336, 288, 240, 192)
    hyper_dec_widths: Tuple[int, ...] = (240, 288, 336, 384, 384)
    cc_widths: Tuple[int, ...] = (224, 64)
    with_task_net: bool = True
    scan_charm: bool = False
    task_layers: Tuple[int, ...] = (3, 4, 6, 3)

    def setup(self):
        self.g_a = MainCNNEncoder(self.N, self.M)
        self.g_s = MainCNNDecoder(self.N, self.M, self.mid)
        self.coder = ZigzagCharmCoder(
            scan=self.scan_charm,
            latent_dim=self.M,
            num_slices=self.num_slices,
            max_support=self.max_support,
            support_num=self.support_num,
            hyper_enc_widths=self.hyper_enc_widths,
            hyper_dec_widths=self.hyper_dec_widths,
            cc_widths=self.cc_widths,
        )
        self.seg_g_a = MainCNNEncoder(self.N, self.M)  # 6-channel input
        self.seg_g_s = MainCNNDecoder(self.N, self.M, self.mid)
        self.seg_coder = ZigzagCharmCoder(
            scan=self.scan_charm,
            latent_dim=self.M,
            num_slices=self.num_slices,
            max_support=self.max_support,
            support_num=self.support_num,
            hyper_enc_widths=self.hyper_enc_widths,
            hyper_dec_widths=self.hyper_dec_widths,
            cc_widths=self.cc_widths,
        )
        if self.with_task_net:
            self.task_net = _FrozenFPN(layers=self.task_layers)

    def __call__(self, x, training: bool = True):
        teacher_out = None
        if self.with_task_net:
            teacher_out = jax.tree_util.tree_map(
                jax.lax.stop_gradient, self.task_net(x)
            )
        y = self.g_a(x)
        y_hat, m_lik = self.coder.code(y, training=training)
        x_hat = self.g_s(y_hat)
        student_out = self.task_net(x_hat) if self.with_task_net else None

        seg_y = self.seg_g_a(jnp.concatenate([x_hat, x], axis=-1))
        seg_y_hat, seg_lik = self.seg_coder.code(seg_y, training=training)
        seg_x_hat = self.seg_g_s(seg_y_hat) + x_hat

        return {
            "x_hat": seg_x_hat,
            "decompressedImage": seg_x_hat,
            "machine_x_hat": x_hat,
            "likelihoods": seg_lik,
            "machine_likelihoods": m_lik,
            "Student_output_features": student_out,
            "Teacher_output_features": teacher_out,
        }

    def aux_loss(self):
        return (
            self.coder.entropy_bottleneck.aux_loss()
            + self.seg_coder.entropy_bottleneck.aux_loss()
        )

    def eb_dict(self):
        return {
            "entropy_bottleneck": self.coder.entropy_bottleneck,
            "seg_entropy_bottleneck": self.seg_coder.entropy_bottleneck,
        }


class WACNN2(WACNN):
    """cnn2: WACNN + RetinaNet student on the reconstruction."""

    with_task_net: bool = True
    num_classes: int = 80
    task_block: str = "bottleneck"
    task_layers: Tuple[int, ...] = (3, 4, 6, 3)

    def setup(self):
        super().setup()
        if self.with_task_net:
            self.studentNet = RetinaNet(
                num_classes=self.num_classes,
                block=self.task_block,
                layers=self.task_layers,
            )

    def __call__(self, x, training: bool = True):
        out = super().__call__(x, training=training)
        result = {
            "compressH": None,
            "decompressH": None,
            "x_hat": out["x_hat"],
            "likelihoods": out["likelihoods"],
            "Student_output_features": None,
            "Teacher_output_features": None,
            "Student_classification": None,
            "Student_regression": None,
            "Student_anchors": None,
        }
        if self.with_task_net:
            compressH, feats, cls, reg, anchors = self.studentNet(out["x_hat"])
            result.update(
                decompressH=compressH,
                Student_output_features=feats,
                Student_classification=cls,
                Student_regression=reg,
                Student_anchors=anchors,
            )
        return result


class _PromptAnalysis(nn.Module):
    """stf10 promot_g_a (stf10.py:693-704): 4x stride-2 convs + WinAttn."""

    N: int
    M: int

    @nn.compact
    def __call__(self, p):
        for _ in range(3):
            p = conv(self.N, 5, 2)(p)
            p = jax.nn.gelu(p, approximate=False)
        p = conv(self.M, 5, 2)(p)
        p = jax.nn.gelu(p, approximate=False)
        return Win_noShift_Attention(
            self.M, num_heads=8, window_size=4, shift_size=2
        )(p)


class _G_s1(nn.Module):
    """stf10 g_s1 (stf10.py:586-596): decode to N at 1/4 scale."""

    N: int
    M: int

    @nn.compact
    def __call__(self, y_hat):
        h = Win_noShift_Attention(
            self.M, num_heads=8, window_size=4, shift_size=2
        )(y_hat)
        h = deconv(self.N, 5, 2)(h)
        h = GDN(self.N, inverse=True)(h)
        h = deconv(self.N, 5, 2)(h)
        h = GDN(self.N, inverse=True)(h)
        return Win_noShift_Attention(
            self.N, num_heads=8, window_size=8, shift_size=4
        )(h)


class _PromptSynthesis(nn.Module):
    """stf10 promot_g_s (stf10.py:705-713)."""

    N: int
    M: int

    @nn.compact
    def __call__(self, y_hat):
        pp = Win_noShift_Attention(
            self.M, num_heads=8, window_size=4, shift_size=2
        )(y_hat)
        pp = jax.nn.gelu(pp, approximate=False)
        pp = deconv(self.N, 5, 2)(pp)
        pp = jax.nn.gelu(pp, approximate=False)
        return deconv(self.N, 5, 2)(pp)


class _G_s2(nn.Module):
    """stf10 g_s2 equivalent tail (see class docstring on the reference's
    double-g_s1 slip)."""

    N: int

    @nn.compact
    def __call__(self, h_hat):
        d = deconv(self.N, 5, 2)(h_hat)
        d = GDN(self.N, inverse=True)(d)
        return deconv(3, 5, 2)(d)


class SymmetricalTransFormer7(CompressionModel):
    """stf10: prompt adapters for segmentation ICM."""

    N: int = 192
    M: int = 384
    num_slices: int = 6
    max_support: int = 12
    support_num: int = 24
    mid: int = 256
    num_seg_classes: int = 21
    hyper_enc_widths: Tuple[int, ...] = (384, 336, 288, 240, 192)
    hyper_dec_widths: Tuple[int, ...] = (240, 288, 336, 384, 384)
    # reference stf10 uses the 5-conv inline context stacks like stf9
    # (stf10 cc_*_transforms2: 224->176->128->64->out)
    cc_widths: Tuple[int, ...] = (224, 176, 128, 64)
    with_task_net: bool = True
    scan_charm: bool = False
    task_backbone: str = "resnet50"

    def setup(self):
        N, M = self.N, self.M
        self.g_a = MainCNNEncoder(N, M)
        self.coder = ZigzagCharmCoder(
            scan=self.scan_charm,
            latent_dim=M,
            num_slices=self.num_slices,
            max_support=self.max_support,
            support_num=self.support_num,
            apply_lrp=False,  # stf10 leaves LRP unapplied (stf10.py:990-1003)
            hyper_enc_widths=self.hyper_enc_widths,
            hyper_dec_widths=self.hyper_dec_widths,
            cc_widths=self.cc_widths,
        )
        self.promot_g_a = _PromptAnalysis(self.N, self.M)
        self.promot_g_s = _PromptSynthesis(self.N, self.M)
        self.g_s1 = _G_s1(self.N, self.M)
        self.g_s2 = _G_s2(self.N)
        from ..nn.factories import HyperEncoder384, HyperMean384

        self.promot_h_a = HyperEncoder384(self.hyper_enc_widths)
        self.promot_h_mean_s = HyperMean384(self.hyper_dec_widths)
        self.promot_h_scale_s = HyperMean384(self.hyper_dec_widths)
        if self.with_task_net:
            self.student_seg_Net = DeepLabV3(
                num_classes=self.num_seg_classes, backbone=self.task_backbone
            )

    def __call__(self, x, training: bool = True):
        from ..ops import ste_round

        y = self.analyze_prompt(x)
        z = self.hyper_encode_prompt(y)
        c = self.coder
        _, z_lik = c.entropy_bottleneck(z, training=training)
        z_off = c.eb_medians()
        z_hat = ste_round(z - z_off) + z_off

        state = self.ctx_prepare_prompt(z_hat)
        y_slices = c.latent_slices(y)
        y_hat_slices, y_lik = [], []
        for i in range(c.ctx_slices):
            support = c.ctx_support(i, y_hat_slices)
            mu, scale, mean_support = c.slice_context(i, state, support)
            _, lik = c.gaussian_conditional(
                y_slices[i], scale, mu, training=training
            )
            y_lik.append(lik)
            y_hat_slice = ste_round(y_slices[i] - mu) + mu
            if c.apply_lrp:
                y_hat_slice = y_hat_slice + c.slice_lrp(
                    i, mean_support, y_hat_slice
                )
            y_hat_slices.append(y_hat_slice)
        y_hat = c.ctx_assemble(y_hat_slices)
        likelihoods = {"y": jnp.concatenate(y_lik, axis=-1), "z": z_lik}

        decompressH = self.synthesize_prompt(y_hat)
        out = {
            "x_hat": decompressH,
            "likelihoods": likelihoods,
            "Student_output": None,
        }
        if self.with_task_net:
            out["Student_output"] = self.student_seg_Net(decompressH)
        return out

    # --- coder-facing stages (crc_codec.Stf10Codec / CharmCodec-like) -------
    def analyze_prompt(self, x):
        """y = g_a(x) + promot_g_a(x) (stf10.py:903-905)."""
        return self.g_a(x) + self.promot_g_a(x)

    def hyper_encode_prompt(self, y):
        """z = h_a(y) + promot_h_a(y) (stf10.py:912-914)."""
        return self.coder.h_a(y) + self.promot_h_a(y)

    def ctx_prepare_prompt(self, z_hat):
        """means/scales with prompt adapters (stf10.py:919-924)."""
        c = self.coder
        means = c.h_mean_s(z_hat) + self.promot_h_mean_s(z_hat)
        scales = c.h_scale_s(z_hat) + self.promot_h_scale_s(z_hat)
        return {"means": c._split(means), "scales": c._split(scales)}

    def synthesize_prompt(self, y_hat):
        """g_s1 + promot_g_s residual, then the g_s2 tail (the reference
        applies g_s1 twice — shape-incompatible slip, stf10.py:1009-1012)."""
        h_hat = self.g_s1(y_hat) + self.promot_g_s(y_hat)
        return self.g_s2(h_hat)

    def aux_loss(self):
        return self.coder.entropy_bottleneck.aux_loss()

    def eb_dict(self):
        return {"entropy_bottleneck": self.coder.entropy_bottleneck}

    # --- ChARM protocol (drives the generic CharmCodec): every stage is the
    # prompt-fused variant so compress/decompress match training bit-exactly.
    def analyze(self, x, training: bool = False):
        y = self.analyze_prompt(x)
        return y, self.hyper_encode_prompt(y)

    def synthesize(self, y_hat, training: bool = False):
        return self.synthesize_prompt(y_hat)

    def ctx_prepare(self, z_hat):
        return self.ctx_prepare_prompt(z_hat)

    def latent_slices(self, y):
        return self.coder.latent_slices(y)

    @property
    def ctx_slices(self) -> int:
        # accessible outside apply: derived from config, not submodules
        return self.num_slices * 4

    def ctx_support(self, i, decoded):
        from .base import sliding_support

        return sliding_support(self.max_support)(i, decoded)

    def slice_context(self, i, state, support):
        return self.coder.slice_context(i, state, support)

    def slice_lrp(self, i, mean_support, y_hat_slice):
        # stf10's coder runs with apply_lrp=False (stf10.py:990-1003)
        return jnp.zeros_like(y_hat_slice)

    def ctx_assemble(self, y_hat_slices):
        return self.coder.ctx_assemble(y_hat_slices)

    def eb_medians(self):
        return self.coder.eb_medians()
