"""SymmetricalTransFormer — Swin-transformer codec (registry: "stf").

Behavioral parity with the reference ``SymmetricalTransFormer`` (reference:
``compressai/models/stf.py:384-670``): patch-embed (patch 2, dim 48) +
4-stage Swin analysis (depths 2,2,6,2 / heads 3,6,12,24 / window 4) with
PatchMerging between stages -> y with C = 8*embed_dim = 384; mirrored
synthesis with PatchSplit and a 5x5 conv + 2x depth-to-space + 3x3 conv
head (``end_conv``); conv hyper 384->192; 12-slice ChARM context with
6-slice support and LRP, identical slice math to WACNN.

TPU-native: composes the shared NHWC Swin stack (``icm_tpu/nn/swin.py``)
— the reference re-pastes that scaffolding per file. Implements the charm
coder interface so ``CharmCodec`` drives real compress/decompress.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyBottleneck, GaussianConditional
from ..nn import conv3x3, SubpelConv
from ..nn.swin import BasicLayer, PatchEmbed
from .base import CompressionModel, prefix_support
from .cnn import _CCTransform


class _SwinAnalysis(nn.Module):
    embed_dim: int = 48
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 4
    patch_size: int = 2
    drop_path_rate: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = PatchEmbed(
            patch_size=self.patch_size, embed_dim=self.embed_dim, name="embed"
        )(x)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        n = len(self.depths)
        for i in range(n):
            x = BasicLayer(
                dim=int(self.embed_dim * 2 ** i),
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                drop_path=dpr[sum(self.depths[:i]) : sum(self.depths[: i + 1])],
                downsample="merge" if i < n - 1 else None,
                name=f"layer{i}",
            )(x, deterministic)
        return x


class _SwinSynthesis(nn.Module):
    embed_dim: int = 48
    depths: Tuple[int, ...] = (2, 6, 2, 2)  # reversed analysis depths
    num_heads: Tuple[int, ...] = (24, 12, 6, 3)
    window_size: int = 4
    patch_size: int = 2
    drop_path_rate: float = 0.2
    out_ch: int = 3

    @nn.compact
    def __call__(self, y, deterministic: bool = True):
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        n = len(self.depths)
        x = y
        for i in range(n):
            x = BasicLayer(
                dim=int(self.embed_dim * 2 ** (n - 1 - i)),
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                drop_path=dpr[sum(self.depths[:i]) : sum(self.depths[: i + 1])],
                downsample="split" if i < n - 1 else None,
                name=f"layer{i}",
            )(x, deterministic)
        # end_conv: 5x5 conv -> depth-to-space(patch) -> 3x3 conv
        x = SubpelConv(self.embed_dim, r=self.patch_size, kernel_size=5, name="up")(x)
        x = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)), name="to_rgb")(x)
        return x


class _HyperEncoderSTF(nn.Module):
    widths: Tuple[int, ...] = (384, 336, 288, 240, 192)

    @nn.compact
    def __call__(self, y):
        strides = (1, 1, 2, 1, 2)
        for i, (w, s) in enumerate(zip(self.widths, strides)):
            if i > 0:
                y = jax.nn.gelu(y, approximate=False)
            y = conv3x3(w, stride=s)(y)
        return y


class _HyperDecoderSTF(nn.Module):
    widths: Tuple[int, ...] = (240, 288, 336, 384, 384)

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
        return z


class SymmetricalTransFormer(CompressionModel):
    embed_dim: int = 48
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 4
    patch_size: int = 2
    num_slices: int = 12
    drop_path_rate: float = 0.2
    hyper_enc_widths: Tuple[int, ...] = (384, 336, 288, 240, 192)
    hyper_dec_widths: Tuple[int, ...] = (240, 288, 336, 384, 384)
    cc_widths: Tuple[int, ...] = (224, 176, 128, 64)
    # scan_charm=True runs the 12-slice AR loop as ONE lax.scan with
    # stacked per-slice weights (see cnn.charm_scan_forward) — the
    # training configuration; the unrolled path remains the protocol the
    # real-bitstream coder drives.
    scan_charm: bool = False

    @property
    def max_support_slices(self) -> int:
        return self.num_slices // 2

    @property
    def latent_dim(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)

    def setup(self):
        self.g_a = _SwinAnalysis(
            self.embed_dim,
            self.depths,
            self.num_heads,
            self.window_size,
            self.patch_size,
            self.drop_path_rate,
        )
        self.g_s = _SwinSynthesis(
            self.embed_dim,
            tuple(reversed(self.depths)),
            tuple(reversed(self.num_heads)),
            self.window_size,
            self.patch_size,
            self.drop_path_rate,
        )
        self.h_a = _HyperEncoderSTF(self.hyper_enc_widths)
        self.h_mean_s = _HyperDecoderSTF(self.hyper_dec_widths)
        self.h_scale_s = _HyperDecoderSTF(self.hyper_dec_widths)
        slice_ch = self.latent_dim // self.num_slices
        self.cc_mean_transforms = [
            _CCTransform(slice_ch, self.cc_widths, name=f"cc_mean_{i}")
            for i in range(self.num_slices)
        ]
        self.cc_scale_transforms = [
            _CCTransform(slice_ch, self.cc_widths, name=f"cc_scale_{i}")
            for i in range(self.num_slices)
        ]
        self.lrp_transforms = [
            _CCTransform(slice_ch, self.cc_widths, name=f"lrp_{i}")
            for i in range(self.num_slices)
        ]
        self.entropy_bottleneck = EntropyBottleneck(self.hyper_enc_widths[-1])
        self.gaussian_conditional = GaussianConditional()

    @nn.compact
    def __call__(self, x, training: bool = True):
        if not self.scan_charm:
            return super().__call__(x, training=training)
        from .cnn import charm_scan_forward

        return charm_scan_forward(self, x, training)

    # --- ChARM protocol (see base.CompressionModel) ------------------------
    def analyze(self, x, training: bool = False):
        y = self.g_a(x, deterministic=not training)
        return y, self.h_a(y)

    def synthesize(self, y_hat, training: bool = False):
        return self.g_s(y_hat, deterministic=not training)

    def ctx_prepare(self, z_hat):
        return {
            "means": self.h_mean_s(z_hat),
            "scales": self.h_scale_s(z_hat),
        }

    def latent_slices(self, y):
        return jnp.split(y, self.num_slices, axis=-1)

    @property
    def ctx_slices(self) -> int:
        return self.num_slices

    def ctx_support(self, i: int, decoded: list) -> list:
        return prefix_support(self.max_support_slices)(i, decoded)

    def slice_context(self, i, state, support):
        mean_support = jnp.concatenate([state["means"]] + support, axis=-1)
        mu = self.cc_mean_transforms[i](mean_support)
        scale_support = jnp.concatenate([state["scales"]] + support, axis=-1)
        scale = self.cc_scale_transforms[i](scale_support)
        return mu, scale, mean_support

    def slice_lrp(self, i, mean_support, y_hat_slice):
        lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
        return 0.5 * jnp.tanh(self.lrp_transforms[i](lrp_support))

    def ctx_assemble(self, y_hat_slices):
        return jnp.concatenate(y_hat_slices, axis=-1)
