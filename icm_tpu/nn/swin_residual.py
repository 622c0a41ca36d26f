"""Plain Swin feature backbone + conv transforms with Swin residuals.

Behavioral parity with the reference ``swinResidual.SwinTransformer2``
(reference: ``compressai/models/swinResidual.py:499-600``) and the
``analysisTransformModel``/``synthesisTransformModel`` conv stacks in
stf2/stf3/stf4 (reference ``stf3.py:470-563``): a patch-size-1 Swin
stack used as a residual feature refiner between strided convs. (In the
exercised reference forwards most of these residual adds are commented
out; the component is provided for parity and ablation.)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax

from .layers import conv, deconv
from .swin import BasicLayer, PatchEmbed


class SwinTransformer2(nn.Module):
    """Patch-embed (patch 1 by default) + Swin stages, same-resolution
    feature output (no downsampling between stages — matches the
    reference's residual-refiner configuration)."""

    embed_dim: int = 96
    patch_size: int = 1
    depths: Tuple[int, ...] = (2, 2)
    num_heads: Tuple[int, ...] = (2, 2)
    window_size: int = 7

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = PatchEmbed(self.patch_size, self.embed_dim, name="embed")(x)
        for i, (d, h) in enumerate(zip(self.depths, self.num_heads)):
            x = BasicLayer(
                dim=self.embed_dim,
                depth=d,
                num_heads=h,
                window_size=self.window_size,
                name=f"layer{i}",
            )(x, deterministic)
        return x


class AnalysisTransformModel(nn.Module):
    """4x stride-2 convs with optional Swin residual refiners
    (reference stf3.py:470-520)."""

    num_filters: Tuple[int, ...]
    swin_residual: Tuple[bool, ...] = (False, True, False, False)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i, nf in enumerate(self.num_filters):
            x = conv(nf, 5, 2)(x)
            if self.swin_residual[i]:
                x = x + SwinTransformer2(
                    embed_dim=nf, window_size=7, name=f"swin{i}"
                )(x, deterministic)
        return x


class SynthesisTransformModel(nn.Module):
    """4x stride-2 deconvs with optional Swin residual refiners
    (reference stf3.py:524-563)."""

    num_filters: Tuple[int, ...]
    swin_residual: Tuple[bool, ...] = (False, True, False, False)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i, nf in enumerate(self.num_filters):
            x = deconv(nf, 5, 2)(x)
            if self.swin_residual[i]:
                x = x + SwinTransformer2(
                    embed_dim=nf, window_size=7, name=f"swin{i}"
                )(x, deterministic)
        return x
