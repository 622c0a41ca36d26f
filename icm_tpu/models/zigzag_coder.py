"""Reusable zigzag ChARM coding layer.

One self-contained entropy-coding layer — hyper encoder/decoders, zigzag
context conv stacks, EntropyBottleneck + GaussianConditional — as used by
the machine/segmentation layers of the CRC family and the ICM codecs
(reference: the identical inline blocks in ``fasterRCNN_ICM.py:62-82``
(coder config num_slices=2, support 8/4), ``stf13.py:118-133`` (6 slices,
support 24/12), ``stf9/11/12/14``; context stacks built by
``baseLayer.hyperContextMean/LRP``).

Context semantics (parity with ``fasterRCNN_ICM.py:238-275`` /
``stf13.py:467-535``):
  - y/means/scales zigzag-split into num_slices x 2x2 blocks,
    channel-UNCONSTRAINED traversal (stf13 generator);
  - sliding support of the last ``max_support`` decoded blocks;
  - mean/scale conditioning = look-ahead window of ``support_num`` zigzag
    mean/scale blocks clamped at the tail;
  - shallow 3-conv context stacks; LRP 0.5*tanh.

Implements the ChARM protocol *as a sub-layer* (its ``code`` method is the
whole training loop for this latent), so multi-layer models compose it and
``codec.CharmCodec``-style drivers can code each layer independently.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..entropy import EntropyBottleneck, GaussianConditional
from ..nn.factories import HyperEncoder384, HyperMean384, ShallowCC
from ..ops import ste_round
from ..scan import zigzag_merge, zigzag_split
from .base import sliding_support


class ZigzagCharmCoder(nn.Module):
    latent_dim: int = 384
    num_slices: int = 6
    spatial_number: int = 2
    zigzag_constrained: bool = False  # stf13/fasterRCNN generator variant
    max_support: int = 12
    support_num: int = 24  # mean/scale look-ahead window (zigzag blocks)
    hyper_enc_widths: Tuple[int, ...] = (384, 336, 288, 240, 192)
    hyper_dec_widths: Tuple[int, ...] = (240, 288, 336, 384, 384)
    cc_widths: Tuple[int, ...] = (224, 64)
    # stf9/11 compute LRP transforms but do not apply them
    # (reference stf9.py:1094-1106, the 0.5*tanh add is commented out)
    apply_lrp: bool = True

    @property
    def ctx_slices(self) -> int:
        return self.num_slices * self.spatial_number ** 2

    @property
    def slice_ch(self) -> int:
        return self.latent_dim // self.num_slices

    def setup(self):
        self.h_a = HyperEncoder384(self.hyper_enc_widths)
        self.h_mean_s = HyperMean384(self.hyper_dec_widths)
        self.h_scale_s = HyperMean384(self.hyper_dec_widths)
        N = self.ctx_slices
        self.cc_mean_transforms = [
            ShallowCC(self.slice_ch, self.cc_widths, name=f"cc_mean_{i}")
            for i in range(N)
        ]
        self.cc_scale_transforms = [
            ShallowCC(self.slice_ch, self.cc_widths, name=f"cc_scale_{i}")
            for i in range(N)
        ]
        self.lrp_transforms = [
            ShallowCC(self.slice_ch, self.cc_widths, name=f"lrp_{i}")
            for i in range(N)
        ]
        self.entropy_bottleneck = EntropyBottleneck(self.hyper_enc_widths[-1])
        self.gaussian_conditional = GaussianConditional()

    # --- protocol pieces ---------------------------------------------------
    def _split(self, t):
        zz = zigzag_split(
            t, self.num_slices, self.spatial_number, self.spatial_number,
            self.zigzag_constrained,
        )
        return [zz[:, i] for i in range(zz.shape[1])]

    def ctx_prepare(self, z_hat):
        return {
            "means": self._split(self.h_mean_s(z_hat)),
            "scales": self._split(self.h_scale_s(z_hat)),
        }

    def latent_slices(self, y):
        return self._split(y)

    def ctx_support(self, i: int, decoded: list) -> list:
        return sliding_support(self.max_support)(i, decoded)

    def _cond(self, blocks: list, i: int) -> list:
        N = self.ctx_slices
        w = min(self.support_num, N)
        if i + w > N:
            return blocks[N - w :]
        return blocks[i : i + w]

    def slice_context(self, i, state, support):
        mean_support = jnp.concatenate(
            self._cond(state["means"], i) + support, axis=-1
        )
        mu = self.cc_mean_transforms[i](mean_support)
        scale_support = jnp.concatenate(
            self._cond(state["scales"], i) + support, axis=-1
        )
        scale = self.cc_scale_transforms[i](scale_support)
        return mu, scale, mean_support

    def slice_lrp(self, i, mean_support, y_hat_slice):
        lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
        return 0.5 * jnp.tanh(self.lrp_transforms[i](lrp_support))

    def ctx_assemble(self, y_hat_slices):
        zz = jnp.stack(y_hat_slices, axis=1)
        return zigzag_merge(
            zz, self.num_slices, self.spatial_number, self.spatial_number,
            self.zigzag_constrained,
        )

    def eb_medians(self):
        return self.entropy_bottleneck.medians()[:, 0, 0]

    # --- full training/entropy-estimation loop for this latent -------------
    def code(self, y, training: bool = True):
        """y -> (y_hat, {"y": y_likelihoods, "z": z_likelihoods})."""
        z = self.h_a(y)
        _, z_likelihoods = self.entropy_bottleneck(z, training=training)
        z_offset = self.eb_medians()
        z_hat = ste_round(z - z_offset) + z_offset

        state = self.ctx_prepare(z_hat)
        y_slices = self.latent_slices(y)
        y_hat_slices, y_likelihood = [], []
        for i in range(self.ctx_slices):
            support = self.ctx_support(i, y_hat_slices)
            mu, scale, mean_support = self.slice_context(i, state, support)
            _, lik = self.gaussian_conditional(
                y_slices[i], scale, mu, training=training
            )
            y_likelihood.append(lik)
            y_hat_slice = ste_round(y_slices[i] - mu) + mu
            if self.apply_lrp:
                y_hat_slice = y_hat_slice + self.slice_lrp(
                    i, mean_support, y_hat_slice
                )
            y_hat_slices.append(y_hat_slice)

        y_hat = self.ctx_assemble(y_hat_slices)
        y_likelihoods = jnp.concatenate(y_likelihood, axis=-1)
        return y_hat, {"y": y_likelihoods, "z": z_likelihoods}
