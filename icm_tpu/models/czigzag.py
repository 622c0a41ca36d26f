"""czigzag — cross-attention conditional codec (registry: "czigzag").

Behavioral parity with the reference ``conditionalZigzag`` (reference:
``compressai/models/czigzag.py:472-1360``): a second input ``up_x4`` (a
GAN-upsampled low-bitrate reconstruction) is patch-embedded with the SAME
patch embed as x (czigzag.py:953-954) and injected as K/V at every Swin
stage via cross window attention (``WindowAttention_context``,
czigzag.py:123-197); the hyper encoder/decoders are cross-conditioned Swin
stacks at two scales (hyper downsamples by 2, not 4); the zigzag entropy
context (4 channel slices x 2x2 blocks, channel-unconstrained order,
sliding support 6, mean window 6 with tail clamp) additionally concatenates
the zigzag-split hyper context blocks into every mean/scale support
(czigzag.py:1102-1110); synthesis is conditioned on the context pyramid in
reverse (czigzag.py:1160-1167). ``forward(x, up_x4)``.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyBottleneck, GaussianConditional
from ..nn.layers import conv, conv3x3, SubpelConv
from ..nn.swin import BasicLayer, BasicLayerCross, PatchEmbed
from ..ops import ste_round
from ..scan import zigzag_merge, zigzag_split
from .base import CompressionModel, sliding_support
from .cnn import _CCTransform


class conditionalZigzag(CompressionModel):
    embed_dim: int = 48
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 4
    patch_size: int = 2
    drop_path_rate: float = 0.2
    num_slices: int = 4
    max_support: int = 6
    support_num: int = 6
    hyper_depths: Tuple[int, ...] = (2, 6)
    cc_widths: Tuple[int, ...] = (224, 176, 128, 64)

    @property
    def latent_dim(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)

    @property
    def ctx_slices(self) -> int:
        return self.num_slices * 4

    def setup(self):
        n = len(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        self.patch_embed = PatchEmbed(self.patch_size, self.embed_dim)
        self.layers = [
            BasicLayerCross(
                dim=int(self.embed_dim * 2 ** i),
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                drop_path=dpr[sum(self.depths[:i]) : sum(self.depths[: i + 1])],
                downsample="merge" if i < n - 1 else None,
                name=f"layer{i}",
            )
            for i in range(n)
        ]
        rdepths = tuple(reversed(self.depths))
        rheads = tuple(reversed(self.num_heads))
        self.syn_layers = [
            BasicLayerCross(
                dim=int(self.embed_dim * 2 ** (n - 1 - i)),
                depth=rdepths[i],
                num_heads=rheads[i],
                window_size=self.window_size,
                drop_path=dpr[sum(rdepths[:i]) : sum(rdepths[: i + 1])],
                downsample="split" if i < n - 1 else None,
                name=f"syn_layer{i}",
            )
            for i in range(n)
        ]
        # context downsampling pyramids (conv3x3 stride 2 per stage)
        self.encoder_context = [
            conv3x3(int(self.embed_dim * 2 ** (i + 1)), stride=2)
            for i in range(n - 1)
        ]
        self.hyper_context = [
            conv3x3(int(self.embed_dim * 2 ** (i + 1)), stride=2)
            for i in range(n - 1)
        ]
        self.decoder_context = [
            conv3x3(int(self.embed_dim * 2 ** (i + 1)), stride=2)
            for i in range(n - 1)
        ]

        M = self.latent_dim
        half = M // 2
        self.hyper_encoder_layers = [
            BasicLayerCross(
                dim=M, depth=self.hyper_depths[0], num_heads=4,
                window_size=self.window_size, name="hyper_enc0",
            ),
            BasicLayerCross(
                dim=half, depth=self.hyper_depths[1], num_heads=4,
                window_size=self.window_size, name="hyper_enc1",
            ),
        ]
        self.hyper_encoder_conv1 = conv3x3(half)
        self.hyper_encoder_conv1_2 = conv3x3(half)
        self.hyper_encoder_conv2 = conv3x3(half, stride=2)

        self.hyper_decoder_mean = [
            BasicLayerCross(
                dim=half, depth=self.hyper_depths[0], num_heads=4,
                window_size=self.window_size, name="hyper_dec_mean0",
            ),
            BasicLayerCross(
                dim=M, depth=self.hyper_depths[1], num_heads=4,
                window_size=self.window_size, name="hyper_dec_mean1",
            ),
        ]
        self.hyper_decoder_scale = [
            BasicLayerCross(
                dim=half, depth=self.hyper_depths[0], num_heads=4,
                window_size=self.window_size, name="hyper_dec_scale0",
            ),
            BasicLayerCross(
                dim=M, depth=self.hyper_depths[1], num_heads=4,
                window_size=self.window_size, name="hyper_dec_scale1",
            ),
        ]
        self.hyper_decoder_conv_mean1 = SubpelConv(half, r=2)
        self.hyper_decoder_conv_mean2 = conv3x3(M)
        self.hyper_decoder_conv_scale1 = SubpelConv(half, r=2)
        self.hyper_decoder_conv_scale2 = conv3x3(M)

        slice_ch = M // self.num_slices
        N = self.ctx_slices
        self.cc_mean_transforms = [
            _CCTransform(slice_ch, self.cc_widths, name=f"cc_mean_{i}")
            for i in range(N)
        ]
        self.cc_scale_transforms = [
            _CCTransform(slice_ch, self.cc_widths, name=f"cc_scale_{i}")
            for i in range(N)
        ]
        self.lrp_transforms = [
            _CCTransform(slice_ch, self.cc_widths, name=f"lrp_{i}")
            for i in range(N)
        ]

        self.entropy_bottleneck = EntropyBottleneck(self.latent_dim // 2)
        self.gaussian_conditional = GaussianConditional()
        self.end_up = SubpelConv(self.embed_dim, r=self.patch_size, kernel_size=5)
        self.end_to_rgb = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)))

    # --- helpers -----------------------------------------------------------
    def _split(self, t):
        zz = zigzag_split(t, self.num_slices, 2, 2, constrained=False)
        return [zz[:, i] for i in range(zz.shape[1])]

    def _window(self, blocks: list, i: int) -> list:
        N = self.ctx_slices
        w = min(self.support_num, N)
        if i + w > N:
            return blocks[N - w :]
        return blocks[i : i + w]

    # --- coder-facing stages -------------------------------------------------
    def ctx_pyramids(self, up_x4, training: bool = False):
        """Decoder-side conditioning pyramids from up_x4: (analysis ctx
        list, hyper_ctx, hyper_ctx2, decoder_contexts)."""
        ctx = self.patch_embed(up_x4)  # shared embed (czigzag.py:953-954)
        ctx_list = [ctx]
        hyper_ctx = ctx
        decoder_contexts = [ctx]
        n = len(self.depths)
        for i in range(n - 1):
            ctx_list.append(self.encoder_context[i](ctx_list[-1]))
            hyper_ctx = self.hyper_context[i](hyper_ctx)
            decoder_contexts.append(
                self.decoder_context[i](decoder_contexts[-1])
            )
        hyper_ctx2 = self.hyper_encoder_conv1(hyper_ctx)
        return ctx_list, hyper_ctx, hyper_ctx2, decoder_contexts

    def analyze_cond(self, x, ctx_list, training: bool = False):
        det = not training
        h = self.patch_embed(x)
        n = len(self.depths)
        for i in range(n):
            h = self.layers[i](h, ctx_list[i], det)
        return h  # y

    def hyper_encode(self, y, hyper_ctx, hyper_ctx2, training: bool = False):
        det = not training
        z = self.hyper_encoder_layers[0](y, hyper_ctx, det)
        z = self.hyper_encoder_conv1_2(z)
        z = self.hyper_encoder_layers[1](z, hyper_ctx2, det)
        return self.hyper_encoder_conv2(z)

    def hyper_decode(self, z_hat, hyper_ctx, hyper_ctx2, training: bool = False):
        det = not training
        m = self.hyper_decoder_conv_mean1(z_hat)
        m = self.hyper_decoder_mean[0](m, hyper_ctx2, det)
        m = self.hyper_decoder_conv_mean2(m)
        latent_means = self.hyper_decoder_mean[1](m, hyper_ctx, det)

        s = self.hyper_decoder_conv_scale1(z_hat)
        s = self.hyper_decoder_scale[0](s, hyper_ctx2, det)
        s = self.hyper_decoder_conv_scale2(s)
        latent_scales = self.hyper_decoder_scale[1](s, hyper_ctx, det)
        return latent_means, latent_scales

    def ctx_prepare_cond(self, z_hat, hyper_ctx, hyper_ctx2):
        means, scales = self.hyper_decode(z_hat, hyper_ctx, hyper_ctx2)
        return {
            "means": self._split(means),
            "scales": self._split(scales),
            "hctx": self._split(hyper_ctx),
        }

    def latent_slices(self, y):
        return self._split(y)

    def slice_context(self, i, state, support):
        hctx = self._window(state["hctx"], i)
        mean_support = jnp.concatenate(
            self._window(state["means"], i) + support + hctx, axis=-1
        )
        mu = self.cc_mean_transforms[i](mean_support)
        scale_support = jnp.concatenate(
            self._window(state["scales"], i) + support + hctx, axis=-1
        )
        scale = self.cc_scale_transforms[i](scale_support)
        return mu, scale, mean_support

    def slice_lrp(self, i, mean_support, y_hat_slice):
        lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
        return 0.5 * jnp.tanh(self.lrp_transforms[i](lrp_support))

    def ctx_assemble(self, y_hat_slices):
        return zigzag_merge(
            jnp.stack(y_hat_slices, axis=1), self.num_slices, 2, 2, False
        )

    def synthesize_cond(self, y_hat, decoder_contexts, training: bool = False):
        det = not training
        n = len(self.depths)
        h = y_hat
        for i in range(n):
            h = self.syn_layers[i](h, decoder_contexts[n - 1 - i], det)
        # end conv: 5x5 + depth-to-space(patch) + 3x3 (as stf)
        return self.end_to_rgb(self.end_up(h))

    def eb_medians(self):
        return self.entropy_bottleneck.medians()[:, 0, 0]

    def __call__(self, x, up_x4, training: bool = True):
        ctx_list, hyper_ctx, hyper_ctx2, decoder_contexts = self.ctx_pyramids(
            up_x4, training=training
        )
        y = self.analyze_cond(x, ctx_list, training=training)
        z = self.hyper_encode(y, hyper_ctx, hyper_ctx2, training=training)

        _, z_likelihoods = self.entropy_bottleneck(z, training=training)
        z_off = self.eb_medians()
        z_hat = ste_round(z - z_off) + z_off

        state = self.ctx_prepare_cond(z_hat, hyper_ctx, hyper_ctx2)
        y_blocks = self.latent_slices(y)
        support_fn = sliding_support(self.max_support)
        y_hat_slices, y_likelihood = [], []
        for i in range(self.ctx_slices):
            support = support_fn(i, y_hat_slices)
            mu, scale, mean_support = self.slice_context(i, state, support)
            _, lik = self.gaussian_conditional(
                y_blocks[i], scale, mu, training=training
            )
            y_likelihood.append(lik)
            y_hat_slice = ste_round(y_blocks[i] - mu) + mu
            y_hat_slice = y_hat_slice + self.slice_lrp(
                i, mean_support, y_hat_slice
            )
            y_hat_slices.append(y_hat_slice)

        y_hat = self.ctx_assemble(y_hat_slices)
        y_likelihoods = jnp.concatenate(y_likelihood, axis=-1)
        x_hat = self.synthesize_cond(y_hat, decoder_contexts, training=training)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }
