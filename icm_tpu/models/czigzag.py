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


class _CzigzagScanStep(nn.Module):
    """One AR step of czigzag's conditioned zigzag loop under ``nn.scan``
    with stacked per-slice weights (the same trick as
    stf_family._ZigzagScanStep): the decoded-slice support is padded to
    ``max_support`` width with zeros (right-aligned, newest last) so the
    scanned computation equals the unrolled loop while the conditioned
    context compiles ONCE instead of ``ctx_slices`` times. czigzag's
    context additionally concatenates a look-ahead window of hyper-context
    zigzag blocks (reference czigzag.py:1102-1110) — carried as a third
    stacked conditioning tensor."""

    slice_ch: int
    cc_widths: Tuple[int, ...]
    max_support: int
    window: int  # support_num: look-ahead width of mean/scale/hctx blocks
    n_steps: int
    training: bool = True

    @nn.compact
    def __call__(self, carry, y_slice):
        from ..entropy import GaussianConditional as _GC

        cond_m, cond_s, hctx, buf, i = carry
        w = self.window
        # blocks[i:i+w] with tail clamp blocks[N-w:] (czigzag.py:1104)
        start = jnp.minimum(i, self.n_steps - w)
        pick = lambda t: jnp.concatenate(
            [
                jax.lax.dynamic_slice_in_dim(t, start, w, axis=0)[j]
                for j in range(w)
            ],
            axis=-1,
        )
        cm, cs, hc = pick(cond_m), pick(cond_s), pick(hctx)

        mean_support = jnp.concatenate([cm, buf, hc], axis=-1)
        mu = _CCTransform(self.slice_ch, self.cc_widths, name="cc_mean")(
            mean_support
        )
        scale_support = jnp.concatenate([cs, buf, hc], axis=-1)
        scale = _CCTransform(self.slice_ch, self.cc_widths, name="cc_scale")(
            scale_support
        )
        _, lik = _GC(name="gc")(y_slice, scale, mu, training=self.training)
        y_hat = ste_round(y_slice - mu) + mu
        lrp_support = jnp.concatenate([mean_support, y_hat], axis=-1)
        lrp = _CCTransform(self.slice_ch, self.cc_widths, name="lrp")(
            lrp_support
        )
        y_hat = y_hat + 0.5 * jnp.tanh(lrp)

        sc = self.slice_ch
        buf = jnp.concatenate([buf[..., sc:], y_hat], axis=-1)
        return (cond_m, cond_s, hctx, buf, i + 1), (y_hat, lik)


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
    # scan_charm=True runs the conditioned AR loop as ONE lax.scan with
    # stacked per-slice weights — numerically equal to the unrolled loop,
    # but the context compiles once instead of ctx_slices times (the
    # czigzag warmup was dominated by 16 per-slice compiles). The
    # unrolled path remains the protocol the real coder drives.
    scan_charm: bool = False

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

    @nn.compact
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

        if self.scan_charm:
            y_stack = jnp.stack(y_blocks, axis=0)  # (N, B, h', w', sc)
            N, B, h, w, sc = y_stack.shape
            cond_m = jnp.stack(state["means"], axis=0)
            cond_s = jnp.stack(state["scales"], axis=0)
            hctx = jnp.stack(state["hctx"], axis=0)
            buf = jnp.zeros((B, h, w, self.max_support * sc), y.dtype)
            Scan = nn.scan(
                _CzigzagScanStep,
                variable_axes={"params": 0},
                split_rngs={"params": True, "noise": True, "dropout": True},
                in_axes=0,
                out_axes=0,
                length=N,
            )
            _, (y_hat_stack, lik_stack) = Scan(
                slice_ch=sc,
                cc_widths=self.cc_widths,
                max_support=self.max_support,
                window=min(self.support_num, N),
                n_steps=N,
                training=training,
                name="czigzag_scan",
            )((cond_m, cond_s, hctx, buf, jnp.int32(0)), y_stack)
            y_hat = self.ctx_assemble([y_hat_stack[i] for i in range(N)])
            y_likelihoods = jnp.concatenate(
                [lik_stack[i] for i in range(N)], axis=-1
            )
            x_hat = self.synthesize_cond(
                y_hat, decoder_contexts, training=training
            )
            return {
                "x_hat": x_hat,
                "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
            }

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


def _czigzag_dims(model: "conditionalZigzag"):
    n = model.ctx_slices
    sc = model.latent_dim // model.num_slices
    w = min(model.support_num, n)
    return n, sc, w * sc, model.max_support


def stack_czigzag_params(params: dict, model: "conditionalZigzag") -> dict:
    """Unrolled conditionalZigzag params -> params for the same model with
    ``scan_charm=True`` (numerically identical forward; see
    tests/test_czigzag.py). Per-slice ``Conv_0`` kernels are zero-padded to
    the scan's fixed support width: input sections are
    [cond window | decoded support (k->max, right-aligned) | hctx window
    (+ y_hat for lrp)]."""
    from .base import fetch_params

    n, sc, cond_w, max_sup = _czigzag_dims(model)
    per_slice = fetch_params(
        {k: v for k, v in params.items()
         if k.rsplit("_", 1)[0] in ("cc_mean", "cc_scale", "lrp")}
    )

    def group(tag: str, lrp: bool = False):
        outs = []
        for i in range(n):
            tree = per_slice[f"{tag}_{i}"]
            k = min(i, max_sup)
            kern = np.asarray(tree["Conv_0"]["kernel"])
            kh, kw, _, cout = kern.shape
            tail = cond_w + (sc if lrp else 0)  # hctx window (+ y_hat)
            new = np.zeros(
                (kh, kw, cond_w + max_sup * sc + tail, cout), kern.dtype
            )
            new[:, :, :cond_w] = kern[:, :, :cond_w]
            off = cond_w + (max_sup - k) * sc  # sliding: right-align newest
            new[:, :, off : off + k * sc] = kern[
                :, :, cond_w : cond_w + k * sc
            ]
            new[:, :, cond_w + max_sup * sc :] = kern[:, :, cond_w + k * sc :]
            outs.append(
                {
                    key: (
                        {
                            "kernel": new,
                            "bias": np.asarray(tree["Conv_0"]["bias"]),
                        }
                        if key == "Conv_0"
                        else tree[key]
                    )
                    for key in tree
                }
            )
        return jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *outs
        )

    scan = {
        "cc_mean": group("cc_mean"),
        "cc_scale": group("cc_scale"),
        "lrp": group("lrp", lrp=True),
    }
    drop = {
        f"{t}_{i}" for t in ("cc_mean", "cc_scale", "lrp") for i in range(n)
    }
    out = {k: v for k, v in params.items() if k not in drop}
    out["czigzag_scan"] = scan
    return out


def unstack_czigzag_params(
    scan_params: dict, model: "conditionalZigzag"
) -> dict:
    """Inverse of stack_czigzag_params (drops the zero padding, which
    carries no information)."""
    from .base import fetch_params

    n, sc, cond_w, max_sup = _czigzag_dims(model)
    scan_params = fetch_params(
        {k: scan_params[k] for k in ("cc_mean", "cc_scale", "lrp")}
    )
    out = {}
    for tag in ("cc_mean", "cc_scale", "lrp"):
        stacked = scan_params[tag]
        for i in range(n):
            tree = jax.tree_util.tree_map(
                lambda x: np.asarray(x[i]), stacked
            )
            k = min(i, max_sup)
            kern = tree["Conv_0"]["kernel"]
            off = cond_w + (max_sup - k) * sc
            tree["Conv_0"]["kernel"] = np.concatenate(
                [
                    kern[:, :, :cond_w],
                    kern[:, :, off : off + k * sc],
                    kern[:, :, cond_w + max_sup * sc :],
                ],
                axis=2,
            )
            out[f"{tag}_{i}"] = tree
    return out
