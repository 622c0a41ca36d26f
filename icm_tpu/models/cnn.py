"""WACNN — window-attention CNN codec with ChARM context (registry: "cnn").

Behavioral parity with the reference ``WACNN`` (reference:
``compressai/models/cnn.py:23-332``): conv+GDN+window-attention analysis /
synthesis transforms, conv hyper-encoder, mean/scale hyper-decoders, and a
10-slice channel-autoregressive (ChARM) context with first-5 slice support,
STE rounding, and latent-residual prediction (LRP, 0.5*tanh).

TPU-native notes (all NHWC):
- the per-slice context convs keep their reference channel widths
  (320 + 32*min(i,5) inputs) and are unrolled statically under jit — 10
  iterations of dense 3x3 convs, each a clean MXU workload.
- ``__call__`` is the training/entropy-estimation path; the real-coder
  compress/decompress live in ``icm_tpu/models/codec.py`` and reuse the
  same submodules via ``nn.apply`` methods below.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy import EntropyBottleneck, GaussianConditional
from ..nn import (
    GDN,
    SubpelConv,
    Win_noShift_Attention,
    conv,
    conv3x3,
    deconv,
)
from .base import CompressionModel, prefix_support


class _AnalysisCNN(nn.Module):
    N: int
    M: int

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


class _SynthesisCNN(nn.Module):
    N: int
    M: int
    out_ch: int = 3

    @nn.compact
    def __call__(self, y):
        N, M = self.N, self.M
        y = Win_noShift_Attention(M, num_heads=8, window_size=4, shift_size=2)(y)
        y = deconv(N, 5, 2)(y)
        y = GDN(N, inverse=True)(y)
        y = deconv(N, 5, 2)(y)
        y = GDN(N, inverse=True)(y)
        y = Win_noShift_Attention(N, num_heads=8, window_size=8, shift_size=4)(y)
        y = deconv(N, 5, 2)(y)
        y = GDN(N, inverse=True)(y)
        y = deconv(self.out_ch, 5, 2)(y)
        return y


class _HyperEncoder(nn.Module):
    """Reference widths: (320, 288, 256, 224, 192) with strides 1,1,2,1,2
    (reference cnn.py:54-64)."""

    widths: tuple = (320, 288, 256, 224, 192)

    @nn.compact
    def __call__(self, y):
        strides = (1, 1, 2, 1, 2)
        for i, (w, s) in enumerate(zip(self.widths, strides)):
            if i > 0:
                y = jax.nn.gelu(y, approximate=False)
            y = conv3x3(w, stride=s)(y)
        return y


class _HyperDecoder(nn.Module):
    """h_mean_s / h_scale_s: conv + sub-pixel 2x upsample stack
    (reference cnn.py:66-88); reference widths (192, 224, 256, 288, 320)."""

    widths: tuple = (192, 224, 256, 288, 320)

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


class _CCTransform(nn.Module):
    """Per-slice context conv stack: 5x (3x3 conv + GELU), reference widths
    224->176->128->64->out (reference cnn.py:89-127)."""

    out_ch: int = 32
    widths: tuple = (224, 176, 128, 64)

    @nn.compact
    def __call__(self, x):
        for ch in self.widths:
            x = conv(ch, kernel_size=3, stride=1)(x)
            x = jax.nn.gelu(x, approximate=False)
        return conv(self.out_ch, kernel_size=3, stride=1)(x)


class _CharmScanStep(nn.Module):
    """One AR step of the ChARM loop, run under ``nn.scan`` with stacked
    per-slice parameters (SURVEY.md §7 "hard parts": per-slice context
    convs have different input widths — 320 + 32*min(i,5) — so supports
    are padded to the max width with zeros; the padded weight blocks see
    only zeros at their step, making the scanned computation exactly equal
    to the unrolled reference loop while compiling ONCE instead of
    ``num_slices`` times)."""

    slice_ch: int
    cc_widths: tuple
    max_support: int
    training: bool = True

    @nn.compact
    def __call__(self, carry, y_slice):
        means, scales, buf, i = carry
        mean_support = jnp.concatenate([means, buf], axis=-1)
        mu = _CCTransform(self.slice_ch, self.cc_widths, name="cc_mean")(
            mean_support
        )
        scale_support = jnp.concatenate([scales, buf], axis=-1)
        scale = _CCTransform(self.slice_ch, self.cc_widths, name="cc_scale")(
            scale_support
        )
        _, lik = GaussianConditional(name="gc")(
            y_slice, scale, mu, training=self.training
        )
        from ..ops import ste_round

        y_hat = ste_round(y_slice - mu) + mu
        lrp_support = jnp.concatenate([mean_support, y_hat], axis=-1)
        lrp = _CCTransform(self.slice_ch, self.cc_widths, name="lrp")(
            lrp_support
        )
        y_hat = y_hat + 0.5 * jnp.tanh(lrp)

        # prefix support: write slot i while i < max_support, then freeze
        slot = jnp.minimum(i, self.max_support - 1) * self.slice_ch
        updated = jax.lax.dynamic_update_slice(
            buf, y_hat, (0, 0, 0, slot)
        )
        buf = jnp.where(i < self.max_support, updated, buf)
        return (means, scales, buf, i + 1), (y_hat, lik)


class WACNN(CompressionModel):
    N: int = 192
    M: int = 320
    num_slices: int = 10
    max_support_slices: int = 5
    hyper_enc_widths: tuple = (320, 288, 256, 224, 192)
    hyper_dec_widths: tuple = (192, 224, 256, 288, 320)
    cc_widths: tuple = (224, 176, 128, 64)
    # scan_charm=True runs the AR slice loop as ONE lax.scan with stacked
    # per-slice weights (single compile, no per-slice dispatch) — exactly
    # equivalent to the unrolled loop; the unrolled path remains the
    # protocol used by the real-bitstream coder.
    scan_charm: bool = False

    def setup(self):
        self.g_a = _AnalysisCNN(self.N, self.M)
        self.g_s = _SynthesisCNN(self.N, self.M)
        self.h_a = _HyperEncoder(self.hyper_enc_widths)
        self.h_mean_s = _HyperDecoder(self.hyper_dec_widths)
        self.h_scale_s = _HyperDecoder(self.hyper_dec_widths)
        slice_ch = self.M // self.num_slices
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
        return charm_scan_forward(self, x, training)

    # --- ChARM protocol (see base.CompressionModel) ------------------------
    def analyze(self, x, training: bool = False):
        y = self.g_a(x)
        return y, self.h_a(y)

    def synthesize(self, y_hat, training: bool = False):
        return self.g_s(y_hat)

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


def charm_scan_forward(mdl, x, training: bool):
    """Shared scan_charm training forward for prefix-support ChARM
    models (WACNN ``cnn.py``, stf ``stf.py``): the AR slice loop as ONE
    ``lax.scan`` over stacked per-slice weights — numerically equivalent
    to the unrolled protocol (the first conv's padded input slots
    multiply zeroed support channels), but a single compiled program.
    Caller must be inside the model's ``@nn.compact __call__``."""
    from ..ops import ste_round

    y, z = mdl.analyze(x, training=training)
    _, z_likelihoods = mdl.entropy_bottleneck(z, training=training)
    z_offset = mdl.eb_medians()
    z_hat = ste_round(z - z_offset) + z_offset
    state = mdl.ctx_prepare(z_hat)
    means, scales = state["means"], state["scales"]

    B, h, w, M = y.shape
    S = mdl.ctx_slices
    sc = M // S
    y_stack = jnp.moveaxis(y.reshape(B, h, w, S, sc), 3, 0)
    buf = jnp.zeros((B, h, w, mdl.max_support_slices * sc), y.dtype)

    Scan = nn.scan(
        _CharmScanStep,
        variable_axes={"params": 0},
        split_rngs={"params": True, "noise": True},
        in_axes=0,
        out_axes=0,
        length=S,
    )
    _, (y_hat_stack, lik_stack) = Scan(
        slice_ch=sc,
        cc_widths=mdl.cc_widths,
        max_support=mdl.max_support_slices,
        training=training,
        name="charm_scan",
    )((means, scales, buf, jnp.int32(0)), y_stack)

    y_hat = jnp.moveaxis(y_hat_stack, 0, 3).reshape(B, h, w, M)
    y_likelihoods = jnp.moveaxis(lik_stack, 0, 3).reshape(B, h, w, M)
    x_hat = mdl.synthesize(y_hat, training=training)
    return {
        "x_hat": x_hat,
        "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
    }


def stack_charm_params(
    params: dict,
    num_slices: int,
    slice_ch: int,
    max_support: int,
    cond_width: int,
) -> dict:
    """Build the ``charm_scan`` stacked parameter subtree from unrolled
    per-slice params (``cc_mean_{i}``/``cc_scale_{i}``/``lrp_{i}``),
    zero-padding the first conv's input-channel axis to the uniform
    scanned support width. Used to migrate unrolled (reference-layout)
    checkpoints into the scanned model; the zero blocks multiply the
    zero-initialized support slots, so outputs are exactly equal."""
    import numpy as np

    from .base import fetch_params

    sup_w_max = max_support * slice_ch
    params = fetch_params(
        {k: v for k, v in params.items()
         if k.rsplit("_", 1)[0] in ("cc_mean", "cc_scale", "lrp")}
    )
    out = {}
    for tag in ("cc_mean", "cc_scale", "lrp"):
        layers: dict = {}
        layer_names = list(params[f"{tag}_0"].keys())
        for ln in layer_names:
            kernels, biases = [], []
            for i in range(num_slices):
                p = params[f"{tag}_{i}"][ln]
                k = np.asarray(p["kernel"])
                if ln == "Conv_0":
                    if tag == "lrp":
                        sup_w = k.shape[2] - cond_width - slice_ch
                        target = cond_width + sup_w_max + slice_ch
                        kn = np.zeros(k.shape[:2] + (target, k.shape[3]), k.dtype)
                        kn[:, :, : cond_width + sup_w] = k[:, :, : cond_width + sup_w]
                        kn[:, :, -slice_ch:] = k[:, :, -slice_ch:]
                    else:
                        target = cond_width + sup_w_max
                        kn = np.zeros(k.shape[:2] + (target, k.shape[3]), k.dtype)
                        kn[:, :, : k.shape[2]] = k
                    k = kn
                kernels.append(k)
                biases.append(np.asarray(p["bias"]))
            layers[ln] = {
                "kernel": np.stack(kernels),
                "bias": np.stack(biases),
            }
        out[tag] = layers
    return {"charm_scan": out}


def unstack_charm_params(
    stacked: dict,
    num_slices: int,
    slice_ch: int,
    max_support: int,
    cond_width: int,
) -> dict:
    """Inverse of :func:`stack_charm_params`: split the ``charm_scan``
    stacked subtree back into per-slice ``cc_mean_{i}``/``cc_scale_{i}``/
    ``lrp_{i}`` params (slicing away the zero-padded support channels), so
    scan-trained checkpoints drive the real-bitstream coder."""
    import numpy as np

    from .base import fetch_params

    sub = fetch_params(stacked["charm_scan"])
    out: dict = {}
    for tag in ("cc_mean", "cc_scale", "lrp"):
        for i in range(num_slices):
            layers = {}
            for ln, p in sub[tag].items():
                k = np.asarray(p["kernel"][i])
                if ln == "Conv_0":
                    if tag == "lrp":
                        sup_w = slice_ch * min(i + 1, max_support + 1)
                        kept = np.concatenate(
                            [
                                k[:, :, : cond_width + sup_w - slice_ch],
                                k[:, :, -slice_ch:],
                            ],
                            axis=2,
                        )
                    else:
                        sup_w = slice_ch * min(i, max_support)
                        kept = k[:, :, : cond_width + sup_w]
                    k = kept
                layers[ln] = {"kernel": k, "bias": np.asarray(p["bias"][i])}
            out[f"{tag}_{i}"] = layers
    return out
