"""The stf5-stf8 family: Swin codec + zigzag/sliding context + Swin refiners.

One parameterized model covers four reference variants that differ only in
context configuration (the reference re-pastes ~1000 lines per variant):

  - stf5 ``SymmetricalTransFormer2`` (reference stf5.py:384-1084): 12
    channel slices, sliding support num_slices//2, full-latent mean
    conditioning, mu/sigma/LRP refiners of reversed-depth Swin stacks
    (2,6,2,2) at window 4.
  - stf6 ``SymmetricalTransFormer3`` (stf6.py:384-1057; stf6_2 is
    byte-identical): 6 channel slices x 2x2 spatial zigzag = 24 slices,
    sliding support 16, mean conditioning = the co-located zigzag mean
    block (window 1), mu refiner only (sigma/LRP built but disabled in
    the reference forward — reproduced as disabled).
  - stf7 ``SymmetricalTransFormer4`` (stf7.py:384-1093): 12 channel
    slices, prefix support 6, full-latent means, light refiners
    mu (2,6) / sigma (2,2) / LRP (2,6) at window 8.
  - stf8 ``SymmetricalTransFormer5`` (stf8.py:384-1087): zigzag 6x4,
    sliding support 12, mean conditioning = look-ahead window of
    support_num=24 zigzag mean blocks (clamped at the tail,
    stf8.py:829-833), refiners mu (2,6) / sigma (2,2) / LRP (2,6) at
    window 8.

Implements the ChARM protocol, so training forward (base.__call__) and the
real coder (codec.CharmCodec) come for free. TPU-native: zigzag split is a
static gather (icm_tpu/scan), refiners are shared-stack Swin modules.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..scan import zigzag_merge, zigzag_split
from .base import CompressionModel, prefix_support, sliding_support
from .cnn import _CCTransform
from .stf import (
    SymmetricalTransFormer,
    _HyperDecoderSTF,
    _HyperEncoderSTF,
    _SwinAnalysis,
    _SwinSynthesis,
)
from ..entropy import EntropyBottleneck, GaussianConditional
from ..nn.swin import BasicLayer


class _Refiner(nn.Module):
    """Residual per-slice Swin refinement stack (reference stf5.py:484-570:
    per-slice BasicLayer stacks added residually to the conv context
    output)."""

    dim: int
    depths: Tuple[int, ...]
    num_heads: int = 4
    window_size: int = 4
    drop_path_rate: float = 0.2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        r = x
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        for j, d in enumerate(self.depths):
            r = BasicLayer(
                dim=self.dim,
                depth=d,
                num_heads=self.num_heads,
                window_size=self.window_size,
                drop_path=dpr[sum(self.depths[:j]) : sum(self.depths[: j + 1])],
                name=f"stage{j}",
            )(r, deterministic)
        return x + r


class _ZigzagScanStep(nn.Module):
    """One AR step of the zigzag/sliding ChARM loop, run under ``nn.scan``
    with stacked per-slice parameters (same trick as cnn._CharmScanStep:
    supports are padded to the max width with zeros, so the scanned
    computation equals the unrolled loop while the context compiles ONCE
    instead of ``ctx_slices`` times — the fix for the reference family's
    12x4 per-slice Swin refiner stacks blowing up graph size,
    stf5.py:484-570)."""

    slice_ch: int
    cc_widths: Tuple[int, ...]
    max_support: int
    support_mode: str  # "prefix" | "sliding"
    cond_mode: str  # "full" | "window"
    mean_window: int
    n_steps: int
    mu_refine: Tuple[int, ...]
    scale_refine: Tuple[int, ...]
    lrp_refine: Tuple[int, ...]
    refine_window: int
    refine_heads: int
    drop_path_rate: float
    training: bool = True

    def _refine(self, x, depths, tag):
        if not depths:
            return x
        return _Refiner(
            dim=self.slice_ch,
            depths=tuple(depths),
            num_heads=self.refine_heads,
            window_size=self.refine_window,
            drop_path_rate=self.drop_path_rate,
            name=tag,
        )(x, not self.training)

    @nn.compact
    def __call__(self, carry, y_slice):
        from ..ops import ste_round

        cond_m, cond_s, buf, i = carry
        if self.cond_mode == "full":
            cm, cs = cond_m, cond_s
        else:
            # window of mean/scale zigzag blocks [i, i+w) with the tail
            # clamp (stf8.py:829-833); blocks stacked on axis 0
            w = self.mean_window
            start = jnp.minimum(i, self.n_steps - w)
            cm = jax.lax.dynamic_slice_in_dim(cond_m, start, w, axis=0)
            cs = jax.lax.dynamic_slice_in_dim(cond_s, start, w, axis=0)
            cm = jnp.concatenate([cm[j] for j in range(w)], axis=-1)
            cs = jnp.concatenate([cs[j] for j in range(w)], axis=-1)

        mean_support = jnp.concatenate([cm, buf], axis=-1)
        mu = _CCTransform(self.slice_ch, self.cc_widths, name="cc_mean")(
            mean_support
        )
        mu = self._refine(mu, self.mu_refine, "mu_refine")
        scale_support = jnp.concatenate([cs, buf], axis=-1)
        scale = _CCTransform(self.slice_ch, self.cc_widths, name="cc_scale")(
            scale_support
        )
        scale = self._refine(scale, self.scale_refine, "sigma_refine")
        _, lik = GaussianConditional(name="gc")(
            y_slice, scale, mu, training=self.training
        )
        y_hat = ste_round(y_slice - mu) + mu
        lrp_support = jnp.concatenate([mean_support, y_hat], axis=-1)
        lrp = _CCTransform(self.slice_ch, self.cc_widths, name="lrp")(
            lrp_support
        )
        lrp = self._refine(lrp, self.lrp_refine, "lrp_refine")
        y_hat = y_hat + 0.5 * jnp.tanh(lrp)

        sc = self.slice_ch
        if self.support_mode == "prefix":
            # fill slot i while i < max_support, then freeze (cnn.py:162)
            slot = jnp.minimum(i, self.max_support - 1) * sc
            updated = jax.lax.dynamic_update_slice(
                buf, y_hat, (0, 0, 0, slot)
            )
            buf = jnp.where(i < self.max_support, updated, buf)
        else:
            # sliding window, right-aligned newest (stf6.py:806): shift
            # left one slot, append; zeros occupy the not-yet-decoded
            # front slots exactly where the migration zero-pads weights
            buf = jnp.concatenate([buf[..., sc:], y_hat], axis=-1)
        return (cond_m, cond_s, buf, i + 1), (y_hat, lik)


class _ZigzagCodeCtx(nn.Module):
    """Per-step float context of the zigzag/sliding ChARM loop for the
    CODEC-side scan wire (``scan_codec.ZigzagSwinScanWire``): same
    submodule names as :class:`_ZigzagScanStep`, so the ``zigzag_scan``
    stacked subtree from :func:`stack_zigzag_params` applies directly.
    Always deterministic — the coder never uses drop-path."""

    slice_ch: int
    cc_widths: Tuple[int, ...]
    mu_depths: Tuple[int, ...]
    scale_depths: Tuple[int, ...]
    lrp_depths: Tuple[int, ...]
    refine_window: int
    refine_heads: int
    drop_path_rate: float

    def setup(self):
        self.cc_mean = _CCTransform(self.slice_ch, self.cc_widths)
        self.cc_scale = _CCTransform(self.slice_ch, self.cc_widths)
        self.lrp = _CCTransform(self.slice_ch, self.cc_widths)

        def refiner(depths):
            return _Refiner(
                dim=self.slice_ch,
                depths=tuple(depths),
                num_heads=self.refine_heads,
                window_size=self.refine_window,
                drop_path_rate=self.drop_path_rate,
            )

        if self.mu_depths:
            self.mu_refine = refiner(self.mu_depths)
        if self.scale_depths:
            self.sigma_refine = refiner(self.scale_depths)
        if self.lrp_depths:
            self.lrp_refine = refiner(self.lrp_depths)

    def context(self, mean_support, scale_support):
        mu = self.cc_mean(mean_support)
        if self.mu_depths:
            mu = self.mu_refine(mu, True)
        scale = self.cc_scale(scale_support)
        if self.scale_depths:
            scale = self.sigma_refine(scale, True)
        return mu, scale

    def lrp_res(self, lrp_support):
        r = self.lrp(lrp_support)
        if self.lrp_depths:
            r = self.lrp_refine(r, True)
        return 0.5 * jnp.tanh(r)


class ZigzagSwinCodec(CompressionModel):
    # Swin transform config (same defaults as stf)
    embed_dim: int = 48
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 4
    patch_size: int = 2
    drop_path_rate: float = 0.2
    hyper_enc_widths: Tuple[int, ...] = (384, 336, 288, 240, 192)
    hyper_dec_widths: Tuple[int, ...] = (240, 288, 336, 384, 384)
    cc_widths: Tuple[int, ...] = (224, 176, 128, 64)
    # context config
    num_slices: int = 6  # channel slices
    spatial_number: int = 2  # 1 = channel-only; 2 = 2x2 zigzag blocks
    zigzag_constrained: bool = True
    support_mode: str = "sliding"  # "prefix" | "sliding"
    max_support: int = 16
    mean_mode: str = "window"  # "full" | "window"
    mean_window: int = 1  # zigzag mean blocks (mean_mode="window")
    # refiners: depth tuples; empty = disabled
    mu_refine: Tuple[int, ...] = (2, 6, 2, 2)
    scale_refine: Tuple[int, ...] = ()
    lrp_refine: Tuple[int, ...] = ()
    refine_window: int = 4
    refine_heads: int = 4
    # scan_charm=True runs the AR slice loop as ONE lax.scan with stacked
    # per-slice weights (incl. the Swin refiners) — numerically equal to
    # the unrolled loop, but the context compiles once instead of
    # ctx_slices times. The unrolled path remains the protocol the real
    # coder drives.
    scan_charm: bool = False

    @property
    def latent_dim(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)

    @property
    def ctx_slices(self) -> int:
        return self.num_slices * self.spatial_number ** 2

    @property
    def slice_ch(self) -> int:
        return self.latent_dim // self.num_slices

    def setup(self):
        self.g_a = _SwinAnalysis(
            self.embed_dim, self.depths, self.num_heads,
            self.window_size, self.patch_size, self.drop_path_rate,
        )
        self.g_s = _SwinSynthesis(
            self.embed_dim, tuple(reversed(self.depths)),
            tuple(reversed(self.num_heads)), self.window_size,
            self.patch_size, self.drop_path_rate,
        )
        self.h_a = _HyperEncoderSTF(self.hyper_enc_widths)
        self.h_mean_s = _HyperDecoderSTF(self.hyper_dec_widths)
        self.h_scale_s = _HyperDecoderSTF(self.hyper_dec_widths)

        N = self.ctx_slices
        self.cc_mean_transforms = [
            _CCTransform(self.slice_ch, self.cc_widths, name=f"cc_mean_{i}")
            for i in range(N)
        ]
        self.cc_scale_transforms = [
            _CCTransform(self.slice_ch, self.cc_widths, name=f"cc_scale_{i}")
            for i in range(N)
        ]
        self.lrp_transforms = [
            _CCTransform(self.slice_ch, self.cc_widths, name=f"lrp_{i}")
            for i in range(N)
        ]

        def refiners(depths, tag):
            if not depths:
                return None
            return [
                _Refiner(
                    dim=self.slice_ch,
                    depths=tuple(depths),
                    num_heads=self.refine_heads,
                    window_size=self.refine_window,
                    drop_path_rate=self.drop_path_rate,
                    name=f"{tag}_refine_{i}",
                )
                for i in range(N)
            ]

        self.mu_refiners = refiners(self.mu_refine, "mu")
        self.scale_refiners = refiners(self.scale_refine, "sigma")
        self.lrp_refiners = refiners(self.lrp_refine, "lrp")

        self.entropy_bottleneck = EntropyBottleneck(self.hyper_enc_widths[-1])
        self.gaussian_conditional = GaussianConditional()

    @nn.compact
    def __call__(self, x, training: bool = True):
        if not self.scan_charm:
            return super().__call__(x, training=training)

        from ..ops import ste_round

        y, z = self.analyze(x, training=training)
        _, z_likelihoods = self.entropy_bottleneck(z, training=training)
        z_offset = self.eb_medians()
        z_hat = ste_round(z - z_offset) + z_offset
        means = self.h_mean_s(z_hat)
        scales = self.h_scale_s(z_hat)

        y_slices = self.latent_slices(y)
        y_stack = jnp.stack(y_slices, axis=0)  # (N, B, h', w', sc)
        if self.mean_mode == "full":
            cond_m, cond_s = means, scales
        else:
            cond_m = jnp.stack(self._split(means), axis=0)
            cond_s = jnp.stack(self._split(scales), axis=0)
        N, B, h, w, sc = y_stack.shape
        buf = jnp.zeros((B, h, w, self.max_support * sc), y.dtype)

        Scan = nn.scan(
            _ZigzagScanStep,
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
            support_mode=self.support_mode,
            cond_mode=self.mean_mode,
            mean_window=self.mean_window,
            n_steps=N,
            mu_refine=self.mu_refine,
            scale_refine=self.scale_refine,
            lrp_refine=self.lrp_refine,
            refine_window=self.refine_window,
            refine_heads=self.refine_heads,
            drop_path_rate=self.drop_path_rate,
            training=training,
            name="zigzag_scan",
        )((cond_m, cond_s, buf, jnp.int32(0)), y_stack)

        y_hat = self.ctx_assemble([y_hat_stack[i] for i in range(N)])
        y_likelihoods = jnp.concatenate(
            [lik_stack[i] for i in range(N)], axis=-1
        )
        x_hat = self.synthesize(y_hat, training=training)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }

    # --- ChARM protocol -----------------------------------------------------
    def analyze(self, x, training: bool = False):
        y = self.g_a(x, deterministic=not training)
        return y, self.h_a(y)

    def synthesize(self, y_hat, training: bool = False):
        return self.g_s(y_hat, deterministic=not training)

    def _split(self, t):
        if self.spatial_number == 1:
            return jnp.split(t, self.num_slices, axis=-1)
        zz = zigzag_split(
            t, self.num_slices, self.spatial_number, self.spatial_number,
            self.zigzag_constrained,
        )
        return [zz[:, i] for i in range(zz.shape[1])]

    def ctx_prepare(self, z_hat):
        means = self.h_mean_s(z_hat)
        scales = self.h_scale_s(z_hat)
        if self.mean_mode == "full":
            return {"means": [means], "scales": [scales]}
        return {"means": self._split(means), "scales": self._split(scales)}

    def latent_slices(self, y):
        return self._split(y)

    def ctx_support(self, i: int, decoded: list) -> list:
        fn = (
            sliding_support(self.max_support)
            if self.support_mode == "sliding"
            else prefix_support(self.max_support)
        )
        return fn(i, decoded)

    def _cond(self, blocks: list, i: int) -> list:
        """Mean/scale conditioning input for slice i."""
        if self.mean_mode == "full":
            return blocks  # [full latent tensor]
        N = self.ctx_slices
        w = self.mean_window
        if i + w > N:
            return blocks[N - w :]  # tail clamp (stf8.py:829-833)
        return blocks[i : i + w]

    def slice_context(self, i, state, support):
        mean_support = jnp.concatenate(
            self._cond(state["means"], i) + support, axis=-1
        )
        mu = self.cc_mean_transforms[i](mean_support)
        if self.mu_refiners is not None:
            mu = self.mu_refiners[i](mu)
        scale_support = jnp.concatenate(
            self._cond(state["scales"], i) + support, axis=-1
        )
        scale = self.cc_scale_transforms[i](scale_support)
        if self.scale_refiners is not None:
            scale = self.scale_refiners[i](scale)
        return mu, scale, mean_support

    def slice_lrp(self, i, mean_support, y_hat_slice):
        lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
        lrp = self.lrp_transforms[i](lrp_support)
        if self.lrp_refiners is not None:
            lrp = self.lrp_refiners[i](lrp)
        return 0.5 * jnp.tanh(lrp)

    def ctx_assemble(self, y_hat_slices):
        if self.spatial_number == 1:
            return jnp.concatenate(y_hat_slices, axis=-1)
        zz = jnp.stack(y_hat_slices, axis=1)
        return zigzag_merge(
            zz, self.num_slices, self.spatial_number, self.spatial_number,
            self.zigzag_constrained,
        )


def _zig_cond_width(model: "ZigzagSwinCodec") -> int:
    if model.mean_mode == "full":
        return model.hyper_dec_widths[-1]
    return model.mean_window * model.slice_ch


def _stack_cc_group(params, tag, model, lrp: bool = False):
    """Per-slice _CCTransform trees -> one stacked tree whose Conv_0
    kernels are zero-padded to the scan's fixed support width. Sliding
    supports right-align (newest last, zeros at the not-yet-decoded
    front); prefix supports left-align (cnn.py:162 slot order)."""
    n = model.ctx_slices
    sc = model.slice_ch
    cond_w = _zig_cond_width(model)
    max_sup = model.max_support
    outs = []
    for i in range(n):
        tree = params[f"{tag}_{i}"]
        k = min(i, max_sup)
        kern = np.asarray(tree["Conv_0"]["kernel"])
        kh, kw, _, cout = kern.shape
        full_in = cond_w + max_sup * sc + (sc if lrp else 0)
        new = np.zeros((kh, kw, full_in, cout), kern.dtype)
        new[:, :, :cond_w] = kern[:, :, :cond_w]
        sup = kern[:, :, cond_w : cond_w + k * sc]
        off = cond_w + ((max_sup - k) * sc if model.support_mode == "sliding"
                        else 0)
        new[:, :, off : off + k * sc] = sup
        if lrp:
            new[:, :, cond_w + max_sup * sc :] = kern[:, :, cond_w + k * sc :]
        entry = {
            key: (
                {"kernel": new, "bias": np.asarray(tree["Conv_0"]["bias"])}
                if key == "Conv_0"
                else tree[key]
            )
            for key in tree
        }
        outs.append(entry)
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *outs
    )


def stack_zigzag_params(params: dict, model: "ZigzagSwinCodec") -> dict:
    """Unrolled ZigzagSwinCodec params -> params for the same model with
    ``scan_charm=True`` (numerically identical forward; see
    tests/test_stf_family.py)."""
    from .base import fetch_params

    n = model.ctx_slices
    per_slice = fetch_params(
        {k: v for k, v in params.items()
         if k.rsplit("_", 1)[0] in (
             "cc_mean", "cc_scale", "lrp",
             "mu_refine", "sigma_refine", "lrp_refine",
         )}
    )
    scan = {
        "cc_mean": _stack_cc_group(per_slice, "cc_mean", model),
        "cc_scale": _stack_cc_group(per_slice, "cc_scale", model),
        "lrp": _stack_cc_group(per_slice, "lrp", model, lrp=True),
    }
    for depths, tag in (
        (model.mu_refine, "mu_refine"),
        (model.scale_refine, "sigma_refine"),
        (model.lrp_refine, "lrp_refine"),
    ):
        if depths:
            scan[tag] = jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *[per_slice[f"{tag}_{i}"] for i in range(n)],
            )
    drop = tuple(
        f"{t}_{i}"
        for t in ("cc_mean", "cc_scale", "lrp",
                  "mu_refine", "sigma_refine", "lrp_refine")
        for i in range(n)
    )
    out = {k: v for k, v in params.items() if k not in drop}
    out["zigzag_scan"] = scan
    return out


def unstack_zigzag_params(scan_params: dict, model: "ZigzagSwinCodec") -> dict:
    """Inverse of stack_zigzag_params for the varying-width groups (drops
    the zero padding, which carries no information)."""
    from .base import fetch_params

    n = model.ctx_slices
    sc = model.slice_ch
    cond_w = _zig_cond_width(model)
    max_sup = model.max_support
    scan_params = fetch_params(
        {k: scan_params[k]
         for k in ("cc_mean", "cc_scale", "lrp",
                   "mu_refine", "sigma_refine", "lrp_refine")
         if k in scan_params}
    )
    out = {}
    for tag, lrp in (("cc_mean", False), ("cc_scale", False), ("lrp", True)):
        stacked = scan_params[tag]
        for i in range(n):
            tree = jax.tree_util.tree_map(lambda x: np.asarray(x[i]), stacked)
            k = min(i, max_sup)
            kern = tree["Conv_0"]["kernel"]
            parts = [kern[:, :, :cond_w]]
            off = cond_w + ((max_sup - k) * sc
                            if model.support_mode == "sliding" else 0)
            parts.append(kern[:, :, off : off + k * sc])
            if lrp:
                parts.append(kern[:, :, cond_w + max_sup * sc :])
            tree["Conv_0"]["kernel"] = np.concatenate(parts, axis=2)
            out[f"{tag}_{i}"] = tree
    for depths, tag in (
        (model.mu_refine, "mu_refine"),
        (model.scale_refine, "sigma_refine"),
        (model.lrp_refine, "lrp_refine"),
    ):
        if depths:
            for i in range(n):
                out[f"{tag}_{i}"] = jax.tree_util.tree_map(
                    lambda x: np.asarray(x[i]), scan_params[tag]
                )
    return out


# --- reference-variant presets ----------------------------------------------

STF5_CONFIG = dict(
    num_slices=12, spatial_number=1, support_mode="sliding", max_support=6,
    mean_mode="full", mu_refine=(2, 6, 2, 2), scale_refine=(2, 6, 2, 2),
    lrp_refine=(2, 6, 2, 2), refine_window=4,
)
STF6_CONFIG = dict(
    num_slices=6, spatial_number=2, support_mode="sliding", max_support=16,
    mean_mode="window", mean_window=1, mu_refine=(2, 6, 2, 2),
    scale_refine=(), lrp_refine=(), refine_window=4,
)
STF7_CONFIG = dict(
    num_slices=12, spatial_number=1, support_mode="prefix", max_support=6,
    mean_mode="full", mu_refine=(2, 6), scale_refine=(2, 2),
    lrp_refine=(2, 6), refine_window=8,
)
STF8_CONFIG = dict(
    num_slices=6, spatial_number=2, support_mode="sliding", max_support=12,
    mean_mode="window", mean_window=24, mu_refine=(2, 6),
    scale_refine=(2, 2), lrp_refine=(2, 6), refine_window=8,
    # stf8's order generator drops the channel-shell constraint
    # (stf8.py:701-705: ``max(H,W) < i`` and no ``C_index+1 > i``),
    # unlike stf6's constrained 3-D zigzag
    zigzag_constrained=False,
)
