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


class _ZigzagScanStep(nn.Module):
    """One zigzag AR step under ``nn.scan`` with stacked per-slice weights
    (the WACNN ``_CharmScanStep`` pattern adapted to SLIDING support: the
    buffer holds the last ``max_support`` decoded blocks oldest->newest
    and rolls by one block per step; slices with fewer supports see zeros
    in the oldest slots, matching zero-padded kernel blocks. Equal to the
    unrolled loop up to float accumulation order (the fixed-width first
    conv reduces in a different order than the unrolled variable-width
    one) while compiling ONCE instead of num_slices*spatial^2 times."""

    slice_ch: int
    cc_widths: Tuple[int, ...]
    apply_lrp: bool = True
    training: bool = True

    @nn.compact
    def __call__(self, carry, xs):
        from ..entropy import GaussianConditional
        from ..nn.factories import ShallowCC
        from ..ops import ste_round

        (buf,) = carry
        y_slice, cond_mean, cond_scale = xs
        sc = self.slice_ch
        mean_support = jnp.concatenate([cond_mean, buf], axis=-1)
        mu = ShallowCC(sc, self.cc_widths, name="cc_mean")(mean_support)
        scale_support = jnp.concatenate([cond_scale, buf], axis=-1)
        scale = ShallowCC(sc, self.cc_widths, name="cc_scale")(scale_support)
        _, lik = GaussianConditional(name="gc")(
            y_slice, scale, mu, training=self.training
        )
        y_hat = ste_round(y_slice - mu) + mu
        if self.apply_lrp:
            lrp_support = jnp.concatenate([mean_support, y_hat], axis=-1)
            lrp = ShallowCC(sc, self.cc_widths, name="lrp")(lrp_support)
            y_hat = y_hat + 0.5 * jnp.tanh(lrp)
        buf = jnp.concatenate([buf[..., sc:], y_hat], axis=-1)
        return (buf,), (y_hat, lik)


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
    # scan=True runs the AR loop as ONE lax.scan with stacked per-slice
    # weights (single compile, no per-slice dispatch); equivalent to the
    # unrolled loop to float accumulation noise (tests/test_zigzag_scan.py).
    # The unrolled path remains the protocol the real-bitstream coders
    # drive (bit-identical on both coder sides).
    scan: bool = False

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

    def _cond_windows(self, blocks: list) -> jnp.ndarray:
        """Stack every step's conditioning window: (N, B, h, w, w_cond*sc)
        with the reference tail clamp (window start = min(i, N-w))."""
        N = self.ctx_slices
        w = min(self.support_num, N)
        stacked = jnp.stack(blocks, axis=0)  # (N, B, h, w, sc)
        rows = []
        for i in range(N):
            start = min(i, N - w)
            win = stacked[start : start + w]  # (w, B, h, w, sc)
            rows.append(jnp.concatenate(list(win), axis=-1))
        return jnp.stack(rows, axis=0)

    @nn.compact
    def code_scan(self, y, training: bool = True):
        """Scanned equivalent of :meth:`code` (see ``_ZigzagScanStep``)."""
        z = self.h_a(y)
        _, z_likelihoods = self.entropy_bottleneck(z, training=training)
        z_offset = self.eb_medians()
        z_hat = ste_round(z - z_offset) + z_offset

        state = self.ctx_prepare(z_hat)
        y_blocks = self.latent_slices(y)
        y_stack = jnp.stack(y_blocks, axis=0)  # (N, B, h, w, sc)
        cond_mean = self._cond_windows(state["means"])
        cond_scale = self._cond_windows(state["scales"])

        B, h, w, sc = y_blocks[0].shape
        buf = jnp.zeros((B, h, w, self.max_support * sc), y.dtype)
        Scan = nn.scan(
            _ZigzagScanStep,
            variable_axes={"params": 0},
            split_rngs={"params": True, "noise": True},
            in_axes=0,
            out_axes=0,
            length=self.ctx_slices,
        )
        _, (y_hat_stack, lik_stack) = Scan(
            slice_ch=sc,
            cc_widths=self.cc_widths,
            apply_lrp=self.apply_lrp,
            training=training,
            name="zz_scan",
        )((buf,), (y_stack, cond_mean, cond_scale))

        y_hat = self.ctx_assemble(
            [y_hat_stack[i] for i in range(self.ctx_slices)]
        )
        y_likelihoods = jnp.concatenate(
            [lik_stack[i] for i in range(self.ctx_slices)], axis=-1
        )
        return y_hat, {"y": y_likelihoods, "z": z_likelihoods}

    # --- full training/entropy-estimation loop for this latent -------------
    def code(self, y, training: bool = True):
        """y -> (y_hat, {"y": y_likelihoods, "z": z_likelihoods})."""
        if self.scan:
            return self.code_scan(y, training=training)
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


def stack_zigzag_params(
    params: dict,
    ctx_slices: int,
    slice_ch: int,
    max_support: int,
    cond_width: int,
    apply_lrp: bool = True,
) -> dict:
    """Unrolled per-slice params (``cc_mean_{i}``/``cc_scale_{i}``/
    ``lrp_{i}``) -> the ``zz_scan`` stacked subtree.

    Sliding-support alignment: at step i the rolled buffer holds the
    min(i, max_support) decoded blocks in its LAST slots (oldest slots
    are zeros), so each slice's first-conv support channels map to the
    last ``have*sc`` slots of the fixed-width region and the unused
    oldest slots get zero weights — outputs are exactly equal."""
    import numpy as np

    from .base import fetch_params

    sup_max = max_support * slice_ch
    tags = ("cc_mean", "cc_scale") + (("lrp",) if apply_lrp else ())
    params = fetch_params(
        {k: v for k, v in params.items()
         if k.rsplit("_", 1)[0] in tags}
    )
    out = {}
    for tag in tags:
        layers: dict = {}
        for ln in params[f"{tag}_0"]:
            kernels, biases = [], []
            for i in range(ctx_slices):
                p = params[f"{tag}_{i}"][ln]
                k = np.asarray(p["kernel"])
                if ln == "Conv_0":
                    have = min(i, max_support) * slice_ch
                    tail = slice_ch if tag == "lrp" else 0
                    target = cond_width + sup_max + tail
                    kn = np.zeros(k.shape[:2] + (target, k.shape[3]), k.dtype)
                    kn[:, :, :cond_width] = k[:, :, :cond_width]
                    if have:
                        kn[:, :, cond_width + sup_max - have : cond_width + sup_max] = (
                            k[:, :, cond_width : cond_width + have]
                        )
                    if tail:
                        kn[:, :, -tail:] = k[:, :, -tail:]
                    k = kn
                kernels.append(k)
                biases.append(np.asarray(p["bias"]))
            layers[ln] = {"kernel": np.stack(kernels), "bias": np.stack(biases)}
        out[tag] = layers
    return {"zz_scan": out}


def unstack_zigzag_params(
    stacked: dict,
    ctx_slices: int,
    slice_ch: int,
    max_support: int,
    cond_width: int,
    apply_lrp: bool = True,
) -> dict:
    """Inverse of :func:`stack_zigzag_params` (slices away the zero
    oldest-slot support channels), so scan-trained checkpoints drive the
    unrolled protocol / real-bitstream coders."""
    import numpy as np

    from .base import fetch_params

    sub = fetch_params(stacked["zz_scan"])
    sup_max = max_support * slice_ch
    tags = ("cc_mean", "cc_scale") + (("lrp",) if apply_lrp else ())
    out: dict = {}
    for tag in tags:
        for i in range(ctx_slices):
            layers = {}
            for ln, p in sub[tag].items():
                k = np.asarray(p["kernel"][i])
                if ln == "Conv_0":
                    have = min(i, max_support) * slice_ch
                    parts = [k[:, :, :cond_width]]
                    if have:
                        parts.append(
                            k[:, :, cond_width + sup_max - have : cond_width + sup_max]
                        )
                    if tag == "lrp":
                        parts.append(k[:, :, -slice_ch:])
                    k = np.concatenate(parts, axis=2)
                layers[ln] = {"kernel": k, "bias": np.asarray(p["bias"][i])}
            out[f"{tag}_{i}"] = layers
    return out
