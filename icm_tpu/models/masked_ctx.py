"""Masked-transformer / attention context codecs: stf2, stf3, stf4.

Behavioral parity:
  - stf3 ``ClipEncoder3`` (reference stf3.py:621-1316): one-shot
    teacher-forced masked-transformer context. ``y_hat = ste_round(y)``
    (no mean centering, stf3.py:976); token sequence = windowed 3-D zigzag
    (window 8, 8 channel slices); context input = [hyper tokens, y_hat
    tokens] concatenated along the sequence; 5 attention+MLP blocks
    (``maskedContextModel``, stf3.py:565-618); outputs shifted by one
    (``[N-1:-1]``) decode to mu/scale; a single global LRP conv stack on
    cat(y_hat, means, scales) (stf3.py:1124-1127). The reference feeds
    the mu context from ``latent_scales`` and vice versa via swapped
    variable names (stf3.py:995-996) — reproduced exactly, so converted
    reference-trained checkpoints keep their semantics.
  - stf4 ``ClipEncoder4`` (reference stf4.py:582-1379): strict-causal
    (``-1000``-fill additive mask) transformer output + causal sliding
    windows of 27 (=3^3) previous context tokens and 27 hyper tokens,
    fused by a conv head into mu/scale in one shot (stf4.py:1052-1086).
    The reference computes BOTH mu and scale with ``cc_mean_transforms``
    (stf4.py:1082; ``cc_scale_transforms`` is dead) and swaps the
    mean/scale hyper sources at ZigzagSplits (stf4.py:1037-1038) —
    both reproduced exactly for checkpoint fidelity; the dead scale
    head is materialized init-only so converted trees stay equal.
  - stf2 ``ClipEncoder`` (reference stf2.py:559-1465): autoregressive
    window-token coding: per step, un-masked self-attention
    (``Mask3dAttention`` — qkv + softmax only, stf2.py:129-213) over
    [num_sliding hyper tokens, num_sliding previously-decoded tokens]
    produces the context; conv heads map it to mu/scale; LRP per token.
    Reference quirks reproduced: the mu context consumes
    ``latent_scales``-derived windows and vice versa (swapped names,
    stf2.py:1048-1049), and step 0 concatenates [y-history(zeros),
    hyper] while later steps use [hyper, y-history]
    (stf2.py:1085-1089 vs 1131-1133).

All tokens are NHWC window blocks; zigzag orders are the static index
maps from ``icm_tpu/scan``; the stf4 sliding windows are a single static
gather instead of the reference's nn.Unfold.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyBottleneck, GaussianConditional
from ..nn.layers import conv
from ..ops import ste_round
from ..scan import zigzag_merge, zigzag_split
from .base import CompressionModel
from .stf import (
    _HyperDecoderSTF,
    _HyperEncoderSTF,
    _SwinAnalysis,
    _SwinSynthesis,
)


class PlainAttention(nn.Module):
    """Un-masked single/multi-head self-attention with only a qkv
    projection (reference ``Mask3dAttention``, stf2.py:129-213 — mask,
    bias table and output projection are all disabled there)."""

    dim: int
    num_heads: int = 1

    @nn.compact
    def __call__(self, x, mask=None):
        """``mask``: optional (N, N). Bool: True = key visible to query;
        masked logits are set to -inf, so masked softmax weights are
        EXACTLY 0.0 and outputs are bit-independent of masked key/value
        contents — the invariant the causal coder relies on (decoder
        re-runs this on a zero-padded future and gets identical rows).
        Float: ADDED to the logits — reproduces the reference stf4 mask
        semantics (``-1000`` fills, stf4.py:203-206), where a row whose
        keys are ALL masked degenerates to uniform attention instead of
        propagating -inf."""
        B, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        qkv = nn.Dense(C * 3, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        logits = jnp.einsum("bhnd,bhmd->bhnm", q * hd ** -0.5, k)
        if mask is not None:
            if mask.dtype == jnp.bool_:
                logits = jnp.where(mask[None, None], logits, -jnp.inf)
            else:
                logits = logits + mask[None, None]
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        return out.transpose(0, 2, 1, 3).reshape(B, N, C)


class MaskedContextModel(nn.Module):
    """5 x (attention + LayerNorm/MLP residual) (reference stf3.py:565-618)."""

    dim: int
    depth: int = 5
    num_heads: int = 1

    @nn.compact
    def __call__(self, x, mask=None):
        for i in range(self.depth):
            x = PlainAttention(self.dim, self.num_heads, name=f"attn{i}")(
                x, mask=mask
            )
            h = nn.LayerNorm(epsilon=1e-5)(x)
            h = nn.Dense(2 * self.dim)(h)
            h = jax.nn.gelu(h, approximate=False)
            x = x + nn.Dense(self.dim)(h)
        return x


class _GlobalLRP(nn.Module):
    """Global LRP conv stack on cat(y_hat, means, scales)
    (reference stf3.py:775-784)."""

    latent_dim: int = 384

    @nn.compact
    def __call__(self, x):
        M = self.latent_dim
        for w in (2 * M, M, M):
            x = conv(w, kernel_size=3, stride=1)(x)
            x = jax.nn.gelu(x, approximate=False)
        return conv(M, kernel_size=3, stride=1)(x)


def _pad_to_windows(t, ws: int):
    B, H, W, C = t.shape
    pad_b = (ws - H % ws) % ws
    pad_r = (ws - W % ws) % ws
    if pad_b or pad_r:
        t = jnp.pad(t, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    return t, (H + pad_b) // ws, (W + pad_r) // ws, pad_b, pad_r


class _MaskedBase(CompressionModel):
    """Shared transform/hyper scaffolding for stf2/3/4."""

    embed_dim: int = 48
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 4
    patch_size: int = 2
    drop_path_rate: float = 0.2
    num_slices: int = 8
    mask_win_size: int = 8
    hyper_enc_widths: Tuple[int, ...] = (384, 336, 288, 240, 192)
    hyper_dec_widths: Tuple[int, ...] = (240, 288, 336, 384, 384)

    @property
    def latent_dim(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)

    @property
    def slice_ch(self) -> int:
        return self.latent_dim // self.num_slices

    @property
    def token_dim(self) -> int:
        return self.mask_win_size ** 2 * self.slice_ch

    def _setup_transforms(self):
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
        self.entropy_bottleneck = EntropyBottleneck(self.hyper_enc_widths[-1])
        self.gaussian_conditional = GaussianConditional()

    def _window_tokens(self, t, nH, nW):
        """(B, Hp, Wp, C) -> blocks (B, N, ws, ws, C') in zigzag order."""
        return zigzag_split(t, self.num_slices, nH, nW, True)

    def _tokens_flat(self, zz):
        """Flatten window blocks to token vectors in the REFERENCE's
        element order: channel-major (c, h, w) — reference ZigzagSplits
        reads ``x_slices[:, C_index, :, H_index, :, W_index, :]`` as
        (B, C', ws, ws) and row-major flattens it (stf3.py:871), so every
        converted qkv/LayerNorm/Mlp weight indexes tokens in that order."""
        B, N, h, w, c = zz.shape
        return zz.transpose(0, 1, 4, 2, 3).reshape(B, N, c * h * w)

    def _unflatten(self, tokens, nH, nW):
        """Token vectors (c-major) back to NHWC window blocks (the
        reference's view(B, N, C', ws, ws), stf3.py:1008-1011)."""
        B, N, D = tokens.shape
        ws = self.mask_win_size
        return tokens.reshape(B, N, self.slice_ch, ws, ws).transpose(
            0, 1, 3, 4, 2
        )

    def _merge(self, zz, nH, nW):
        return zigzag_merge(zz, self.num_slices, nH, nW, True)

    def _hyper(self, y, training):
        z = self.h_a(y)
        _, z_lik = self.entropy_bottleneck(z, training=training)
        z_off = self.entropy_bottleneck.medians()[:, 0, 0]
        z_hat = ste_round(z - z_off) + z_off
        return self.h_mean_s(z_hat), self.h_scale_s(z_hat), z_lik


class ClipEncoder3(_MaskedBase):
    """stf3: one-shot masked transformer context.

    ``causal=False`` (default) reproduces the reference exactly: stf3's
    ``Mask3dAttention`` carries an INTERNAL additive block mask
    (stf3.py:196-207, 0/-1000 fills) over the [N hyper | N y_hat]
    sequence — hyper rows attend to hyper rows only, and y row N+i
    attends to all hyper plus y rows <= N+i. With the teacher-forcing
    shift (output row N-1+i predicts token i), prediction i therefore
    sees exactly the decoded prefix y_hat[<i] — the reference context IS
    causal and decodable (``-1000`` fills underflow to exact 0.0 softmax
    weights in f32), and ``masked_codec.Stf3Codec`` drives it directly.
    ``causal=True`` swaps in a plain boolean lower-triangular mask over
    the full 2N sequence (an equally decodable variant kept for models
    trained in this framework)."""

    # reference stf3 constructor defaults (stf3.py:630-631):
    # Mask_win_size=4, num_slices=8 -> token dim 16*48 = 768
    mask_win_size: int = 4
    causal: bool = False

    def setup(self):
        self._setup_transforms()
        D = self.token_dim
        self.ctx_mu = MaskedContextModel(D, name="maskedContextModel_mu")
        self.ctx_sigma = MaskedContextModel(D, name="maskedContextModel_sigma")
        self.lrp = _GlobalLRP(self.latent_dim)

    def _ctx_mask(self, N: int, dtype=jnp.float32):
        if self.causal:
            return jnp.tril(jnp.ones((2 * N, 2 * N), bool))
        # the reference Mask3dAttention's internal block mask
        # (stf3.py:196-207): hyper rows (0..N-1) see hyper cols only;
        # y row N+i sees cols <= N+i (tril diagonal=N); 0/-1000 additive
        L = 2 * N
        vis = np.zeros((L, L), bool)
        vis[:N, :N] = True
        vis[N:] = np.tril(np.ones((N, L), bool), N)
        return jnp.asarray(np.where(vis, 0.0, -1000.0), dtype)

    def __call__(self, x, training: bool = True):
        ws = self.mask_win_size
        y = self.g_a(x, deterministic=not training)
        means, scales, z_lik = self._hyper(y, training)
        y_hat = ste_round(y)

        yp, nH, nW, pad_b, pad_r = _pad_to_windows(y_hat, ws)
        mp, _, _, _, _ = _pad_to_windows(means, ws)
        sp, _, _, _, _ = _pad_to_windows(scales, ws)

        y_tok = self._tokens_flat(self._window_tokens(yp, nH, nW))
        m_tok = self._tokens_flat(self._window_tokens(mp, nH, nW))
        s_tok = self._tokens_flat(self._window_tokens(sp, nH, nW))
        N = y_tok.shape[1]

        mask = self._ctx_mask(N)
        # reference wiring feeds the mu context from the SCALE hyper
        # tokens and vice versa (swapped variable names, stf3.py:995-996);
        # reproduced exactly so converted reference-trained checkpoints
        # keep their semantics
        mu_seq = self.ctx_mu(
            jnp.concatenate([s_tok, y_tok], axis=1), mask=mask
        )
        sc_seq = self.ctx_sigma(
            jnp.concatenate([m_tok, y_tok], axis=1), mask=mask
        )
        # teacher-forced shift: output N-1+i predicts slice i (stf3.py:1004)
        mu = self._merge(self._unflatten(mu_seq[:, N - 1 : -1], nH, nW), nH, nW)
        scale = self._merge(self._unflatten(sc_seq[:, N - 1 : -1], nH, nW), nH, nW)
        H, W = y.shape[1:3]
        mu = mu[:, :H, :W]
        scale = scale[:, :H, :W]

        _, y_lik = self.gaussian_conditional(y_hat, scale, mu, training=training)
        lrp = self.lrp(jnp.concatenate([y_hat, means, scales], axis=-1))
        y_hat = y_hat + 0.5 * jnp.tanh(lrp)

        x_hat = self.g_s(y_hat, deterministic=not training)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_lik, "z": z_lik},
        }

    # --- coder-facing stages (masked_codec.Stf3Codec) ------------------------
    def analyze(self, x):
        y = self.g_a(x, deterministic=True)
        return y, self.h_a(y)

    def eb_medians(self):
        return self.entropy_bottleneck.medians()[:, 0, 0]

    def coder_tokens(self, y, z_hat):
        """-> (y integer tokens, mean tokens, scale tokens, means, scales,
        lattice (nH, nW), latent HW). Token layouts exactly as __call__."""
        ws = self.mask_win_size
        means = self.h_mean_s(z_hat)
        scales = self.h_scale_s(z_hat)
        y_hat = jnp.round(y)
        yp, nH, nW, _, _ = _pad_to_windows(y_hat, ws)
        mp = _pad_to_windows(means, ws)[0]
        sp = _pad_to_windows(scales, ws)[0]
        y_tok = self._tokens_flat(self._window_tokens(yp, nH, nW))
        m_tok = self._tokens_flat(self._window_tokens(mp, nH, nW))
        s_tok = self._tokens_flat(self._window_tokens(sp, nH, nW))
        return y_tok, m_tok, s_tok, means, scales, (nH, nW), y.shape[1:3]

    def causal_mu_scale(self, m_tok, s_tok, y_buf):
        """Full causal context pass; rows already teacher-shift-aligned:
        row i of the result predicts token i. Bit-independent of y_buf
        rows >= the row being read (bool mode masks with exact -inf; the
        reference's additive -1000 fills underflow to exact 0.0 softmax
        weights in f32 — same invariant), so the decoder
        re-runs this on its zero-padded prefix buffer."""
        N = y_buf.shape[1]
        mask = self._ctx_mask(N, y_buf.dtype)
        # same swapped hyper wiring as __call__ (stf3.py:995-996), so
        # converted reference weights see the token types they trained on
        mu_seq = self.ctx_mu(
            jnp.concatenate([s_tok, y_buf], axis=1), mask=mask
        )[:, N - 1 : -1]
        sc_seq = self.ctx_sigma(
            jnp.concatenate([m_tok, y_buf], axis=1), mask=mask
        )[:, N - 1 : -1]
        return mu_seq, sc_seq

    def coder_reconstruct(self, y_tok_hat, means, scales, lattice, out_hw):
        """Integer token buffer -> y_hat with global LRP (as __call__)."""
        nH, nW = lattice
        y_hat = self._merge(self._unflatten(y_tok_hat, nH, nW), nH, nW)
        H, W = out_hw
        y_hat = y_hat[:, :H, :W]
        lrp = self.lrp(jnp.concatenate([y_hat, means, scales], axis=-1))
        return y_hat + 0.5 * jnp.tanh(lrp)

    def synthesize(self, y_hat):
        return self.g_s(y_hat, deterministic=True)


def _causal_windows(tokens, window: int, include_current: bool):
    """(B, N, D) -> (B, N, window, D): for each i the previous ``window``
    tokens ([i-w, i) or [i-w+1, i]), zero-padded at the front. Static
    gather — the TPU-native version of the reference's nn.Unfold sliding
    windows (stf4.py:1058-1071)."""
    B, N, D = tokens.shape
    pad = window if not include_current else window - 1
    padded = jnp.pad(tokens, ((0, 0), (pad, 0), (0, 0)))
    base = np.arange(N)[:, None] + np.arange(window)[None, :]
    idx = jnp.asarray(base)  # window i covers padded [i, i+window)
    return padded[:, idx]  # (B, N, window, D)


class ClipEncoder4(_MaskedBase):
    """stf4: masked transformer + causal sliding-window conv fusion.

    The reference context attention applies a strict lower-triangular
    ``-1000`` ADDITIVE mask (stf4.py:203-206): rows >= 1 are effectively
    causal (exp(-1000) underflows to exactly 0 in f32), but row 0 — all
    keys masked — degenerates by softmax shift-invariance to the
    UNMASKED attention over every token, including future ones, so the
    reference forward is not decodable at token 0. ``causal=False``
    (default) reproduces that exactly for checkpoint fidelity;
    ``causal=True`` swaps in an exact boolean lower-triangular mask
    (ctx row i uses y_hat <= i, and the shifted ctx window,
    ``include_current=False``, feeds only rows < i into token i's
    heads) — the decodable completion (masked_codec.Stf4Codec)."""

    num_slices: int = 8
    mask_win_size: int = 4
    sliding: int = 27  # 3^3 (stf4.py:1056)
    causal: bool = False

    def setup(self):
        self._setup_transforms()
        # the reference context is ONE bare 2-head attention, no norm/mlp
        # (stf4.py:745 Mask3dAttention(dim=win^2*C/slices, num_heads=2),
        # applied directly at stf4.py:1052; the sigma twin is dead)
        self.ctx_mu = PlainAttention(
            self.token_dim, 2, name="maskedContextModel_mu"
        )
        Cp = self.slice_ch
        w = self.sliding
        # shared conv heads (reference stf4 cc_*_transforms widths
        # 2*27*48 -> 27*48 -> 15*48 -> 8*48 -> 48); the scale head is
        # DEAD in the reference forward (stf4.py:1082 runs
        # cc_mean_transforms on both inputs) — kept init-only below so
        # converted state-dict trees stay exactly equal
        self.cc_mean_head = _ConvHead((w * Cp, 15 * Cp, 8 * Cp, Cp))
        self.cc_scale_head = _ConvHead((w * Cp, 15 * Cp, 8 * Cp, Cp))
        self.lrp = _GlobalLRP(self.latent_dim)

    def __call__(self, x, training: bool = True):
        ws = self.mask_win_size
        Cp = self.slice_ch
        w = self.sliding
        y = self.g_a(x, deterministic=not training)
        means, scales, z_lik = self._hyper(y, training)
        y_hat = ste_round(y)

        yp, nH, nW, pad_b, pad_r = _pad_to_windows(y_hat, ws)
        mp, _, _, _, _ = _pad_to_windows(means, ws)
        sp, _, _, _, _ = _pad_to_windows(scales, ws)
        y_tok = self._tokens_flat(self._window_tokens(yp, nH, nW))
        m_tok = self._tokens_flat(self._window_tokens(mp, nH, nW))
        s_tok = self._tokens_flat(self._window_tokens(sp, nH, nW))
        B, N, D = y_tok.shape

        if self.causal:
            mask = jnp.tril(jnp.ones((N, N), bool))
        else:
            # the reference's strict-tril additive -1000 mask
            # (stf4.py:203-206) incl. the row-0 full-attention degeneracy
            mask = jnp.asarray(
                np.where(np.tril(np.ones((N, N)), -1) > 0, 0.0, -1000.0),
                y_tok.dtype,
            )
        ctx = self.ctx_mu(y_tok, mask=mask)  # (B, N, D)
        mu_tok, scale_tok = self._fused_heads(ctx, m_tok, s_tok)
        mu = self._merge(mu_tok, nH, nW)
        scale = self._merge(scale_tok, nH, nW)
        H, W = y.shape[1:3]
        mu = mu[:, :H, :W]
        scale = scale[:, :H, :W]

        _, y_lik = self.gaussian_conditional(y_hat, scale, mu, training=training)
        lrp = self.lrp(jnp.concatenate([y_hat, means, scales], axis=-1))
        y_hat = y_hat + 0.5 * jnp.tanh(lrp)
        x_hat = self.g_s(y_hat, deterministic=not training)
        return {"x_hat": x_hat, "likelihoods": {"y": y_lik, "z": z_lik}}

    def _fused_heads(self, ctx, m_tok, s_tok):
        """Shifted ctx + mean/scale sliding windows -> per-token mu/scale
        blocks (B, N, ws, ws, Cp) via the shared conv heads
        (stf4.py:1052-1086)."""
        ws = self.mask_win_size
        Cp = self.slice_ch
        w = self.sliding
        B, N, D = ctx.shape
        ctx_w = _causal_windows(ctx, w, include_current=False)
        m_w = _causal_windows(m_tok, w, include_current=True)
        s_w = _causal_windows(s_tok, w, include_current=True)

        def fuse(a, b, head):
            # reference layout, reproduced exactly (stf4.py:1058-1080):
            # nn.Unfold flattens each (window w, token-dim D) stack
            # d-MAJOR (channel x kernel-pos ordering), the two halves
            # concatenate, and the result is reinterpreted ROW-MAJOR as
            # NCHW (2*w*Cp, ws, ws) — scrambling window offsets into the
            # conv head's spatial dims. Converted checkpoints trained on
            # that scramble only work if we feed the identical one.
            ha = a.transpose(0, 1, 3, 2).reshape(B, N, D * w)
            hb = b.transpose(0, 1, 3, 2).reshape(B, N, D * w)
            h = jnp.concatenate([ha, hb], axis=2).reshape(
                B * N, 2 * w * Cp, ws, ws
            )
            return head(h.transpose(0, 2, 3, 1)).reshape(B, N, ws, ws, Cp)

        if self.is_initializing():
            # dead in the reference forward (stf4.py:1082) — traced only
            # at init so the converted cc_scale_transforms params have a
            # home and tree equality holds, at zero apply-time cost
            fuse(ctx_w, s_w, self.cc_scale_head)
        # reference wiring: the mu fuse consumes the SCALE-side hyper
        # windows and vice versa (ZigzagSplits swap, stf4.py:1037-1038),
        # and cc_mean_transforms computes both outputs (stf4.py:1081-1082)
        return (
            fuse(ctx_w, s_w, self.cc_mean_head),
            fuse(ctx_w, m_w, self.cc_mean_head),
        )

    # --- coder-facing stages (masked_codec.Stf4Codec) ------------------------
    analyze = ClipEncoder3.analyze
    eb_medians = ClipEncoder3.eb_medians
    coder_tokens = ClipEncoder3.coder_tokens
    synthesize = ClipEncoder3.synthesize
    coder_reconstruct = ClipEncoder3.coder_reconstruct

    def causal_mu_scale(self, m_tok, s_tok, y_buf):
        """Full causal pass -> per-token mu/scale blocks flattened back to
        token vectors (B, N, D); row i depends only on y_buf rows < i."""
        B, N, D = y_buf.shape
        mask = jnp.tril(jnp.ones((N, N), bool))
        ctx = self.ctx_mu(y_buf, mask=mask)
        mu_tok, scale_tok = self._fused_heads(ctx, m_tok, s_tok)
        # back to c-major token vectors (layout of y_buf)
        flat = lambda t: t.transpose(0, 1, 4, 2, 3).reshape(B, N, D)
        return flat(mu_tok), flat(scale_tok)


class _ConvHead(nn.Module):
    """Shared conv head (absolute widths; GELU between, none after last)."""

    widths: Tuple[int, ...]

    @nn.compact
    def __call__(self, h):
        for i, w in enumerate(self.widths):
            h = conv(w, kernel_size=3, stride=1)(h)
            if i < len(self.widths) - 1:
                h = jax.nn.gelu(h, approximate=False)
        return h


def _unfold_scramble(win):
    """Reproduce the reference's nn.Unfold channel-ordering scramble on
    the hyper context windows (reference stf2.py:1063-1079): ``nn.Unfold``
    lays each (D, s) patch out d-major (channel index = d*s + k), but the
    reference reinterprets the flat vector token-major via
    ``view(-1, N, num_sliding, token_dim)`` — so every "sliding token" it
    feeds the attention is the transpose-scramble ``(W^T).reshape(s, D)``
    of the true window W (s, D). The y-history half is built directly
    (``torch.cat(...).view``, stf2.py:1121-1126) and is NOT scrambled.
    Same bug class as stf4's NeighborSample scramble (NOTES_ROUND3.md);
    reproduced bit-for-bit so converted reference checkpoints behave
    identically. win: (B, N, s, D) proper windows -> scrambled."""
    B, N, s, D = win.shape
    return win.swapaxes(-2, -1).reshape(B, N, s, D)


class ClipEncoder(_MaskedBase):
    """stf2: autoregressive attention context over window tokens.

    ``scan_tokens=True`` runs the token AR loop as ONE ``lax.scan``:
    every step shares the same attention context + conv heads (the
    reference reuses one muContextModel/sigmaContextModel across all
    tokens, stf2.py:762-768), so no weight stacking is needed and the
    parameter tree is IDENTICAL to the unrolled path — checkpoints work
    in both modes unchanged. Step 0 is peeled outside the scan because
    the reference concatenates its context in a different order
    (stf2.py:1085-1089 vs 1131-1133)."""

    num_slices: int = 4
    mask_win_size: int = 8
    num_sliding: int = 6
    num_stride_sliding: int = 1
    scan_tokens: bool = False

    def setup(self):
        self._setup_transforms()
        D = self.token_dim
        Cp = self.slice_ch
        s = self.num_sliding
        stride = self.num_stride_sliding
        self.mu_ctx = PlainAttention(D, 1, name="muContextModel")
        self.sigma_ctx = PlainAttention(D, 1, name="sigmaContextModel")
        # shared conv heads (reference stf2.py:691-717 widths)
        self.cc_mean_head = _ConvHead((s * Cp, 15 * Cp, 8 * Cp, stride * Cp))
        self.cc_scale_head = _ConvHead((s * Cp, 15 * Cp, 8 * Cp, stride * Cp))
        self.lrp_head = _ConvHead((s * Cp, 15 * Cp, 8 * Cp, stride * Cp))

    def __call__(self, x, training: bool = True):
        ws = self.mask_win_size
        Cp = self.slice_ch
        s = self.num_sliding
        assert self.num_stride_sliding == 1, "stride > 1 not supported yet"
        y = self.g_a(x, deterministic=not training)
        means, scales, z_lik = self._hyper(y, training)

        yp, nH, nW, pad_b, pad_r = _pad_to_windows(y, ws)
        mp, _, _, _, _ = _pad_to_windows(means, ws)
        sp, _, _, _, _ = _pad_to_windows(scales, ws)
        y_tok = self._tokens_flat(self._window_tokens(yp, nH, nW))
        # reference swap: the mu-side hyper tokens come from
        # latent_SCALES and the sigma-side from latent_MEANS
        # (swapped variable names at stf2.py:1048-1049)
        m_tok = self._tokens_flat(self._window_tokens(sp, nH, nW))
        s_tok = self._tokens_flat(self._window_tokens(mp, nH, nW))
        B, N, D = y_tok.shape

        m_win = _unfold_scramble(
            _causal_windows(m_tok, s, include_current=True)
        )  # (B,N,s,D)
        s_win = _unfold_scramble(
            _causal_windows(s_tok, s, include_current=True)
        )

        def to_spatial(tokens):
            # (B, k, D) c-major tokens -> (B, ws, ws, k*Cp); channel
            # order (k, Cp) = the reference's view(B, -1, ws, ws) on the
            # context output (stf2.py:1093-1094)
            k = tokens.shape[1]
            h = tokens.reshape(B, k, Cp, ws, ws)
            return h.transpose(0, 3, 4, 1, 2).reshape(B, ws, ws, k * Cp)

        if self.scan_tokens:
            # step 0 peeled: its concat order differs (stf2.py:1085-1089)
            prev0 = jnp.zeros((B, s, D), y_tok.dtype)
            mu0, scale0, ctxmu0 = self.token_context(
                m_win[:, 0], s_win[:, 0], prev0, first_step=True
            )
            y_slice0 = (
                y_tok[:, 0].reshape(B, Cp, ws, ws).transpose(0, 2, 3, 1)
            )
            _, lik0 = self.gaussian_conditional(
                y_slice0, scale0, mu0, training=training
            )
            y_hat0 = ste_round(y_slice0 - mu0) + mu0
            y_hat0 = y_hat0 + self.token_lrp(ctxmu0, y_hat0)
            tok0 = y_hat0.transpose(0, 3, 1, 2).reshape(B, D)
            buf = jnp.concatenate([prev0[:, 1:], tok0[:, None]], axis=1)

            def body(mdl, buf, xs):
                m_i, s_i, y_i = xs
                mu, scale, ctxmu = mdl.token_context(m_i, s_i, buf)
                y_slice = y_i.reshape(B, Cp, ws, ws).transpose(0, 2, 3, 1)
                _, lik = mdl.gaussian_conditional(
                    y_slice, scale, mu, training=training
                )
                y_hat = ste_round(y_slice - mu) + mu
                y_hat = y_hat + mdl.token_lrp(ctxmu, y_hat)
                tok = y_hat.transpose(0, 3, 1, 2).reshape(B, D)
                return (
                    jnp.concatenate([buf[:, 1:], tok[:, None]], axis=1),
                    (tok, lik),
                )

            scan = nn.scan(
                body,
                variable_broadcast="params",
                split_rngs={"params": False, "noise": True, "dropout": True},
                in_axes=1,
                out_axes=1,
            )
            _, (toks, liks) = scan(
                self, buf, (m_win[:, 1:], s_win[:, 1:], y_tok[:, 1:])
            )
            y_hat_toks = [tok0] + [toks[:, j] for j in range(N - 1)]
            y_liks = [lik0] + [liks[:, j] for j in range(N - 1)]
            zz = jnp.stack(
                [
                    t.reshape(B, Cp, ws, ws).transpose(0, 2, 3, 1)
                    for t in y_hat_toks
                ],
                axis=1,
            )
            y_hat = self._merge(zz, nH, nW)
            H, W = y.shape[1:3]
            y_hat = y_hat[:, :H, :W]
            y_lik = jnp.concatenate(y_liks, axis=-1)
            x_hat = self.g_s(y_hat, deterministic=not training)
            return {
                "x_hat": x_hat,
                "likelihoods": {"y": y_lik, "z": z_lik},
            }

        y_hat_toks = []
        y_liks = []
        for i in range(N):
            if i == 0:
                prev = jnp.zeros((B, s, D), y_tok.dtype)
                # step 0 orders [y-history(zeros), hyper]
                # (stf2.py:1085-1089); later steps [hyper, y-history]
                # (stf2.py:1131-1133) — the channel order the reference
                # conv heads were trained on differs at step 0
                ctx_mu_in = jnp.concatenate([prev, m_win[:, i]], axis=1)
                ctx_sigma_in = jnp.concatenate([prev, s_win[:, i]], axis=1)
            else:
                have = min(i, s)
                stack = jnp.concatenate(
                    [t[:, None] for t in y_hat_toks[-have:]], axis=1
                )
                if have < s:
                    stack = jnp.pad(stack, ((0, 0), (s - have, 0), (0, 0)))
                prev = stack
                ctx_mu_in = jnp.concatenate([m_win[:, i], prev], axis=1)
                ctx_sigma_in = jnp.concatenate([s_win[:, i], prev], axis=1)
            ctx_mu = self.mu_ctx(ctx_mu_in)
            ctx_sigma = self.sigma_ctx(ctx_sigma_in)
            mu = self.cc_mean_head(to_spatial(ctx_mu))
            scale = self.cc_scale_head(to_spatial(ctx_sigma))

            y_slice = (
                y_tok[:, i].reshape(B, Cp, ws, ws).transpose(0, 2, 3, 1)
            )
            _, lik = self.gaussian_conditional(
                y_slice, scale, mu, training=training
            )
            y_liks.append(lik)
            y_hat_slice = ste_round(y_slice - mu) + mu

            lrp_in = jnp.concatenate([to_spatial(ctx_mu), y_hat_slice], axis=-1)
            lrp = self.lrp_head(lrp_in)
            y_hat_slice = y_hat_slice + 0.5 * jnp.tanh(lrp)
            y_hat_toks.append(
                y_hat_slice.transpose(0, 3, 1, 2).reshape(B, D)
            )

        zz = jnp.stack(
            [
                t.reshape(B, Cp, ws, ws).transpose(0, 2, 3, 1)
                for t in y_hat_toks
            ],
            axis=1,
        )
        y_hat = self._merge(zz, nH, nW)
        H, W = y.shape[1:3]
        y_hat = y_hat[:, :H, :W]
        y_lik = jnp.concatenate(y_liks, axis=-1)

        x_hat = self.g_s(y_hat, deterministic=not training)
        return {"x_hat": x_hat, "likelihoods": {"y": y_lik, "z": z_lik}}

    # --- coder-facing stages (crc_codec.Stf2Codec) --------------------------
    def analyze_tokens(self, x):
        """x -> (y tokens (B,N,D), means window (B,N,s,D), scales window,
        z, lattice dims)."""
        ws = self.mask_win_size
        s = self.num_sliding
        y = self.g_a(x, deterministic=True)
        z = self.h_a(y)
        return y, z

    def token_windows(self, y, z_hat):
        ws = self.mask_win_size
        s = self.num_sliding
        means = self.h_mean_s(z_hat)
        scales = self.h_scale_s(z_hat)
        yp, nH, nW, _, _ = _pad_to_windows(y, ws)
        mp = _pad_to_windows(means, ws)[0]
        sp = _pad_to_windows(scales, ws)[0]
        y_tok = self._tokens_flat(self._window_tokens(yp, nH, nW))
        # same swapped hyper wiring as __call__ (stf2.py:1048-1049)
        m_tok = self._tokens_flat(self._window_tokens(sp, nH, nW))
        s_tok = self._tokens_flat(self._window_tokens(mp, nH, nW))
        m_win = _unfold_scramble(
            _causal_windows(m_tok, s, include_current=True)
        )
        s_win = _unfold_scramble(
            _causal_windows(s_tok, s, include_current=True)
        )
        return y_tok, m_win, s_win, (nH, nW)

    def token_context(self, m_win_i, s_win_i, prev, first_step=False):
        """One AR step's mu/scale from the attention context (heads are
        shared across steps). ``first_step`` reproduces the reference's
        step-0 concat order [y-history, hyper] (stf2.py:1085-1089);
        later steps use [hyper, y-history] (stf2.py:1131-1133)."""
        B = m_win_i.shape[0]
        ws = self.mask_win_size
        Cp = self.slice_ch
        s = self.num_sliding

        def to_spatial(tokens):
            # c-major tokens; channel order (k, Cp) as in __call__
            k = tokens.shape[1]
            h = tokens.reshape(B, k, Cp, ws, ws)
            return h.transpose(0, 3, 4, 1, 2).reshape(B, ws, ws, k * Cp)

        if first_step:
            mu_in = jnp.concatenate([prev, m_win_i], axis=1)
            sigma_in = jnp.concatenate([prev, s_win_i], axis=1)
        else:
            mu_in = jnp.concatenate([m_win_i, prev], axis=1)
            sigma_in = jnp.concatenate([s_win_i, prev], axis=1)
        ctx_mu = self.mu_ctx(mu_in)
        ctx_sigma = self.sigma_ctx(sigma_in)
        mu = self.cc_mean_head(to_spatial(ctx_mu))
        scale = self.cc_scale_head(to_spatial(ctx_sigma))
        return mu, scale, to_spatial(ctx_mu)

    def token_context_traced(self, m_win_i, s_win_i, prev, is_first):
        """:meth:`token_context` with a TRACED first-step flag, for the
        codec scan wire (the whole token loop is one ``lax.scan``; step
        0 differs only in the context concat order, stf2.py:1085-1089
        vs 1131-1133, so a where-select keeps one program)."""
        B = m_win_i.shape[0]
        ws = self.mask_win_size
        Cp = self.slice_ch

        def to_spatial(tokens):
            k = tokens.shape[1]
            h = tokens.reshape(B, k, Cp, ws, ws)
            return h.transpose(0, 3, 4, 1, 2).reshape(B, ws, ws, k * Cp)

        def pick(a, b):
            return jnp.where(is_first,
                             jnp.concatenate([a, b], axis=1),
                             jnp.concatenate([b, a], axis=1))

        mu_in = pick(prev, m_win_i)
        sigma_in = pick(prev, s_win_i)
        ctx_mu = self.mu_ctx(mu_in)
        ctx_sigma = self.sigma_ctx(sigma_in)
        mu = self.cc_mean_head(to_spatial(ctx_mu))
        scale = self.cc_scale_head(to_spatial(ctx_sigma))
        return mu, scale, to_spatial(ctx_mu)

    def token_lrp(self, ctx_mu_spatial, y_hat_token):
        lrp = self.lrp_head(
            jnp.concatenate([ctx_mu_spatial, y_hat_token], axis=-1)
        )
        return 0.5 * jnp.tanh(lrp)

    def tokens_assemble(self, y_hat_toks, lattice, out_hw):
        ws = self.mask_win_size
        Cp = self.slice_ch
        nH, nW = lattice
        B = y_hat_toks[0].shape[0]
        zz = jnp.stack(
            [
                t.reshape(B, Cp, ws, ws).transpose(0, 2, 3, 1)
                for t in y_hat_toks
            ],
            axis=1,
        )
        y_hat = self._merge(zz, nH, nW)
        H, W = out_hw
        return y_hat[:, :H, :W]

    def synthesize(self, y_hat, training: bool = False):
        return self.g_s(y_hat, deterministic=not training)
