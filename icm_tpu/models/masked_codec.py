"""Real bitstream coders for stf3/stf4 (masked-transformer context).

stf3's reference context attention carries an internal causal block mask
(stf3.py:196-207: hyper rows attend hyper-only, y rows lower-triangular
with 0/-1000 additive fills) — with the teacher-forcing shift it is
decodable as written, and this coder drives it directly (also on
converted reference checkpoints). stf4's mask degenerates at token 0
(all-masked row -> full attention over future tokens, stf4.py:203-206),
so its coder requires the ``causal=True`` completion (see
ClipEncoder3/ClipEncoder4 docstrings):

  - symbols are ABSOLUTE integers ``round(y)`` coded as
    ``round(y) - round(mu)`` with the zero-mean scale-table CDFs, so the
    decoded context tokens are exactly ``round(y)`` — identical to the
    training forward's ``ste_round(y)`` context (mean-centered
    quantization would feed the context reconstructions the training
    path never saw);
  - ONE jitted causal context pass is shared verbatim by encoder and
    decoder. Attention masking uses exact ``-inf`` logits, so outputs
    are bit-independent of future-token buffer contents: the encoder
    evaluates it once on the full integer token sequence (encode is
    fully parallel), the decoder re-runs it per step on its zero-padded
    prefix buffer and reads one row — bit-identical by construction.

Decode is O(N) context passes (N = token count); correctness-first, with
the same step-sharing invariant as codec.CharmCodec.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .. import coding
from ..entropy import build_indexes
from .base import CodecTables
from .codec import build_codec_tables


class Stf3Codec:
    """compress()/decompress() for ClipEncoder3/ClipEncoder4 models
    (``causal=True``); strings = [y_strings, z_strings]."""

    def __init__(self, model, variables, tables: CodecTables | None = None):
        from .masked_ctx import ClipEncoder3

        # stf3's reference block mask is causal (hyper rows see hyper
        # only; prediction row N-1+i sees y_hat[<i]) so BOTH its modes
        # are decodable; stf4's reference mask degenerates at token 0
        # (all-masked row -> softmax falls back to full attention over
        # future tokens) so only its causal=True completion codes.
        if not getattr(model, "causal", False) and not isinstance(
            model, ClipEncoder3
        ):
            raise ValueError(
                "Stf4Codec needs a causal context model: build with "
                "causal=True (the reference stf4 mask degenerates at "
                "token 0 — see ClipEncoder4 docstring)"
            )
        self.model = model
        self.variables = variables
        self.tables = tables or build_codec_tables(model, variables)
        st = jnp.asarray(self.tables.scale_table)
        mdl = model

        @jax.jit
        def analyze(v, x):
            return mdl.apply(v, x, method=mdl.analyze)

        @jax.jit
        def eb_medians(v):
            return mdl.apply(v, method=mdl.eb_medians)

        @jax.jit
        def coder_tokens(v, y, z_hat):
            return mdl.apply(v, y, z_hat, method=mdl.coder_tokens)

        @jax.jit
        def full_context(v, m_tok, s_tok, y_buf):
            """Encoder path: all rows at once from the true token seq."""
            mu, scale = mdl.apply(
                v, m_tok, s_tok, y_buf, method=mdl.causal_mu_scale
            )
            mu_int = jnp.round(mu)
            sym = (y_buf - mu_int).astype(jnp.int32)
            index = build_indexes(scale, st).astype(jnp.uint8)
            return sym, index

        @jax.jit
        def step_context(v, m_tok, s_tok, y_buf, i):
            """Decoder path: same pass on the zero-padded prefix buffer,
            one row out."""
            mu, scale = mdl.apply(
                v, m_tok, s_tok, y_buf, method=mdl.causal_mu_scale
            )
            mu_i = jax.lax.dynamic_slice_in_dim(mu, i, 1, axis=1)[:, 0]
            scale_i = jax.lax.dynamic_slice_in_dim(scale, i, 1, axis=1)[:, 0]
            return jnp.round(mu_i), build_indexes(scale_i, st).astype(jnp.uint8)

        @jax.jit
        def place_token(y_buf, tok, i):
            return jax.lax.dynamic_update_slice_in_dim(
                y_buf, tok[:, None], i, axis=1
            )

        @functools.partial(jax.jit, static_argnums=(4, 5))
        def reconstruct(v, y_buf, means, scales, lattice, out_hw):
            y_hat = mdl.apply(
                v, y_buf, means, scales, lattice, out_hw,
                method=mdl.coder_reconstruct,
            )
            x_hat = mdl.apply(v, y_hat, method=mdl.synthesize)
            return y_hat, jnp.clip(x_hat, 0.0, 1.0)

        self._analyze = analyze
        self._eb_medians = eb_medians
        self._coder_tokens = coder_tokens
        self._full_context = full_context
        self._step_context = step_context
        self._place_token = place_token
        self._reconstruct = reconstruct

    # --- z (factorized bottleneck), one stream per image --------------------
    def _z_tables(self):
        return self.tables.bottlenecks["entropy_bottleneck"]

    def _z_indexes(self, shape):
        B, h, w, C = shape
        idx = np.tile(np.arange(C, dtype=np.int32), h * w)
        return np.broadcast_to(idx, (B, h * w * C))

    def _encode_z(self, z_sym: np.ndarray) -> List[bytes]:
        t = self._z_tables()
        return coding.encode_batch(
            z_sym.reshape(z_sym.shape[0], -1), self._z_indexes(z_sym.shape),
            t.quantized_cdf, t.cdf_length, t.offset,
        )

    def _decode_z(self, strings, shape_hw):
        t = self._z_tables()
        h, w = shape_hw
        C = t.num_distributions
        B = len(strings)
        idx = self._z_indexes((B, h, w, C))
        sym = coding.BatchRansDecoder(strings).decode_stream(
            idx, t.quantized_cdf, t.cdf_length, t.offset, lut=t.symbol_lut()
        )
        med = self._eb_medians(self.variables)
        return jnp.asarray(sym.reshape(B, h, w, C), jnp.float32) + med

    # --- public API ----------------------------------------------------------
    def compress(self, x, return_debug: bool = False) -> Dict[str, Any]:
        v = self.variables
        y, z = self._analyze(v, x)
        med = self._eb_medians(v)
        z_sym = np.asarray(
            jax.device_get(jnp.round(z - med).astype(jnp.int32))
        )
        z_strings = self._encode_z(z_sym)
        z_hat = jnp.asarray(z_sym, jnp.float32) + med

        y_tok, m_tok, s_tok, means, scales, lattice, out_hw = (
            self._coder_tokens(v, y, z_hat)
        )
        sym, index = self._full_context(v, m_tok, s_tok, y_tok)
        sym_h = np.asarray(jax.device_get(sym))
        idx_h = np.asarray(jax.device_get(index))
        B = sym_h.shape[0]
        gt = self.tables.gaussian
        y_strings = coding.encode_batch(
            sym_h.reshape(B, -1), idx_h.reshape(B, -1),
            gt.quantized_cdf, gt.cdf_length, gt.offset,
        )
        out = {
            "strings": [y_strings, z_strings],
            "shape": (int(z.shape[1]), int(z.shape[2])),
        }
        if return_debug:
            y_hat, x_hat = self._reconstruct(
                v, y_tok, means, scales,
                tuple(int(d) for d in lattice),
                tuple(int(d) for d in out_hw),
            )
            out["y_hat"] = y_hat
            out["x_hat"] = x_hat
        return out

    def decompress(self, strings, shape) -> Dict[str, Any]:
        v = self.variables
        y_strings, z_strings = strings
        z_hat = self._decode_z(z_strings, shape)
        # token geometry from a zero latent of the right shape
        ph, pw = shape[0] * 4, shape[1] * 4  # hyper downsamples latent by 4
        zero_y = jnp.zeros(
            (z_hat.shape[0], ph, pw, self.model.latent_dim), jnp.float32
        )
        y_tok, m_tok, s_tok, means, scales, lattice, out_hw = (
            self._coder_tokens(v, zero_y, z_hat)
        )
        B, N, D = y_tok.shape
        gt = self.tables.gaussian
        lut = gt.symbol_lut()
        decoder = coding.BatchRansDecoder(y_strings)

        y_buf = jnp.zeros((B, N, D), jnp.float32)
        for i in range(N):
            mu_int, index = self._step_context(v, m_tok, s_tok, y_buf, i)
            idx_np = np.asarray(jax.device_get(index)).reshape(B, -1)
            sym = decoder.decode_stream(
                idx_np, gt.quantized_cdf, gt.cdf_length, gt.offset, lut=lut
            )
            tok = jnp.asarray(sym.reshape(B, D), jnp.float32) + mu_int
            y_buf = self._place_token(y_buf, tok, i)

        y_hat, x_hat = self._reconstruct(
            v, y_buf, means, scales,
            tuple(int(d) for d in lattice),
            tuple(int(d) for d in out_hw),
        )
        return {"x_hat": x_hat, "y_hat": y_hat}


# ClipEncoder4 exposes the identical coder-facing protocol
# (analyze/coder_tokens/causal_mu_scale/coder_reconstruct/synthesize),
# so the driver is shared.
Stf4Codec = Stf3Codec
