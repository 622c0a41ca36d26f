"""Real-bitstream compress/decompress for ChARM-protocol codecs.

Behavioral parity with the reference coder paths (reference:
``cnn.py:210-332``; ``EntropyBottleneck.compress/decompress``
``entropy_models.py:508-522``; ``EntropyModel.compress/decompress``
``entropy_models.py:203-290``):
  - z coded by the factorized bottleneck with per-channel CDFs and medians
    as quantization offsets,
  - y coded slice-by-slice (channel or zigzag order) by the conditional
    Gaussian with scale-table CDFs, context computed from previously
    *reconstructed* slices, LRP applied identically on both sides.

TPU-native design decisions:
  - Encoder and decoder share the SAME jitted subfunctions (ctx_prepare,
    per-slice context, per-slice reconstruction). XLA is free to fuse
    differently in different graphs, which could flip a round-to-nearest
    boundary and derail the autoregressive decode; one compiled function
    per stage on both sides makes the float context bit-identical by
    construction.
  - Symbols and indexes leave the device as int32 arrays straight into
    the native threaded rANS (no Python-list marshalling — the reference
    round-trips every element through ``.tolist()``,
    ``entropy_models.py:228-234``).
  - The batch dimension is coded as independent parallel streams.

Works for ANY model implementing the ChARM protocol (cnn, stf, the
stf5-8 family, CRC layers...).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .. import coding
from ..entropy import (
    EntropyTables,
    build_indexes,
    eb_tables_from_pmf_data,
    gc_build_tables,
    get_scale_table,
)
from .base import CodecTables


def enc_round(diff, narrow: float = 1.0):
    """Encoder-side symbol quantization with an optional measurement mode.

    ``narrow < 1`` scales residuals before rounding so symbols concentrate
    in {-1, 0, 1} the way TRAINED streams do (~0.3-1 bpp) even under
    random init (VERDICT r3 #3: untrained weights give 7-23 bpp
    escape-heavy streams that benchmark the coder on unrealistic
    statistics). The roundtrip stays bitexact because every codec in this
    family reconstructs ``y_hat = sym + mu`` from the coded symbols on
    BOTH sides — only rate/distortion of the measurement changes, never
    coder consistency. ``narrow=1`` is the exact default (identity)."""
    if narrow != 1.0:
        diff = diff * jnp.float32(narrow)
    return jnp.round(diff)


def build_codec_tables(model, variables, precision: int = 16) -> CodecTables:
    """Parity: reference ``model.update()`` (``cnn.py:133-138`` +
    ``base.py:41-60``) — refresh Gaussian scale-table CDFs and every
    EntropyBottleneck's CDFs."""
    scale_table = get_scale_table()
    gaussian = gc_build_tables(scale_table, precision=precision)

    # two jitted device calls (static max_lengths resolved in between) —
    # eager per-op dispatch here is pathological on remote-TPU links
    meta = jax.jit(lambda v: model.apply(v, method=model.eb_pmf_meta))(variables)
    meta = jax.device_get(meta)
    max_lengths = {k: int(np.asarray(m[1]).max()) for k, m in meta.items()}
    starts = {k: m[0] for k, m in meta.items()}
    rows = jax.jit(
        lambda v, s: model.apply(v, s, max_lengths, method=model.eb_pmf_rows)
    )(variables, starts)
    rows = jax.device_get(rows)

    bottlenecks = {}
    for name in meta:
        pmf, tail = rows[name]
        _, pmf_length, offset = meta[name]
        bottlenecks[name] = eb_tables_from_pmf_data(
            pmf, tail, pmf_length, offset, precision=precision
        )
    return CodecTables(
        gaussian=gaussian, scale_table=scale_table, bottlenecks=bottlenecks
    )


def _eb_indexes(shape_hw: tuple, C: int) -> np.ndarray:
    """Channel-index map for a flattened (h, w, C) tensor."""
    h, w = shape_hw
    return np.tile(np.arange(C, dtype=np.int32), h * w)


def _unpack_wire(
    sym2: np.ndarray,
    idx6: np.ndarray,
    n_esc: np.ndarray,
    esc: np.ndarray,
    n_total: int,
):
    """Host-side inverse of CharmCodec._pack_streams: 2-bit symbol codes
    + 6-bit indexes + dense escape stream -> (symbols int32 (B, N),
    indexes int32 (B, N)). Vectorized numpy; the per-row escape fill is
    a masked assignment (escape values appear in code order)."""
    B = sym2.shape[0]
    shifts = np.array([0, 2, 4, 6], np.uint8)
    codes = (
        (sym2[:, :, None] >> shifts[None, None, :]) & 3
    ).reshape(B, -1)
    symbols = codes.astype(np.int32) - 1  # 0,1,2 -> -1,0,1
    b = idx6.reshape(B, -1, 3).astype(np.uint32)
    word = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)
    indexes = np.stack(
        [word & 63, (word >> 6) & 63, (word >> 12) & 63, (word >> 18) & 63],
        axis=-1,
    ).reshape(B, -1).astype(np.int32)
    esc_mask = codes == 3
    for bi in range(B):
        k = int(n_esc[bi])
        if k:
            symbols[bi, esc_mask[bi]] = esc[bi, :k].astype(np.int32)
    return (
        np.ascontiguousarray(symbols[:, :n_total]),
        np.ascontiguousarray(indexes[:, :n_total]),
    )


def _put_symbols(sym: np.ndarray, sharding=None) -> jax.Array:
    """Host->device symbol transfer, narrowed to the smallest int dtype
    that fits (int8 for in-range streams; bypass escapes can exceed it).
    Device-side stages cast to float anyway, so the narrower wire dtype
    changes no math. ``sharding``: place the batch across a mesh (SPMD
    decode — must match the encode sharding so both sides compile the
    same partitioned context)."""
    if sym.size:
        peak = np.abs(sym).max()
        if peak < 128:
            sym = sym.astype(np.int8)
        elif peak < 32768:
            sym = sym.astype(np.int16)
    if sharding is not None:
        return jax.device_put(sym, sharding)
    return jnp.asarray(sym)


class CharmCodec:
    """compress()/decompress() driver over the ChARM protocol
    (see ``base.CompressionModel``).

    ``ref_layout=True`` switches the bitstream symbol order to the
    reference's (NCHW C-major flatten per slice / per z tensor,
    reference ``entropy_models.py:229-233`` + ``cnn.py:250-251``):
    streams become byte-identical to — and interchangeable with — the
    reference coder for batch size 1 (the reference mixes the batch into
    one y stream for B>1; we keep one stream per image either way).
    Default False uses the framework-native NHWC order (same lengths,
    no host transposes).
    """

    def __init__(
        self,
        model,
        variables,
        tables: CodecTables | None = None,
        ref_layout: bool = False,
        data_sharding=None,
        narrow: float = 1.0,
    ):
        """``data_sharding``: optional ``jax.sharding.Sharding`` for the
        batch axis. Shard the input to :meth:`compress` with it and the
        codec places decoder-side uploads the same way, so encoder and
        decoder run the identical SPMD partitioning over the mesh (the
        bit-identical-context invariant extends to sharded execution —
        tests/test_codec_sharded.py)."""
        self.model = model
        self.variables = variables
        self.ref_layout = ref_layout
        self.data_sharding = data_sharding
        self.narrow = narrow  # see enc_round (1.0 = exact default)
        # subclasses that never consume the packed host wire (the device
        # wire fetches nothing per-symbol) skip building it entirely
        self._wants_packed = True
        self.tables = tables or build_codec_tables(model, variables)
        self._scale_table_dev = jnp.asarray(self.tables.scale_table)

        mdl = model

        @jax.jit
        def analyze(v, x):
            return mdl.apply(v, x, method=mdl.analyze)

        narrow_f = self.narrow

        @jax.jit
        def z_symbols(v, z):
            med = mdl.apply(v, method=mdl.eb_medians)
            sym = enc_round(z - med, narrow_f).astype(jnp.int32)
            ovf = jnp.any(jnp.abs(sym) > 127)
            return sym.astype(jnp.int8), ovf, sym

        @jax.jit
        def z_dequant(v, sym):
            med = mdl.apply(v, method=mdl.eb_medians)
            return sym.astype(jnp.float32) + med

        @jax.jit
        def ctx_prepare(v, z_hat):
            return mdl.apply(v, z_hat, method=mdl.ctx_prepare)

        @jax.jit
        def latent_slices(v, y):
            return mdl.apply(v, y, method=mdl.latent_slices)

        @functools.partial(jax.jit, static_argnums=(1,))
        def slice_context(v, i, state, support):
            mu, scale, mean_support = mdl.apply(
                v, i, state, support, method=mdl.slice_context
            )
            # uint8 on the wire: 64 scale levels, 4x less host<->device
            # traffic per slice (the link, not the coder, is the decode
            # bottleneck on remote-device setups)
            index = build_indexes(scale, self._scale_table_dev).astype(
                jnp.uint8
            )
            return mu, scale, index, mean_support

        @functools.partial(jax.jit, static_argnums=(1,))
        def slice_encode(v, i, y_slice, mu, mean_support):
            sym = enc_round(y_slice - mu, narrow_f).astype(jnp.int32)
            y_hat = sym.astype(mu.dtype) + mu
            lrp = mdl.apply(v, i, mean_support, y_hat, method=mdl.slice_lrp)
            return sym, y_hat + lrp

        @functools.partial(jax.jit, static_argnums=(1,))
        def slice_decode(v, i, sym, mu, mean_support):
            y_hat = sym.astype(mu.dtype) + mu
            lrp = mdl.apply(v, i, mean_support, y_hat, method=mdl.slice_lrp)
            return y_hat + lrp

        @functools.partial(jax.jit, static_argnums=(1,))
        def quantize_slice(v, i, y_slice, mu):
            """Encoder-side rounding; int8 on the wire (halves the
            device->host payload vs int16 — the batched fetch transfer
            is 76% of encode time on remote hosts, tools/
            profile_encode.py) with an overflow flag: bypass escapes can
            exceed int8, re-fetch exact int32 for that slice then."""
            sym = enc_round(y_slice - mu, narrow_f).astype(jnp.int32)
            ovf = jnp.any(jnp.abs(sym) > 127)
            return sym.astype(jnp.int8), ovf, sym

        @functools.partial(jax.jit, static_argnums=(1,))
        def step(v, i, state, decoded, sym, mu, mean_support):
            """Reconstruct slice i AND compute slice i+1's context in one
            dispatch. Shared verbatim by the encoder and decoder, so the
            autoregressive float context stays bit-identical on both
            sides (the design invariant of this codec)."""
            y_hat = sym.astype(mu.dtype) + mu
            lrp = mdl.apply(v, i, mean_support, y_hat, method=mdl.slice_lrp)
            y_hat = y_hat + lrp
            if i + 1 >= mdl.ctx_slices:
                return (y_hat,)
            support = mdl.ctx_support(i + 1, list(decoded) + [y_hat])
            mu2, scale2, ms2 = mdl.apply(
                v, i + 1, state, support, method=mdl.slice_context
            )
            index2 = build_indexes(scale2, self._scale_table_dev).astype(
                jnp.uint8
            )
            return y_hat, mu2, index2, ms2

        @jax.jit
        def assemble_synthesize(v, y_hat_slices):
            y_hat = mdl.apply(v, y_hat_slices, method=mdl.ctx_assemble)
            x_hat = mdl.apply(v, y_hat, method=mdl.synthesize)
            return y_hat, jnp.clip(x_hat, 0.0, 1.0)

        @functools.partial(jax.jit, static_argnums=(1,))
        def step_assemble(v, i, decoded, sym, mu, mean_support):
            """Last AR slice fused with assemble+synthesize: one device
            program instead of two (per-program overhead is a measured
            cost on remote runtimes). Used by BOTH coder sides for the
            final slice, so the last y_hat stays bit-identical too."""
            y_hat = sym.astype(mu.dtype) + mu
            lrp = mdl.apply(v, i, mean_support, y_hat, method=mdl.slice_lrp)
            slices = list(decoded) + [y_hat + lrp]
            yh = mdl.apply(v, slices, method=mdl.ctx_assemble)
            xh = mdl.apply(v, yh, method=mdl.synthesize)
            return yh, jnp.clip(xh, 0.0, 1.0)

        @jax.jit
        def pack_streams(sym16s, idxs):
            """Device-side wire compaction for the ONE batched encode
            fetch (the fetch is the dominant encode cost on remote
            hosts: 21.4 MB of int8 symbols+indexes produce a 4.6 MB
            bitstream — BASELINE.md). Symbols become 2-bit codes
            ({-1,0,1} + escape; quantized residuals concentrate at 0) and
            scale indexes 6-bit (64 table levels), with escaped values
            compacted into a dense int8 side stream — ~1.0 B/symbol over
            the link instead of 2.0. The BITSTREAM is unchanged; only the
            device->host representation is."""
            B = sym16s[0].shape[0]

            def flat(a):
                if self.ref_layout:
                    a = jnp.transpose(a, (0, 3, 1, 2))
                return a.reshape(B, -1)

            sym = jnp.concatenate(
                [flat(s) for s in sym16s], axis=1
            ).astype(jnp.int32)
            idx = jnp.concatenate(
                [flat(i) for i in idxs], axis=1
            ).astype(jnp.int32)
            pad = (-sym.shape[1]) % 4
            if pad:
                sym = jnp.pad(sym, ((0, 0), (0, pad)))
                idx = jnp.pad(idx, ((0, 0), (0, pad)))
            Np = sym.shape[1]
            esc = (sym < -1) | (sym > 1)
            code = jnp.where(esc, 3, sym + 1).astype(jnp.uint32)
            c = code.reshape(B, -1, 4)
            sym2 = (
                c[..., 0] | (c[..., 1] << 2) | (c[..., 2] << 4)
                | (c[..., 3] << 6)
            ).astype(jnp.uint8)
            iv = idx.reshape(B, -1, 4).astype(jnp.uint32)
            word = (
                iv[..., 0] | (iv[..., 1] << 6) | (iv[..., 2] << 12)
                | (iv[..., 3] << 18)
            )
            idx6 = jnp.stack(
                [word & 0xFF, (word >> 8) & 0xFF, (word >> 16) & 0xFF],
                axis=-1,
            ).astype(jnp.uint8).reshape(B, -1)
            n_esc = esc.sum(axis=1).astype(jnp.int32)
            pos = jnp.cumsum(esc, axis=1) - 1
            dest = jnp.where(esc, pos, Np)  # out-of-bounds -> dropped
            esc_buf = (
                jnp.zeros((B, Np), jnp.int8)
                .at[jnp.arange(B)[:, None], dest]
                .set(sym.astype(jnp.int8), mode="drop")
            )
            return sym2, idx6, n_esc, esc_buf

        self._analyze = analyze
        self._z_symbols = z_symbols
        self._z_dequant = z_dequant
        self._ctx_prepare = ctx_prepare
        self._latent_slices = latent_slices
        self._slice_context = slice_context
        self._slice_encode = slice_encode
        self._slice_decode = slice_decode
        self._quantize_slice = quantize_slice
        self._step = step
        self._step_assemble = step_assemble
        self._assemble_synthesize = assemble_synthesize
        self._pack_streams = pack_streams

    # --- layout helpers ------------------------------------------------------
    def _flat(self, a: np.ndarray) -> np.ndarray:
        """(B, h, w, c) host array -> (B, N) in the active symbol order."""
        a = np.asarray(a)
        if self.ref_layout:
            a = np.transpose(a, (0, 3, 1, 2))
        return np.ascontiguousarray(a.reshape(a.shape[0], -1))

    def _unflat(self, a: np.ndarray, h: int, w: int, c: int) -> np.ndarray:
        """(B, N) symbols -> (B, h, w, c) honoring the active order."""
        B = a.shape[0]
        if self.ref_layout:
            return np.transpose(a.reshape(B, c, h, w), (0, 2, 3, 1))
        return a.reshape(B, h, w, c)

    # --- z (factorized bottleneck) -----------------------------------------
    def _z_tables(self) -> EntropyTables:
        return self.tables.bottlenecks["entropy_bottleneck"]

    def _z_indexes(self, h: int, w: int, C: int, B: int) -> np.ndarray:
        if self.ref_layout:
            # reference EntropyBottleneck._build_indexes: channel-major
            # (entropy_models.py:491-502 under NCHW flatten)
            idx = np.repeat(np.arange(C, dtype=np.int32), h * w)
        else:
            idx = _eb_indexes((h, w), C)
        return np.broadcast_to(idx, (B, h * w * C))

    def _encode_z_host(self, sym: np.ndarray) -> List[bytes]:
        B, h, w, C = sym.shape
        t = self._z_tables()
        idx = self._z_indexes(h, w, C, B)
        return coding.encode_batch(
            self._flat(sym).astype(np.int32), idx,
            t.quantized_cdf, t.cdf_length, t.offset,
        )

    def _decode_z(self, strings: List[bytes], shape_hw) -> jax.Array:
        h, w = shape_hw
        t = self._z_tables()
        C = t.num_distributions
        B = len(strings)
        idx = self._z_indexes(h, w, C, B)
        sym = coding.BatchRansDecoder(strings).decode_stream(
            idx, t.quantized_cdf, t.cdf_length, t.offset,
            lut=t.symbol_lut(),
        )
        sym = _put_symbols(self._unflat(sym, h, w, C), self.data_sharding)
        return self._z_dequant(self.variables, sym)

    # --- public API --------------------------------------------------------
    @staticmethod
    def _group_sizes(B: int, pipeline_groups: int) -> List[int]:
        """Deterministic contiguous batch split shared by compress and
        decompress: identical group shapes on both sides keep the AR
        float context bit-identical (XLA results vary with batch shape,
        so encoder and decoder must run context at the SAME shapes)."""
        g = min(max(pipeline_groups, 1), B)
        return [B // g + (1 if i < B % g else 0) for i in range(g)]

    def compress(
        self, x, return_debug: bool = False, pipeline_groups: int = 1
    ) -> Dict[str, Any]:
        """x: (B, H, W, 3) in [0, 1]. Returns
        {"strings": [y_strings, z_strings], "shape": (zh, zw)} — the
        reference output contract (``cnn.py:267``).

        ``pipeline_groups > 1`` encodes the batch in contiguous groups.
        Use the SAME value in :meth:`decompress` — the decoder's
        software pipeline needs matching group shapes to reproduce the
        encoder's AR context bit-for-bit."""
        B = x.shape[0]
        sizes = self._group_sizes(B, pipeline_groups)
        if len(sizes) <= 1:
            return self._compress_group(x, return_debug)
        bounds = np.cumsum([0] + sizes)
        # threaded groups: one group's blocking fetch + host rANS (both
        # release the GIL) overlap the others' device compute/transfers
        from .pipelining import run_groups

        outs = run_groups(
            lambda a, b: self._compress_group(x[a:b], return_debug),
            list(zip(bounds[:-1], bounds[1:])),
        )
        merged: Dict[str, Any] = {
            "strings": [
                [s for o in outs for s in o["strings"][0]],
                [s for o in outs for s in o["strings"][1]],
            ],
            "shape": outs[0]["shape"],
        }
        if return_debug:
            for k in ("y_hat", "z_hat"):
                merged[k] = jnp.concatenate([o[k] for o in outs], axis=0)
        return merged

    def _compress_group(self, x, return_debug: bool = False) -> Dict[str, Any]:
        return self._compress_finish(self._compress_dispatch(x), return_debug)

    def _compress_dispatch(self, x) -> Dict[str, Any]:
        """Async half of compress: queue every device computation and
        return the pending device arrays without a single blocking fetch."""
        v = self.variables
        y, z = self._analyze(v, x)
        zh, zw = z.shape[1], z.shape[2]

        # the whole encode loop is async dispatch: the host needs symbols
        # and indexes only for the final rANS pass, so everything leaves
        # the device in ONE batched device_get at the end (each blocking
        # fetch inside the loop costs a full link round-trip)
        z16, z_ovf, z_sym = self._z_symbols(v, z)
        z_hat = self._z_dequant(v, z_sym)  # encoder replicates decoder state

        state = self._ctx_prepare(v, z_hat)
        y_slices = self._latent_slices(v, y)

        y_hat_slices: List[jax.Array] = []
        sym16s, ovfs, sym32s, idxs = [], [], [], []
        mu, _, index, mean_support = self._slice_context(v, 0, state, [])
        last_args = None
        for i in range(self.model.ctx_slices):
            sym16, ovf, sym32 = self._quantize_slice(v, i, y_slices[i], mu)
            sym16s.append(sym16)
            ovfs.append(ovf)
            sym32s.append(sym32)
            idxs.append(index)
            if i + 1 < self.model.ctx_slices:
                # step consumes the exact device-side int32 symbols
                # (sym16 is only the wire format; it wraps on the rare
                # bypass overflow)
                out = self._step(
                    v, i, state, y_hat_slices, sym32, mu, mean_support
                )
                y_hat_slices.append(out[0])
                mu, index, mean_support = out[1], out[2], out[3]
            else:
                # the last slice's reconstruction is only needed for the
                # debug assemble — defer it to the fused final program
                last_args = (sym32, mu, mean_support)

        packed = None
        if self._wants_packed:
            packed = self._pack_streams(sym16s, idxs)
            for a in (z16, z_ovf, packed[2], *ovfs):
                try:  # start the device->host copies behind the device queue
                    a.copy_to_host_async()
                except AttributeError:
                    pass
        return dict(
            z16=z16, z_ovf=z_ovf, z_sym=z_sym, sym16s=sym16s, ovfs=ovfs,
            sym32s=sym32s, idxs=idxs, y_hat_slices=y_hat_slices,
            last_args=last_args, z_hat=z_hat, shape=(zh, zw),
            packed=packed,
        )

    def _compress_finish(
        self, pend: Dict[str, Any], return_debug: bool = False
    ) -> Dict[str, Any]:
        """Blocking half of compress: ONE batched device fetch, then the
        host rANS passes."""
        v = self.variables
        gt = self.tables.gaussian
        z16, z_ovf, z_sym = pend["z16"], pend["z_ovf"], pend["z_sym"]
        sym32s = pend["sym32s"]
        zh, zw = pend["shape"]

        # Phase 1 — small fetch (z symbols, overflow flags, escape count).
        # The escape count then SELECTS the bulk wire format: the packed
        # form (~1.0 B/symbol) only pays for itself when escapes are rare
        # (trained-model statistics: residuals concentrate in {-1,0,1});
        # with broad symbols the escape side stream erases the saving and
        # the raw int8 arrays are fetched instead. Measured on the remote
        # link (36 MB/s, ~40 ms RTT): raw 21 MB = 0.58 s, packed+escapes
        # at 3% escape rate ≈ 0.37 s, packed at 40% escapes ≈ 0.98 s.
        sym2, idx6, n_esc, esc_buf = pend["packed"]
        z_sym_h, z_ovf_h, n_esc_h, ovf_h = jax.device_get(
            (z16, z_ovf, n_esc, pend["ovfs"])
        )
        if bool(z_ovf_h):  # rare: bypass symbol beyond int8 — exact refetch
            z_sym_h = jax.device_get(z_sym)

        z_strings = self._encode_z_host(np.asarray(z_sym_h))
        n_total = sum(
            int(np.prod(s.shape[1:])) for s in pend["sym16s"]
        )
        max_esc = int(np.max(n_esc_h)) if len(n_esc_h) else 0

        # Phase 2 — bulk fetch in the selected format.
        if max_esc <= n_total // 8:
            fetch = [sym2, idx6]
            if max_esc:
                fetch.append(esc_buf[:, :max_esc])
            got = jax.device_get(tuple(fetch))
            sym2_h, idx6_h = got[0], got[1]
            esc_h = (
                np.asarray(got[2])
                if max_esc
                else np.zeros((sym2_h.shape[0], 0), np.int8)
            )
            symbols, indexes = _unpack_wire(
                np.asarray(sym2_h), np.asarray(idx6_h),
                np.asarray(n_esc_h), esc_h, n_total,
            )
        else:
            sym_h, idx_h = jax.device_get((pend["sym16s"], pend["idxs"]))
            symbols = np.concatenate(
                [self._flat(s).astype(np.int32) for s in sym_h], axis=1
            )
            indexes = np.concatenate(
                [self._flat(ii) for ii in idx_h], axis=1
            )
        for i, o in enumerate(ovf_h):
            if bool(o):
                # bypass escape beyond int8 wraps both wire forms —
                # overwrite that slice's span with the exact int32 symbols
                span = int(np.prod(pend["sym16s"][i].shape[1:]))
                start = sum(
                    int(np.prod(s.shape[1:])) for s in pend["sym16s"][:i]
                )
                exact = self._flat(jax.device_get(sym32s[i])).astype(
                    np.int32
                )
                symbols[:, start : start + span] = exact
        y_strings = coding.encode_batch(
            symbols, indexes, gt.quantized_cdf, gt.cdf_length, gt.offset
        )
        out = {"strings": [y_strings, z_strings], "shape": (zh, zw)}
        if return_debug:
            y_hat, x_hat = self._step_assemble(
                v, self.model.ctx_slices - 1, pend["y_hat_slices"],
                *pend["last_args"],
            )
            out["y_hat"] = y_hat
            out["z_hat"] = pend["z_hat"]
        return out

    def decompress(
        self, strings, shape, pipeline_groups: int = 1
    ) -> Dict[str, Any]:
        """``pipeline_groups``: split the batch into that many stream
        groups and software-pipeline the AR decode — group B's device
        context step and host->device symbol upload run while group A's
        index fetch (a full link round-trip on remote-TPU hosts) and host
        rANS are in flight. MUST match the value given to
        :meth:`compress`: the AR context is only bit-identical between
        encoder and decoder when both run it at the same batch shapes
        (XLA float results vary with batch size). Default 1 = serial.

        Wire-format guard: the host decode paths all flow through
        ``coding.BatchRansDecoder``/``decode_batch``, which reject tagged
        device/scan streams loudly (coding/wire.py) — no check here, as
        ``DeviceWireCodec`` inherits this method for its own wire."""
        y_strings, z_strings = strings
        B = len(y_strings)
        sizes = self._group_sizes(B, pipeline_groups)
        if len(sizes) <= 1:
            return self._decompress_group(y_strings, z_strings, shape)

        bounds = np.cumsum([0] + sizes)
        groups = [
            (y_strings[a:b], z_strings[a:b])
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        outs = self._decompress_pipelined(groups, shape)
        return {
            "x_hat": jnp.concatenate([o["x_hat"] for o in outs], axis=0),
            "y_hat": jnp.concatenate([o["y_hat"] for o in outs], axis=0),
        }

    def _decompress_group(self, y_strings, z_strings, shape) -> Dict[str, Any]:
        v = self.variables
        z_hat = self._decode_z(z_strings, shape)
        state = self._ctx_prepare(v, z_hat)

        gt = self.tables.gaussian
        lut = gt.symbol_lut()
        decoder = coding.BatchRansDecoder(y_strings)

        y_hat_slices: List[jax.Array] = []
        mu, _, index, mean_support = self._slice_context(v, 0, state, [])
        S = self.model.ctx_slices
        for i in range(S):
            idx_np = np.asarray(jax.device_get(index))
            _, sh, sw, sc = idx_np.shape
            sym = decoder.decode_stream(
                self._flat(idx_np), gt.quantized_cdf, gt.cdf_length,
                gt.offset, lut=lut,
            )
            sym = self._unflat(sym, sh, sw, sc)
            dev_sym = _put_symbols(sym, self.data_sharding)
            if i + 1 < S:
                out = self._step(
                    v, i, state, y_hat_slices, dev_sym, mu, mean_support
                )
                y_hat_slices.append(out[0])
                mu, index, mean_support = out[1], out[2], out[3]
            else:
                # last slice fused with assemble+synthesize (same program
                # as the encoder's debug path -> bit-identical y_hat)
                y_hat, x_hat = self._step_assemble(
                    v, i, y_hat_slices, dev_sym, mu, mean_support
                )
        return {"x_hat": x_hat, "y_hat": y_hat}

    def _decompress_pipelined(self, groups, shape) -> List[Dict[str, Any]]:
        """Threaded stream groups: the per-slice blocking index fetch (a
        full link round-trip) and the host rANS release the GIL, so each
        group's host phases overlap the other groups' device context
        steps. Measured faster than an explicit single-thread round-robin
        (tools/probe_threads.py)."""
        from .pipelining import run_groups

        return run_groups(
            lambda y_s, z_s: self._decompress_group(y_s, z_s, shape),
            groups,
        )
