"""On-device (XLA) lane-parallel rANS entropy coder.

Why this exists (the decode RTT problem): the reference decodes the
autoregressive y latent by crossing the Python<->C++ boundary once per
slice (reference ``cnn.py:306-327``: per-slice ``decoder.decode_stream``),
which this framework initially mirrored as a device->host index fetch +
host rANS + host->device symbol upload per slice. On a remote-TPU link
(~40 ms RTT) those 10-24 serial round-trips dominate decode wall-clock
(BASELINE.md: decode MFU 1.9-6.7%). This module moves the entropy decode
ONTO the device: the bitstream is uploaded once, symbols are decoded by
vectorized integer ops inside the same device queue as the context
convolutions, and nothing crosses the link until the final ``x_hat``
fetch.

Coder design (TPU-native, NOT the host wire format):
  - 32-bit rANS state, 16-bit word renormalization, 16-bit coder
    precision (same table semantics as the host coder, so
    ``build_codec_tables`` output is reused directly).
  - N parallel lanes: each lane owns an independent rANS stream. Symbols
    that are conditionally independent given the AR context (everything
    inside one ChARM slice) are laid out across lanes and decoded in
    lock-step by one vectorized instruction stream; the serial dimension
    is only the per-lane symbol count.
  - ONE gather per decoded symbol besides the renorm pull: a packed
    pair LUT ``lut2[r, peek] = (value, freq<<16 | (peek - cdf_low))``
    (uint32 x 2, fetched as a single gather with a trailing slice of 2)
    resolves symbol value, frequency, and in-interval offset in one
    lookup (measured on TPU v5e: 0.84 ms per 32768-lane step vs 1.29 for
    the v1 separate-LUT + inline-escape step; gather count, not table
    size, is what the hardware charges for).
  - Out-of-range symbols are coded as the per-row bypass symbol
    (``cdf_length - 2``, the host-coder convention) and their raw 32-bit
    values travel on a SIDE CHANNEL: ``(dest, raw)`` pairs the encoder
    compacts on device and the decoder applies with one masked scatter.
    This removes the two extra renorm pulls per step the v1 inline bypass
    paid on EVERY symbol (branch-free vector code cannot skip them), at
    +8 wire bytes per escape — escapes are rare at trained-model symbol
    statistics.
  - The encoder emits (word, flag) pairs as ``lax.scan`` outputs
    (sequential writes) and materializes per-lane streams with ONE
    compaction scatter at the end, replacing the v1 per-step masked
    scatters (measured 0.55 ms vs 2.74 ms per step). Streams come out
    already in decode order: ``[state_hi, state_lo, w_{K-1}, ..., w_0]``.

The HOST coder (``icm_tpu.coding``) remains the reference-interoperable
format; this wire trades format compatibility for a zero-round-trip
device decode. Streams produced by :func:`encode_lanes` are decoded by
:func:`decode_lanes` bit-exactly (tests/test_device_rans.py), with the
pure-numpy mirror at the bottom as the independent oracle.

Determinism note: everything here is integer arithmetic — encoder and
decoder agree exactly regardless of XLA fusion decisions. The float
context that FEEDS the row indexes is kept bit-identical between encoder
and decoder by the codec layer (shared jitted per-slice programs, see
``models/codec.py``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyTables

PRECISION = 16
_L = np.uint32(1 << 16)  # renormalization interval lower bound
_MASK16 = np.uint32(0xFFFF)
# decoded-value sentinel marking an escaped symbol; legit values are
# sym + offset with |value| < ~2k for every table this framework builds
# (build_device_tables asserts it)
ESC_VAL = 0x7FFF


# --------------------------------------------------------------------------
# Tables
# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class DeviceCoderTables:
    """Device-resident coding tables built from host :class:`EntropyTables`.

    ``lut2[r, peek] = (value & 0xFFFF, freq << 16 | (peek - low))`` for
    the symbol whose CDF interval contains ``peek``; ``value`` is the
    already-offset decoded value (``sym + offset[r]``) or :data:`ESC_VAL`
    for the bypass symbol. ``fc[r, s] = freq << 16 | cdf_low`` drives the
    encoder (freq < 2**16 always: ``pmf_to_quantized_cdf`` gives every
    interval >= 1 and rows have >= 2 intervals).
    """

    lut2: jax.Array  # uint32 (n * (1 << 16), 2)
    fc: jax.Array  # uint32 (n, max_sym + 1)
    esc_sym: jax.Array  # int32 (n,) = cdf_length - 2 (bypass symbol)
    offset: jax.Array  # int32 (n,)
    eo: jax.Array  # int32 (n, 2) = (esc_sym, offset) pair-gather table

    @property
    def num_rows(self) -> int:
        return int(self.fc.shape[0])


# Pytree registration: coder programs take the tables as an ARGUMENT, not a
# closure. A closed-over jax.Array is traced as a compile-time constant and
# XLA bakes it into the executable — with lut2 at rows x 65536 x 8 B that
# made every decode program a 30-112 MB binary (slow to compile, slow to
# write/read from the persistent cache, re-uploaded over the tunnel per
# program, and duplicated in HBM per executable). As an argument the tables
# live in HBM once and every program that uses them stays KB-sized.
jax.tree_util.register_dataclass(
    DeviceCoderTables,
    data_fields=("lut2", "fc", "esc_sym", "offset", "eo"),
    meta_fields=(),
)


def build_device_tables(t: EntropyTables) -> DeviceCoderTables:
    """Host-side table build (numpy), uploaded once."""
    cdf = np.asarray(t.quantized_cdf, np.int64)
    lens = np.asarray(t.cdf_length, np.int64)
    offs = np.asarray(t.offset, np.int64)
    n = cdf.shape[0]
    max_sym = int(lens.max()) - 1  # coded symbols 0 .. cdf_length-2
    fc = np.zeros((n, max_sym), np.uint32)
    lut2 = np.zeros((n, 1 << PRECISION, 2), np.uint32)
    peeks = np.arange(1 << PRECISION, dtype=np.int64)
    for r in range(n):
        L = int(lens[r])
        row = cdf[r, :L]
        freq = (row[1:] - row[:-1]).astype(np.int64)
        fc[r, : L - 1] = (freq.astype(np.uint32) << 16) | row[:-1].astype(
            np.uint32
        )
        s = np.clip(
            np.searchsorted(row, peeks, side="right") - 1, 0, L - 2
        )
        val = s + offs[r]
        legit = val[s < L - 2]
        if legit.size and int(np.abs(legit).max()) >= ESC_VAL:
            raise ValueError(
                f"row {r}: |value| {int(np.abs(legit).max())} >= "
                "escape sentinel"
            )
        val = np.where(s == L - 2, ESC_VAL, val)
        start = peeks - row[s]
        lut2[r, :, 0] = (val & 0xFFFF).astype(np.uint32)
        lut2[r, :, 1] = (freq[s].astype(np.uint32) << 16) | start.astype(
            np.uint32
        )
    eo = np.stack(
        [(lens - 2).astype(np.int32), offs.astype(np.int32)], axis=1
    )
    return DeviceCoderTables(
        lut2=jnp.asarray(lut2.reshape(-1, 2)),
        fc=jnp.asarray(fc),
        esc_sym=jnp.asarray((lens - 2).astype(np.int32)),
        offset=jnp.asarray(offs.astype(np.int32)),
        eo=jnp.asarray(eo),
    )


# --------------------------------------------------------------------------
# Decode
# --------------------------------------------------------------------------
def init_lanes(words: jax.Array, off: jax.Array):
    """Per-lane decoder state from a flat word array.

    words: int32 (W,) 16-bit words; off: int32 (lanes,) per-lane start.
    The first two words of each lane are the flushed final encoder state
    (hi, lo)."""
    w0 = words[off].astype(jnp.uint32)
    w1 = words[off + 1].astype(jnp.uint32)
    state = (w0 << 16) | w1
    ptr = jnp.full(off.shape, 2, jnp.int32)
    return state, ptr


def decode_lanes(
    words: jax.Array,
    off: jax.Array,
    rows_T: jax.Array,
    tables: DeviceCoderTables,
    state: jax.Array | None = None,
    ptr: jax.Array | None = None,
):
    """Decode ``rows_T.shape[0]`` symbols from each of ``lanes`` streams.

    rows_T: int32 (T, lanes) distribution-row index per step per lane.
    Returns (values int32 (T, lanes), state, ptr); pass state/ptr back in
    to continue the same streams (the ChARM slice loop does). Escaped
    positions decode to :data:`ESC_VAL` — apply :func:`fix_escapes` with
    the wire's side-channel pairs to restore the raw values.
    """
    if state is None:
        state, ptr = init_lanes(words, off)
    lut2 = tables.lut2

    def step(carry, r):
        state, ptr = carry
        peek = state & _MASK16
        e = lut2[r * (1 << PRECISION) + peek.astype(jnp.int32)]
        val = (e[:, 0].astype(jnp.int32) ^ 0x8000) - 0x8000  # sign-extend
        fs = e[:, 1] >> 16
        start = e[:, 1] & _MASK16
        state = fs * (state >> 16) + start
        need = state < _L
        w = words[off + ptr].astype(jnp.uint32)
        state = jnp.where(need, (state << 16) | w, state)
        ptr = ptr + need.astype(jnp.int32)
        return (state, ptr), val

    (state, ptr), values = jax.lax.scan(step, (state, ptr), rows_T)
    return values, state, ptr


def fix_escapes(values_T: jax.Array, dest: jax.Array, raw: jax.Array):
    """Overwrite escaped positions with side-channel raw values.

    values_T: (T, lanes) from :func:`decode_lanes`; dest: int32 (E,)
    flat step-major indexes (t * lanes + lane), padded entries >= T*lanes
    are dropped; raw: int32 (E,).
    """
    T, lanes = values_T.shape
    flat = values_T.reshape(-1).at[dest].set(raw, mode="drop")
    return flat.reshape(T, lanes)


# --------------------------------------------------------------------------
# Encode
# --------------------------------------------------------------------------
def encode_lanes(
    values_T: jax.Array,
    rows_T: jax.Array,
    tables: DeviceCoderTables,
):
    """Encode (T, lanes) values into per-lane rANS streams.

    Returns ``(buf, lengths, dest, raw, n_esc)``:
      buf     int32 (lanes, T + 2) — each lane's words already in DECODE
              order (flushed state hi, lo, then emissions reversed);
      lengths int32 (lanes,) words used per lane;
      dest    int32 (T * lanes,) flat step-major positions of escapes,
              compacted to the front, padded with T*lanes;
      raw     int32 (T * lanes,) matching raw values;
      n_esc   int32 scalar — number of valid (dest, raw) pairs.

    The side-channel buffers are full-size on device (worst case all
    symbols escape); callers slice the fetch to ``n_esc``.
    """
    T, lanes = values_T.shape
    maxw = T + 2
    fc_flat = tables.fc.reshape(-1)
    n_sym = tables.fc.shape[1]
    lane_ids = jnp.arange(lanes)

    # escapes + per-symbol (freq, low) resolved before the scan: these are
    # bulk (T, lanes) gathers, not per-step work. (esc_sym, offset) come
    # from ONE pair gather — gather count is what the hardware charges for
    eo = tables.eo[rows_T]
    u = values_T - eo[..., 1]
    es = eo[..., 0]
    esc = (u < 0) | (u >= es)
    s = jnp.where(esc, es, u)
    fcv = fc_flat[rows_T * n_sym + s]
    f = fcv >> 16
    c = fcv & _MASK16

    def step(state, xs):
        fs, cs = xs
        emit = state >= (fs << 16)
        w = (state & _MASK16).astype(jnp.int32)
        state = jnp.where(emit, state >> 16, state)
        q = state // fs
        state = (q << 16) + (state - q * fs) + cs
        return state, (w, emit)

    state = jnp.full((lanes,), np.uint32(_L), jnp.uint32)
    # encoder runs over symbols in reverse
    state, (ws, emits) = jax.lax.scan(step, state, (f[::-1], c[::-1]))

    # compaction: emission k (0 = first emitted) of a lane with K total
    # emissions lands at decode position 2 + (K - 1 - k)
    em32 = emits.astype(jnp.int32)
    pos = jnp.cumsum(em32, axis=0) - em32  # exclusive, per lane
    K = pos[-1] + em32[-1]
    lengths = K + 2
    dest_w = jnp.where(
        emits,
        lane_ids[None, :] * maxw + 2 + (K[None, :] - 1 - pos),
        lanes * maxw,
    )
    buf = jnp.zeros((lanes * maxw,), jnp.int32)
    buf = buf.at[dest_w.reshape(-1)].set(ws.reshape(-1), mode="drop")
    # flushed final 32-bit state: decode order hi, lo
    buf = buf.reshape(lanes, maxw)
    buf = buf.at[lane_ids, 0].set((state >> 16).astype(jnp.int32))
    buf = buf.at[lane_ids, 1].set((state & _MASK16).astype(jnp.int32))

    # escape side channel, step-major compaction (two flat scatters: a
    # single (N, 2) row scatter measured 2.5x SLOWER than these on v5e).
    # The whole compaction runs under a cond — full-grid scatters cost
    # ~0.2 s at this shape even with zero escapes, and trained-statistics
    # streams rarely escape at all.
    esc_flat = esc.reshape(-1)
    n_total = T * lanes
    n_esc = esc_flat.sum(dtype=jnp.int32)

    def compact(_):
        e32 = esc_flat.astype(jnp.int32)
        rank = jnp.cumsum(e32) - e32
        slot = jnp.where(esc_flat, rank, n_total)
        dest = jnp.full((n_total,), n_total, jnp.int32)
        dest = dest.at[slot].set(
            jnp.arange(n_total, dtype=jnp.int32), mode="drop"
        )
        raw = jnp.zeros((n_total,), jnp.int32)
        raw = raw.at[slot].set(values_T.reshape(-1), mode="drop")
        return dest, raw

    def empty(_):
        return (
            jnp.full((n_total,), n_total, jnp.int32),
            jnp.zeros((n_total,), jnp.int32),
        )

    dest, raw = jax.lax.cond(n_esc > 0, compact, empty, None)
    return buf, lengths, dest, raw, n_esc


# --------------------------------------------------------------------------
# Host-side wire assembly
# --------------------------------------------------------------------------
def assemble_streams(buf: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """(lanes, maxw) decode-order buffers -> flat uint16 word array
    (lane 0's words, then lane 1's, ...). Vectorized numpy (one boolean
    take)."""
    buf = np.asarray(buf)
    lengths = np.asarray(lengths, np.int64)
    lanes, maxw = buf.shape
    cols = np.arange(maxw, dtype=np.int64)[None, :]
    return buf[cols < lengths[:, None]].astype(np.uint16)


def lane_offsets(lengths: np.ndarray) -> np.ndarray:
    """Per-lane start offsets into the flat word array."""
    lengths = np.asarray(lengths, np.int64)
    off = np.zeros(lengths.shape[0], np.int64)
    np.cumsum(lengths[:-1], out=off[1:])
    return off.astype(np.int32)


# --------------------------------------------------------------------------
# Pure-numpy mirror (test oracle)
# --------------------------------------------------------------------------
def _np_encode_lane(values, rows, t_host: EntropyTables):
    """Single-lane scalar-python encoder mirroring encode_lanes exactly.

    Returns (words in decode order, escapes as [(step, raw), ...])."""
    cdf = np.asarray(t_host.quantized_cdf, np.int64)
    lens = np.asarray(t_host.cdf_length, np.int64)
    offs = np.asarray(t_host.offset, np.int64)
    state = 1 << 16
    out = []  # emission order
    escapes = []
    for t, (v, r) in enumerate(zip(values, rows)):
        v, r = int(v), int(r)
        es = int(lens[r]) - 2
        if v - int(offs[r]) < 0 or v - int(offs[r]) >= es:
            escapes.append((t, v))
    for v, r in zip(reversed(values), reversed(rows)):
        v, r = int(v), int(r)
        es = int(lens[r]) - 2
        u = v - int(offs[r])
        s = es if (u < 0 or u >= es) else u
        c = int(cdf[r, s])
        f = int(cdf[r, s + 1]) - c
        if state >= (f << 16):
            out.append(state & 0xFFFF)
            state >>= 16
        state = ((state // f) << 16) + (state % f) + c
    words = [state >> 16, state & 0xFFFF] + out[::-1]
    return np.asarray(words, np.uint16), escapes


def np_encode(values_T, rows_T, t_host: EntropyTables):
    """(T, lanes) -> (flat words uint16, lengths, dest, raw) — layout
    identical to ``assemble_streams(encode_lanes(...))`` plus the
    compacted step-major escape side channel."""
    vT = np.asarray(values_T)
    rT = np.asarray(rows_T)
    T, lanes = vT.shape
    parts, lengths = [], []
    esc = {}
    for l in range(lanes):
        w, e = _np_encode_lane(vT[:, l], rT[:, l], t_host)
        parts.append(w)
        lengths.append(len(w))
        for t, v in e:
            esc[t * lanes + l] = v
    dest = np.asarray(sorted(esc), np.int32)
    raw = np.asarray([esc[d] for d in sorted(esc)], np.int32)
    return (
        np.concatenate(parts) if parts else np.zeros(0, np.uint16),
        np.asarray(lengths, np.int32),
        dest,
        raw,
    )
