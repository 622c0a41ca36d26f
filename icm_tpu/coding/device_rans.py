"""On-device (XLA) lane-parallel rANS entropy coder.

Why this exists (the decode RTT problem): the reference decodes the
autoregressive y latent by crossing the Python<->C++ boundary once per
slice (reference ``cnn.py:306-327``: per-slice ``decoder.decode_stream``),
which this framework initially mirrored as a device->host index fetch +
host rANS + host->device symbol upload per slice. On a remote-TPU link
(~40 ms RTT) those 10-24 serial round-trips dominate decode wall-clock
(44.6% index-fetch wait measured by ``tools/profile_decode.py``). This
module moves the entropy decode ONTO the device: the bitstream is uploaded
once, symbols are decoded by vectorized integer ops inside the same device
queue as the context convolutions, and nothing crosses the link until the
final ``x_hat`` fetch.

Coder design (TPU-native, NOT the host wire format):
  - 32-bit rANS state, 16-bit word renormalization, 16-bit coder
    precision. Normalization interval L = 1 << 16, so every decode step
    pulls at most ONE 16-bit word and every encode step emits at most one
    — branch-free ``where`` selects instead of data-dependent loops (XLA
    has no cheap divergent control flow).
  - N parallel lanes: each lane owns an independent rANS stream. Symbols
    that are conditionally independent given the AR context (everything
    inside one ChARM slice) are laid out across lanes and decoded in
    lock-step by one vectorized instruction stream; the serial dimension
    is only the per-lane symbol count.
  - Decode is table-driven: a full (n_dists, 2**16) peek->symbol LUT plus
    a packed (freq << 16 | cdf_low) table make each symbol 3 gathers
    (LUT, freq/low, renorm word) — no search loop.
  - Out-of-range symbols escape to the per-row bypass symbol
    (``cdf_length - 2``, same convention as the host coder /
    reference ``entropy_models.py``) followed by the raw 32-bit value as
    two 16-bit words (fixed-size, unlike the host coder's 4-bit chunked
    bypass — fixed size keeps the vector step shape-static).

The HOST coder (``icm_tpu.coding``) remains the reference-interoperable
format; this wire trades format compatibility for a zero-round-trip
device decode. Streams produced by :func:`encode_lanes` are decoded by
:func:`decode_lanes` bit-exactly (tests/test_device_rans.py).

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


# --------------------------------------------------------------------------
# Tables
# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class DeviceCoderTables:
    """Device-resident coding tables built from host :class:`EntropyTables`.

    ``fc[r, s] = freq << 16 | cdf_low`` for coded symbol s of row r
    (freq < 2**16 always: ``pmf_to_quantized_cdf`` gives every interval
    >= 1 and rows have >= 2 intervals). ``lut[r, peek]`` inverts the CDF.
    """

    fc: jax.Array  # uint32 (n, max_sym + 1)
    lut: jax.Array  # int16  (n, 1 << 16): peek -> symbol
    esc_sym: jax.Array  # int32 (n,) = cdf_length - 2 (bypass symbol)
    offset: jax.Array  # int32 (n,)

    @property
    def num_rows(self) -> int:
        return int(self.fc.shape[0])


def build_device_tables(t: EntropyTables) -> DeviceCoderTables:
    """Host-side table build (numpy), uploaded once."""
    cdf = np.asarray(t.quantized_cdf, np.int64)
    lens = np.asarray(t.cdf_length, np.int64)
    n = cdf.shape[0]
    max_sym = int(lens.max()) - 1  # coded symbols 0 .. cdf_length-2
    fc = np.zeros((n, max_sym), np.uint32)
    lut = np.zeros((n, 1 << PRECISION), np.int16)
    peeks = np.arange(1 << PRECISION, dtype=np.int64)
    for r in range(n):
        L = int(lens[r])
        row = cdf[r, :L]
        freq = row[1:] - row[:-1]
        fc[r, : L - 1] = (freq.astype(np.uint32) << 16) | row[:-1].astype(
            np.uint32
        )
        s = np.searchsorted(row, peeks, side="right") - 1
        lut[r] = np.clip(s, 0, L - 2).astype(np.int16)
    return DeviceCoderTables(
        fc=jnp.asarray(fc),
        lut=jnp.asarray(lut),
        esc_sym=jnp.asarray((lens - 2).astype(np.int32)),
        offset=jnp.asarray(np.asarray(t.offset, np.int32)),
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


def _pull(state, ptr, words, off, need):
    """Branch-free renorm: pull one word where ``need``."""
    w = words[off + ptr].astype(jnp.uint32)
    state = jnp.where(need, (state << 16) | w, state)
    ptr = ptr + need.astype(jnp.int32)
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
    to continue the same streams (the ChARM slice loop does).
    """
    if state is None:
        state, ptr = init_lanes(words, off)
    fc_flat = tables.fc.reshape(-1)
    lut_flat = tables.lut.reshape(-1)
    n_sym = tables.fc.shape[1]

    def step(carry, r):
        state, ptr = carry
        peek = state & _MASK16
        s = lut_flat[r * (1 << PRECISION) + peek.astype(jnp.int32)].astype(
            jnp.int32
        )
        fcv = fc_flat[r * n_sym + s]
        f = fcv >> 16
        c = fcv & _MASK16
        state = f * (state >> 16) + peek - c
        state, ptr = _pull(state, ptr, words, off, state < _L)

        esc = s == tables.esc_sym[r]
        # raw 32-bit value as two 16-bit words (hi then lo), lanes without
        # an escape keep their state via selects
        hi = state & _MASK16
        st2 = state >> 16
        st2, ptr2 = _pull(st2, ptr, words, off, st2 < _L)
        lo = st2 & _MASK16
        st3 = st2 >> 16
        st3, ptr3 = _pull(st3, ptr2, words, off, st3 < _L)
        state = jnp.where(esc, st3, state)
        ptr = jnp.where(esc, ptr3, ptr)

        raw = ((hi.astype(jnp.int32) << 16) | lo.astype(jnp.int32))
        value = jnp.where(esc, raw, s + tables.offset[r])
        return (state, ptr), value

    (state, ptr), values = jax.lax.scan(step, (state, ptr), rows_T)
    return values, state, ptr


# --------------------------------------------------------------------------
# Encode
# --------------------------------------------------------------------------
def encode_lanes(
    values_T: jax.Array,
    rows_T: jax.Array,
    tables: DeviceCoderTables,
):
    """Encode (T, lanes) values into per-lane rANS streams.

    Returns (buf int32 (lanes, maxw), lengths int32 (lanes,)): buf rows
    hold each lane's words in EMISSION order (reverse of decode order);
    :func:`assemble_streams` reverses and concatenates them on host.
    maxw = 3*T + 2 is the static worst case (every symbol escaped).
    """
    T, lanes = values_T.shape
    maxw = 3 * T + 2
    fc_flat = tables.fc.reshape(-1)
    n_sym = tables.fc.shape[1]
    lane_ids = jnp.arange(lanes)

    def emit_word(state, pos, buf, emit):
        """Masked scatter of the state's low word (out-of-bounds dest =
        dropped write — cheaper than gather+select on TPU)."""
        dest = jnp.where(emit, pos, maxw)
        buf = buf.at[lane_ids, dest].set(
            (state & _MASK16).astype(jnp.int32), mode="drop"
        )
        pos = pos + emit.astype(jnp.int32)
        state = jnp.where(emit, state >> 16, state)
        return state, pos, buf

    def push(state, pos, buf, bits, mask):
        """Renorm-then-shift-in 16 raw ``bits`` where ``mask``."""
        state, pos, buf = emit_word(state, pos, buf, mask & (state >= _L))
        state = jnp.where(mask, (state << 16) | bits, state)
        return state, pos, buf

    def step(carry, xs):
        state, pos, buf = carry
        v, r = xs
        u = v - tables.offset[r]
        es = tables.esc_sym[r]
        esc = (u < 0) | (u >= es)
        s = jnp.where(esc, es, u)
        fcv = fc_flat[r * n_sym + s]
        f = fcv >> 16
        c = fcv & _MASK16
        # decode order within a step is: symbol, raw-hi, raw-lo — LIFO, so
        # push raw-lo first, then raw-hi, then the symbol
        lo = (v & 0xFFFF).astype(jnp.uint32)
        hi = ((v >> 16) & 0xFFFF).astype(jnp.uint32)
        state, pos, buf = push(state, pos, buf, lo, esc)
        state, pos, buf = push(state, pos, buf, hi, esc)
        # symbol: renorm against freq-scaled bound, then advance
        state, pos, buf = emit_word(state, pos, buf, state >= (f << 16))
        q = state // f
        state = (q << 16) + (state - q * f) + c
        return (state, pos, buf), ()

    state = jnp.full((lanes,), np.uint32(_L), jnp.uint32)
    pos = jnp.zeros((lanes,), jnp.int32)
    buf = jnp.zeros((lanes, maxw), jnp.int32)
    # encoder runs over symbols in reverse
    (state, pos, buf), _ = jax.lax.scan(
        step, (state, pos, buf), (values_T[::-1], rows_T[::-1])
    )
    # flush final 32-bit state: lo then hi (reversed read gives hi first)
    buf = buf.at[lane_ids, pos].set((state & _MASK16).astype(jnp.int32))
    buf = buf.at[lane_ids, pos + 1].set((state >> 16).astype(jnp.int32))
    lengths = pos + 2
    return buf, lengths


# --------------------------------------------------------------------------
# Host-side wire assembly
# --------------------------------------------------------------------------
def assemble_streams(buf: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """(lanes, maxw) emission-order buffers -> flat uint16 word array in
    decode order (lane 0's reversed words, then lane 1's, ...). Vectorized
    numpy (one boolean take)."""
    buf = np.asarray(buf)
    lengths = np.asarray(lengths, np.int64)
    lanes, maxw = buf.shape
    rev = buf[:, ::-1]
    cols = np.arange(maxw, dtype=np.int64)[None, :]
    mask = cols >= (maxw - lengths[:, None])
    return rev[mask].astype(np.uint16)


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
    """Single-lane scalar-python encoder mirroring encode_lanes exactly."""
    cdf = np.asarray(t_host.quantized_cdf, np.int64)
    lens = np.asarray(t_host.cdf_length, np.int64)
    offs = np.asarray(t_host.offset, np.int64)
    state = 1 << 16
    out = []

    def push_raw(state, bits):
        if state >= (1 << 16):
            out.append(state & 0xFFFF)
            state >>= 16
        return (state << 16) | bits

    for v, r in zip(reversed(values), reversed(rows)):
        v, r = int(v), int(r)
        es = int(lens[r]) - 2
        u = v - int(offs[r])
        esc = u < 0 or u >= es
        s = es if esc else u
        c = int(cdf[r, s])
        f = int(cdf[r, s + 1]) - c
        if esc:
            state = push_raw(state, v & 0xFFFF)
            state = push_raw(state, (v >> 16) & 0xFFFF)
        if state >= (f << 16):
            out.append(state & 0xFFFF)
            state >>= 16
        state = ((state // f) << 16) + (state % f) + c
    out.append(state & 0xFFFF)
    out.append((state >> 16) & 0xFFFF)
    return np.asarray(out, np.uint16)


def np_encode(values_T, rows_T, t_host: EntropyTables):
    """(T, lanes) -> (flat words uint16, lengths) — decode-order layout
    identical to assemble_streams(encode_lanes(...))."""
    T, lanes = np.asarray(values_T).shape
    parts, lengths = [], []
    for l in range(lanes):
        w = _np_encode_lane(
            np.asarray(values_T)[:, l], np.asarray(rows_T)[:, l], t_host
        )
        parts.append(w[::-1])  # decode order
        lengths.append(len(w))
    return np.concatenate(parts), np.asarray(lengths, np.int32)
