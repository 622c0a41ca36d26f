"""Pure-Python rANS coder (reference implementation for the C++ fast path).

A 64-bit-state range-asymmetric-numeral-system coder with 32-bit word
renormalization, 16-bit coder precision, and a 4-bit bypass escape for
out-of-range symbols — the same coding scheme as the reference's prebuilt
``compressai.ans`` module (reference: ``compressai/ans.*.so``; build recipe
``setup.py:52-69``; rANS normalization interval L = 1<<31 per
``third_party/ryg_rans/rans64.h:59``). Implemented from the standard rANS
algorithm, not translated from the (unvendored) C++ sources; streams are
self-consistent (encode → decode identity) and the C++ module in
``icm_tpu/coding/cpp`` must produce byte-identical streams to this file.

API parity with the reference coder:
  encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes
  decode_with_indexes(stream, indexes, cdfs, cdf_lengths, offsets) -> list
  BufferedRansEncoder().encode_with_indexes(...); .flush() -> bytes
  RansDecoder().set_stream(s); .decode_stream(indexes, ...) -> list

Stream layout (this framework's own, stable format):
  uint32 little-endian words; words[0:2] = final encoder state (hi, lo),
  then renormalization words in decode order.
"""

from __future__ import annotations

import struct
from typing import List, Sequence

import numpy as np

PRECISION = 16
BYPASS_PRECISION = 4
MAX_BYPASS = (1 << BYPASS_PRECISION) - 1
RANS_L = 1 << 31
_MASK32 = 0xFFFFFFFF


def _build_ops(symbols, indexes, cdfs, cdf_lengths, offsets):
    """Forward-order list of coding ops: ('s', start, freq) | ('b', val)."""
    ops = []
    for s, idx in zip(symbols, indexes):
        idx = int(idx)
        cdf = cdfs[idx]
        max_value = int(cdf_lengths[idx]) - 2
        value = int(s) - int(offsets[idx])
        raw_val = 0
        if value < 0:
            raw_val = -2 * value - 1
            value = max_value
        elif value >= max_value:
            raw_val = 2 * (value - max_value)
            value = max_value
        start = int(cdf[value])
        freq = int(cdf[value + 1]) - start
        ops.append(("s", start, freq))
        if value == max_value:
            # bypass: chunk count (unary in base MAX_BYPASS), then 4-bit chunks
            n_bypass = 0
            while (raw_val >> (n_bypass * BYPASS_PRECISION)) != 0:
                n_bypass += 1
            val = n_bypass
            while val >= MAX_BYPASS:
                ops.append(("b", MAX_BYPASS))
                val -= MAX_BYPASS
            ops.append(("b", val))
            for j in range(n_bypass):
                ops.append(("b", (raw_val >> (j * BYPASS_PRECISION)) & MAX_BYPASS))
    return ops


def _encode_ops(ops) -> bytes:
    state = RANS_L
    words: List[int] = []  # emission order (reverse of decode order)
    for op in reversed(ops):
        if op[0] == "s":
            _, start, freq = op
            x_max = ((RANS_L >> PRECISION) << 32) * freq
            while state >= x_max:
                words.append(state & _MASK32)
                state >>= 32
            state = ((state // freq) << PRECISION) + (state % freq) + start
        else:
            val = op[1]
            x_max = (RANS_L >> BYPASS_PRECISION) << 32
            while state >= x_max:
                words.append(state & _MASK32)
                state >>= 32
            state = (state << BYPASS_PRECISION) | val
    out = [state >> 32, state & _MASK32] + words[::-1]
    return struct.pack("<%dI" % len(out), *out)


def encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes:
    return _encode_ops(_build_ops(symbols, indexes, cdfs, cdf_lengths, offsets))


class BufferedRansEncoder:
    """Accumulates symbols across calls; one rANS flush at the end
    (parity: reference ``BufferedRansEncoder`` semantics)."""

    def __init__(self):
        self._ops = []

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths, offsets):
        self._ops.extend(_build_ops(symbols, indexes, cdfs, cdf_lengths, offsets))

    def flush(self) -> bytes:
        out = _encode_ops(self._ops)
        self._ops = []
        return out


class RansEncoder:
    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths, offsets):
        return encode_with_indexes(symbols, indexes, cdfs, cdf_lengths, offsets)


class RansDecoder:
    def __init__(self):
        self._words = None
        self._pos = 0
        self._state = 0

    def set_stream(self, stream: bytes):
        n = len(stream) // 4
        self._words = struct.unpack("<%dI" % n, stream[: 4 * n])
        self._state = (self._words[0] << 32) | self._words[1]
        self._pos = 2

    def _renorm(self):
        while self._state < RANS_L and self._pos < len(self._words):
            self._state = (self._state << 32) | self._words[self._pos]
            self._pos += 1

    def _get_bits(self, nbits: int) -> int:
        val = self._state & ((1 << nbits) - 1)
        self._state >>= nbits
        self._renorm()
        return val

    def decode_stream(self, indexes, cdfs, cdf_lengths, offsets) -> List[int]:
        out = []
        mask = (1 << PRECISION) - 1
        for idx in indexes:
            cdf = cdfs[idx]
            L = cdf_lengths[idx]
            max_value = L - 2
            cum = self._state & mask
            # largest s with cdf[s] <= cum
            s = 0
            lo, hi = 0, L - 1
            while lo + 1 < hi:
                mid = (lo + hi) // 2
                if cdf[mid] <= cum:
                    lo = mid
                else:
                    hi = mid
            s = lo
            start = int(cdf[s])
            freq = int(cdf[s + 1]) - start
            self._state = freq * (self._state >> PRECISION) + cum - start
            self._renorm()
            value = s
            if value == max_value:
                val = self._get_bits(BYPASS_PRECISION)
                n_bypass = val
                while val == MAX_BYPASS:
                    val = self._get_bits(BYPASS_PRECISION)
                    n_bypass += val
                raw_val = 0
                for j in range(n_bypass):
                    raw_val |= self._get_bits(BYPASS_PRECISION) << (
                        j * BYPASS_PRECISION
                    )
                value = raw_val >> 1
                if raw_val & 1:
                    value = -value - 1
                else:
                    value += max_value
            out.append(value + int(offsets[idx]))
        return out

    def decode_with_indexes(self, stream, indexes, cdfs, cdf_lengths, offsets):
        self.set_stream(stream)
        return self.decode_stream(indexes, cdfs, cdf_lengths, offsets)


def decode_with_indexes(stream, indexes, cdfs, cdf_lengths, offsets):
    return RansDecoder().decode_with_indexes(
        stream, indexes, cdfs, cdf_lengths, offsets
    )
