"""Entropy coding: native rANS with a pure-Python fallback.

Public API (parity with the reference ``compressai.ans`` surface,
reference: SURVEY.md §1 L0):
  - ``RansEncoder().encode_with_indexes(symbols, indexes, cdfs,
    cdf_lengths, offsets) -> bytes``
  - ``BufferedRansEncoder()`` with ``.encode_with_indexes(...)`` +
    ``.flush() -> bytes``
  - ``RansDecoder()`` with ``.set_stream(s)``, ``.decode_stream(indexes,
    cdfs, cdf_lengths, offsets)`` and one-shot ``.decode_with_indexes``
  - ``pmf_to_quantized_cdf(pmf, precision) -> list`` (reference ``_CXX``)

Arguments may be Python lists (reference-compatible) or numpy arrays
(zero-copy fast path). CDF tables are passed as a single int32
(n, max_len) array or list-of-lists.

Fast paths beyond the reference:
  - ``encode_batch`` / ``decode_batch``: one stream per batch item,
    threaded in C++ — removes the per-image Python loop of the reference
    (``entropy_models.py:227-238``).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

from . import rans_py

_lib = None
_native_checked = False

# --- selectable coder backend (reference surface: compressai
# set_entropy_coder/get_entropy_coder/available_entropy_coders,
# reference compressai/__init__.py:22-62). Backends:
#   "rans"    - the native C++ rANS (cpp/rans.cpp)
#   "rans-py" - the byte-identical pure-Python model (rans_py.py)
# Streams are interchangeable between the two (tests/test_coding.py).
_entropy_coder = None  # lazy default: "rans" when the native lib loads


def available_entropy_coders() -> List[str]:
    """Names accepted by :func:`set_entropy_coder`."""
    names = []
    if _load_native_raw() is not None:
        names.append("rans")
    names.append("rans-py")
    return names


def set_entropy_coder(name: str):
    """Select the entropy-coder backend for all subsequent encode/decode
    calls (codec drivers resolve the backend per call, so this takes
    effect immediately)."""
    avail = available_entropy_coders()
    if name not in avail:
        raise ValueError(
            f'Invalid entropy coder "{name}", choose from ({", ".join(avail)})'
        )
    global _entropy_coder
    _entropy_coder = name


def get_entropy_coder() -> str:
    global _entropy_coder
    if _entropy_coder is None:
        _entropy_coder = "rans" if _load_native_raw() is not None else "rans-py"
    return _entropy_coder


def _load_native():
    """Active-backend native handle: None when "rans-py" is selected (the
    pure-Python fallbacks in every API below then take over)."""
    if get_entropy_coder() == "rans-py":
        return None
    return _load_native_raw()


def _load_native_raw():
    global _lib, _native_checked
    if _native_checked:
        return _lib
    _native_checked = True
    if os.environ.get("ICM_TPU_DISABLE_NATIVE"):
        return None
    try:
        from .cpp.build import build

        path = build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u8pp = ctypes.POINTER(u8p)
    f32p = ctypes.POINTER(ctypes.c_float)

    lib.rans_encode_with_indexes.restype = ctypes.c_int64
    lib.rans_encode_with_indexes.argtypes = [
        i32p, i32p, ctypes.c_int64, i32p, ctypes.c_int64, i32p, i32p, u8pp,
    ]
    lib.rans_free_buffer.argtypes = [u8p]
    lib.rans_decode_with_indexes.restype = ctypes.c_int64
    lib.rans_decode_with_indexes.argtypes = [
        u8p, ctypes.c_int64, i32p, ctypes.c_int64, i32p, ctypes.c_int64,
        i32p, i32p, i32p,
    ]
    lib.rans_enc_new.restype = ctypes.c_void_p
    lib.rans_enc_put.argtypes = [
        ctypes.c_void_p, i32p, i32p, ctypes.c_int64, i32p, ctypes.c_int64,
        i32p, i32p,
    ]
    lib.rans_enc_flush.restype = ctypes.c_int64
    lib.rans_enc_flush.argtypes = [ctypes.c_void_p, u8pp]
    lib.rans_enc_free.argtypes = [ctypes.c_void_p]
    lib.rans_dec_new.restype = ctypes.c_void_p
    lib.rans_dec_new.argtypes = [u8p, ctypes.c_int64]
    lib.rans_dec_decode.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int64, i32p, ctypes.c_int64, i32p,
        i32p, i32p,
    ]
    lib.rans_dec_free.argtypes = [ctypes.c_void_p]
    lib.rans_encode_batch.restype = ctypes.c_int64
    lib.rans_encode_batch.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int64, i32p, ctypes.c_int64,
        i32p, i32p, u8pp, i64p, ctypes.c_int,
    ]
    lib.rans_decode_batch.argtypes = [
        u8p, i64p, i64p, i32p, ctypes.c_int64, ctypes.c_int64, i32p,
        ctypes.c_int64, i32p, i32p, i32p, ctypes.c_int,
    ]
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.rans_dec_batch_new.restype = ctypes.c_void_p
    lib.rans_dec_batch_new.argtypes = [u8p, i64p, i64p, ctypes.c_int64]
    lib.rans_dec_batch_decode.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int64, ctypes.c_int64, i32p,
        ctypes.c_int64, i32p, i32p, i32p, ctypes.c_int,
    ]
    lib.rans_dec_batch_decode_lut.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int64, ctypes.c_int64, i32p,
        ctypes.c_int64, i32p, i32p, u16p, i32p, ctypes.c_int,
    ]
    lib.rans_dec_batch_free.argtypes = [ctypes.c_void_p]
    lib.pmf_to_quantized_cdf.restype = ctypes.c_int
    lib.pmf_to_quantized_cdf.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int, i32p,
    ]
    lib.pmf_to_quantized_cdf_rows.restype = ctypes.c_int
    lib.pmf_to_quantized_cdf_rows.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, f32p, i32p, ctypes.c_int,
        i32p, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_native() is not None


def _as_i32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x).reshape(-1), dtype=np.int32)


def _cdf_matrix(cdfs) -> np.ndarray:
    if isinstance(cdfs, np.ndarray):
        return np.ascontiguousarray(cdfs, dtype=np.int32)
    # list-of-lists (reference API): pad to max length
    max_len = max(len(c) for c in cdfs)
    out = np.zeros((len(cdfs), max_len), np.int32)
    for i, c in enumerate(cdfs):
        out[i, : len(c)] = c
    return out


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class RansEncoder:
    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths, offsets):
        lib = _load_native()
        if lib is None:
            return rans_py.encode_with_indexes(
                list(np.asarray(symbols).reshape(-1)),
                list(np.asarray(indexes).reshape(-1)),
                [list(c) for c in cdfs] if not isinstance(cdfs, np.ndarray) else cdfs,
                list(np.asarray(cdf_lengths).reshape(-1)),
                list(np.asarray(offsets).reshape(-1)),
            )
        s = _as_i32(symbols)
        i = _as_i32(indexes)
        cdf = _cdf_matrix(cdfs)
        lens = _as_i32(cdf_lengths)
        offs = _as_i32(offsets)
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lib.rans_encode_with_indexes(
            _i32p(s), _i32p(i), s.size, _i32p(cdf), cdf.shape[1], _i32p(lens),
            _i32p(offs), ctypes.byref(out),
        )
        data = ctypes.string_at(out, n)
        lib.rans_free_buffer(out)
        return data


class BufferedRansEncoder:
    def __init__(self):
        self._lib = _load_native()
        if self._lib is not None:
            self._h = self._lib.rans_enc_new()
        else:
            self._py = rans_py.BufferedRansEncoder()

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths, offsets):
        if self._lib is None:
            self._py.encode_with_indexes(
                list(np.asarray(symbols).reshape(-1)),
                list(np.asarray(indexes).reshape(-1)),
                [list(c) for c in cdfs] if not isinstance(cdfs, np.ndarray) else cdfs,
                list(np.asarray(cdf_lengths).reshape(-1)),
                list(np.asarray(offsets).reshape(-1)),
            )
            return
        s = _as_i32(symbols)
        i = _as_i32(indexes)
        cdf = _cdf_matrix(cdfs)
        lens = _as_i32(cdf_lengths)
        offs = _as_i32(offsets)
        self._lib.rans_enc_put(
            self._h, _i32p(s), _i32p(i), s.size, _i32p(cdf), cdf.shape[1],
            _i32p(lens), _i32p(offs),
        )

    def flush(self) -> bytes:
        if self._lib is None:
            return self._py.flush()
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = self._lib.rans_enc_flush(self._h, ctypes.byref(out))
        data = ctypes.string_at(out, n)
        self._lib.rans_free_buffer(out)
        return data

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.rans_enc_free(self._h)
            self._h = None


class RansDecoder:
    def __init__(self):
        self._lib = _load_native()
        self._h = None
        if self._lib is None:
            self._py = rans_py.RansDecoder()

    def set_stream(self, stream: bytes):
        if self._lib is None:
            self._py.set_stream(stream)
            return
        if self._h:
            self._lib.rans_dec_free(self._h)
        buf = (ctypes.c_uint8 * len(stream)).from_buffer_copy(stream)
        self._h = self._lib.rans_dec_new(buf, len(stream))

    def decode_stream(self, indexes, cdfs, cdf_lengths, offsets):
        if self._lib is None:
            return self._py.decode_stream(
                list(np.asarray(indexes).reshape(-1)),
                [list(c) for c in cdfs] if not isinstance(cdfs, np.ndarray) else cdfs,
                list(np.asarray(cdf_lengths).reshape(-1)),
                list(np.asarray(offsets).reshape(-1)),
            )
        i = _as_i32(indexes)
        cdf = _cdf_matrix(cdfs)
        lens = _as_i32(cdf_lengths)
        offs = _as_i32(offsets)
        out = np.empty(i.size, np.int32)
        self._lib.rans_dec_decode(
            self._h, _i32p(i), i.size, _i32p(cdf), cdf.shape[1], _i32p(lens),
            _i32p(offs), _i32p(out),
        )
        return out

    def decode_with_indexes(self, stream, indexes, cdfs, cdf_lengths, offsets):
        self.set_stream(stream)
        return self.decode_stream(indexes, cdfs, cdf_lengths, offsets)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.rans_dec_free(self._h)
            self._h = None


class BatchRansDecoder:
    """Stateful decoder over B parallel streams: each ``decode_stream``
    call decodes (B, N) indexes -> (B, N) symbols in one threaded native
    call (the AR slice-loop fast path). Falls back to per-stream Python
    decoders without the native lib."""

    def __init__(self, streams: Sequence[bytes]):
        from .wire import reject_framework_wire

        for s in streams:
            reject_framework_wire(s, "host rANS")
        self._lib = _load_native()
        self._n = len(streams)
        if self._lib is None:
            self._decs = [rans_py.RansDecoder() for _ in streams]
            for d, s in zip(self._decs, streams):
                d.set_stream(s)
            self._h = None
            return
        blob = b"".join(streams)
        self._arena = (ctypes.c_uint8 * len(blob)).from_buffer_copy(blob)
        sizes = np.array([len(s) for s in streams], np.int64)
        offs = np.zeros(self._n, np.int64)
        np.cumsum(sizes[:-1], out=offs[1:])
        self._sizes, self._offs = sizes, offs  # keep alive
        i64p = ctypes.POINTER(ctypes.c_int64)
        self._h = self._lib.rans_dec_batch_new(
            self._arena, offs.ctypes.data_as(i64p),
            sizes.ctypes.data_as(i64p), self._n,
        )

    def decode_stream(
        self, indexes, cdfs, cdf_lengths, offsets, lut=None
    ) -> np.ndarray:
        """indexes (B, ...) -> int32 symbols of the same shape. ``lut``:
        optional (n_dists, 2**16) uint16 cum->symbol table for O(1)
        lookups (see EntropyTables.symbol_lut)."""
        idx = np.ascontiguousarray(indexes, np.int32)
        shape = idx.shape
        assert shape[0] == self._n
        flat = idx.reshape(self._n, -1)
        if self._h is None:
            out = np.stack(
                [
                    np.asarray(
                        self._decs[b].decode_stream(
                            list(flat[b]),
                            [list(c) for c in cdfs]
                            if not isinstance(cdfs, np.ndarray) else cdfs,
                            list(np.asarray(cdf_lengths)),
                            list(np.asarray(offsets)),
                        )
                    )
                    for b in range(self._n)
                ]
            ).astype(np.int32)
            return out.reshape(shape)
        cdf = _cdf_matrix(cdfs)
        lens = _as_i32(cdf_lengths)
        offs = _as_i32(offsets)
        out = np.empty_like(flat)
        if lut is not None:
            lut = np.ascontiguousarray(lut, np.uint16)
            self._lib.rans_dec_batch_decode_lut(
                self._h, _i32p(flat), self._n, flat.shape[1], _i32p(cdf),
                cdf.shape[1], _i32p(lens), _i32p(offs),
                lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                _i32p(out), os.cpu_count() or 1,
            )
        else:
            self._lib.rans_dec_batch_decode(
                self._h, _i32p(flat), self._n, flat.shape[1], _i32p(cdf),
                cdf.shape[1], _i32p(lens), _i32p(offs), _i32p(out),
                os.cpu_count() or 1,
            )
        return out.reshape(shape)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.rans_dec_batch_free(self._h)
            self._h = None


def encode_batch(
    symbols: np.ndarray,
    indexes: np.ndarray,
    cdfs,
    cdf_lengths,
    offsets,
    num_threads: int = 0,
) -> List[bytes]:
    """Encode a (B, N) symbol/index batch into B independent streams."""
    symbols = np.ascontiguousarray(symbols, np.int32)
    indexes = np.ascontiguousarray(indexes, np.int32)
    B, N = symbols.shape
    lib = _load_native()
    if lib is None:
        return [
            rans_py.encode_with_indexes(
                list(symbols[b]), list(indexes[b]),
                [list(c) for c in cdfs] if not isinstance(cdfs, np.ndarray) else cdfs,
                list(np.asarray(cdf_lengths)), list(np.asarray(offsets)),
            )
            for b in range(B)
        ]
    cdf = _cdf_matrix(cdfs)
    lens = _as_i32(cdf_lengths)
    offs = _as_i32(offsets)
    out = ctypes.POINTER(ctypes.c_uint8)()
    sizes = np.zeros(B, np.int64)
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    lib.rans_encode_batch(
        _i32p(symbols), _i32p(indexes), B, N, _i32p(cdf), cdf.shape[1],
        _i32p(lens), _i32p(offs), ctypes.byref(out),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), num_threads,
    )
    total = int(sizes.sum())
    blob = ctypes.string_at(out, total)
    lib.rans_free_buffer(out)
    streams, off = [], 0
    for b in range(B):
        streams.append(blob[off : off + int(sizes[b])])
        off += int(sizes[b])
    return streams


def decode_batch(
    streams: Sequence[bytes],
    indexes: np.ndarray,
    cdfs,
    cdf_lengths,
    offsets,
    num_threads: int = 0,
) -> np.ndarray:
    """Decode B independent streams with (B, N) indexes -> (B, N) symbols."""
    from .wire import reject_framework_wire

    for s in streams:
        reject_framework_wire(s, "host rANS")
    indexes = np.ascontiguousarray(indexes, np.int32)
    B, N = indexes.shape
    lib = _load_native()
    if lib is None:
        out = np.empty((B, N), np.int32)
        for b in range(B):
            out[b] = rans_py.decode_with_indexes(
                streams[b], list(indexes[b]),
                [list(c) for c in cdfs] if not isinstance(cdfs, np.ndarray) else cdfs,
                list(np.asarray(cdf_lengths)), list(np.asarray(offsets)),
            )
        return out
    blob = b"".join(streams)
    arena = (ctypes.c_uint8 * len(blob)).from_buffer_copy(blob)
    sizes = np.array([len(s) for s in streams], np.int64)
    offsets_arr = np.zeros(B, np.int64)
    np.cumsum(sizes[:-1], out=offsets_arr[1:])
    cdf = _cdf_matrix(cdfs)
    lens = _as_i32(cdf_lengths)
    offs = _as_i32(offsets)
    out = np.empty((B, N), np.int32)
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.rans_decode_batch(
        arena, offsets_arr.ctypes.data_as(i64p), sizes.ctypes.data_as(i64p),
        _i32p(indexes), B, N, _i32p(cdf), cdf.shape[1], _i32p(lens),
        _i32p(offs), _i32p(out), num_threads,
    )
    return out


def pmf_to_quantized_cdf(pmf, precision: int = 16):
    """Single-row PMF -> quantized CDF (reference ``_CXX`` parity)."""
    lib = _load_native()
    pmf = np.ascontiguousarray(pmf, np.float32)
    if lib is None:
        from ..entropy.base import pmf_to_quantized_cdf_np

        return pmf_to_quantized_cdf_np(pmf, precision)
    out = np.empty(pmf.size + 1, np.int32)
    rc = lib.pmf_to_quantized_cdf(
        pmf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pmf.size,
        precision, _i32p(out),
    )
    if rc != 0:
        raise ValueError(f"Invalid pmf (native rc={rc})")
    return out


def pmf_to_quantized_cdf_rows(
    pmf: np.ndarray,
    tail_mass: np.ndarray,
    pmf_lengths: np.ndarray,
    precision: int = 16,
    num_threads: int = 0,
) -> Optional[np.ndarray]:
    """Batched row CDF build; returns None if native lib is unavailable."""
    lib = _load_native()
    if lib is None:
        return None
    pmf = np.ascontiguousarray(pmf, np.float32)
    tail = np.ascontiguousarray(tail_mass, np.float32)
    lens = _as_i32(pmf_lengths)
    rows, max_len = pmf.shape
    out = np.zeros((rows, max_len + 2), np.int32)
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.pmf_to_quantized_cdf_rows(
        pmf.ctypes.data_as(f32p), rows, max_len,
        tail.ctypes.data_as(f32p), _i32p(lens), precision, _i32p(out),
        num_threads,
    )
    if rc != 0:
        raise ValueError(f"Invalid pmf rows (native rc={rc})")
    return out
