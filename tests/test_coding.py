import numpy as np
import pytest

from icm_tpu.coding import (
    BufferedRansEncoder,
    RansDecoder,
    RansEncoder,
    decode_batch,
    encode_batch,
    native_available,
    pmf_to_quantized_cdf,
)
from icm_tpu.coding import rans_py
from icm_tpu.entropy.base import pmf_to_quantized_cdf_np


def _random_tables(rng, n_dists=4, max_support=12):
    """Random CDF tables in the framework layout."""
    lengths = rng.integers(3, max_support, n_dists).astype(np.int32) + 2
    max_len = int(lengths.max())
    cdfs = np.zeros((n_dists, max_len), np.int32)
    for i in range(n_dists):
        L = int(lengths[i])
        pmf = rng.random(L - 1).astype(np.float32) + 1e-3
        pmf /= pmf.sum()
        row = pmf_to_quantized_cdf_np(pmf, 16)
        cdfs[i, :L] = row
    offsets = rng.integers(-10, 10, n_dists).astype(np.int32)
    return cdfs, lengths, offsets


def _random_symbols(rng, n, cdf_lengths, offsets, indexes, spread=0):
    """Symbols mostly in range, optionally with out-of-range outliers."""
    max_vals = cdf_lengths[indexes] - 2
    base = rng.integers(0, max_vals)
    if spread:
        mask = rng.random(n) < 0.2
        base = np.where(mask, rng.integers(-spread, spread, n), base)
    return (base + offsets[indexes]).astype(np.int32)


@pytest.mark.parametrize("spread", [0, 1000, 10 ** 7])
def test_py_roundtrip(spread):
    rng = np.random.default_rng(0)
    cdfs, lengths, offsets = _random_tables(rng)
    n = 500
    indexes = rng.integers(0, len(lengths), n).astype(np.int32)
    symbols = _random_symbols(rng, n, lengths, offsets, indexes, spread)

    stream = rans_py.encode_with_indexes(
        list(symbols), list(indexes), cdfs, list(lengths), list(offsets)
    )
    decoded = rans_py.decode_with_indexes(
        stream, list(indexes), cdfs, list(lengths), list(offsets)
    )
    np.testing.assert_array_equal(np.asarray(decoded), symbols)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
@pytest.mark.parametrize("spread", [0, 1000, 10 ** 7])
def test_native_bitexact_vs_python(spread):
    rng = np.random.default_rng(1)
    cdfs, lengths, offsets = _random_tables(rng)
    n = 500
    indexes = rng.integers(0, len(lengths), n).astype(np.int32)
    symbols = _random_symbols(rng, n, lengths, offsets, indexes, spread)

    py_stream = rans_py.encode_with_indexes(
        list(symbols), list(indexes), cdfs, list(lengths), list(offsets)
    )
    native_stream = RansEncoder().encode_with_indexes(
        symbols, indexes, cdfs, lengths, offsets
    )
    assert native_stream == py_stream

    out = RansDecoder().decode_with_indexes(
        native_stream, indexes, cdfs, lengths, offsets
    )
    np.testing.assert_array_equal(np.asarray(out), symbols)


def test_buffered_encoder_equals_oneshot():
    rng = np.random.default_rng(2)
    cdfs, lengths, offsets = _random_tables(rng)
    n = 300
    indexes = rng.integers(0, len(lengths), n).astype(np.int32)
    symbols = _random_symbols(rng, n, lengths, offsets, indexes, 50)

    oneshot = RansEncoder().encode_with_indexes(
        symbols, indexes, cdfs, lengths, offsets
    )
    buf = BufferedRansEncoder()
    buf.encode_with_indexes(symbols[:100], indexes[:100], cdfs, lengths, offsets)
    buf.encode_with_indexes(symbols[100:], indexes[100:], cdfs, lengths, offsets)
    assert buf.flush() == oneshot


def test_stateful_decode_stream_chunks():
    """Decoder state carries across decode_stream calls (the AR slice-loop
    pattern, reference cnn.py:303-318)."""
    rng = np.random.default_rng(3)
    cdfs, lengths, offsets = _random_tables(rng)
    n = 200
    indexes = rng.integers(0, len(lengths), n).astype(np.int32)
    symbols = _random_symbols(rng, n, lengths, offsets, indexes, 30)

    stream = RansEncoder().encode_with_indexes(
        symbols, indexes, cdfs, lengths, offsets
    )
    dec = RansDecoder()
    dec.set_stream(stream)
    out1 = dec.decode_stream(indexes[:50], cdfs, lengths, offsets)
    out2 = dec.decode_stream(indexes[50:], cdfs, lengths, offsets)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(out1), np.asarray(out2)]), symbols
    )


def test_batch_encode_decode():
    rng = np.random.default_rng(4)
    cdfs, lengths, offsets = _random_tables(rng)
    B, N = 4, 128
    indexes = rng.integers(0, len(lengths), (B, N)).astype(np.int32)
    symbols = np.stack(
        [
            _random_symbols(rng, N, lengths, offsets, indexes[b], 100)
            for b in range(B)
        ]
    )
    streams = encode_batch(symbols, indexes, cdfs, lengths, offsets)
    assert len(streams) == B
    # each stream matches the single-stream encoder
    for b in range(B):
        ref = RansEncoder().encode_with_indexes(
            symbols[b], indexes[b], cdfs, lengths, offsets
        )
        assert streams[b] == ref
    out = decode_batch(streams, indexes, cdfs, lengths, offsets)
    np.testing.assert_array_equal(out, symbols)


@pytest.mark.skipif(not native_available(), reason="native lib not built")
def test_native_cdf_quantizer_matches_numpy():
    rng = np.random.default_rng(5)
    for _ in range(20):
        L = int(rng.integers(2, 40))
        pmf = rng.random(L).astype(np.float32)
        pmf[rng.random(L) < 0.2] = 0.0
        if pmf.sum() == 0:
            pmf[0] = 1.0
        pmf /= pmf.sum()
        np.testing.assert_array_equal(
            pmf_to_quantized_cdf(pmf, 16), pmf_to_quantized_cdf_np(pmf, 16)
        )


def test_batch_stateful_decoder():
    from icm_tpu.coding import BatchRansDecoder

    rng = np.random.default_rng(6)
    cdfs, lengths, offsets = _random_tables(rng)
    B, N = 3, 120
    indexes = rng.integers(0, len(lengths), (B, 2 * N)).astype(np.int32)
    symbols = np.stack(
        [
            _random_symbols(rng, 2 * N, lengths, offsets, indexes[b], 60)
            for b in range(B)
        ]
    )
    streams = encode_batch(symbols, indexes, cdfs, lengths, offsets)
    dec = BatchRansDecoder(streams)
    out1 = dec.decode_stream(indexes[:, :N], cdfs, lengths, offsets)
    out2 = dec.decode_stream(indexes[:, N:], cdfs, lengths, offsets)
    np.testing.assert_array_equal(
        np.concatenate([out1, out2], axis=1), symbols
    )


def test_batch_decoder_lut_matches():
    from icm_tpu.coding import BatchRansDecoder
    from icm_tpu.entropy import EntropyTables

    rng = np.random.default_rng(7)
    cdfs, lengths, offsets = _random_tables(rng)
    B, N = 2, 400
    indexes = rng.integers(0, len(lengths), (B, N)).astype(np.int32)
    symbols = np.stack(
        [_random_symbols(rng, N, lengths, offsets, indexes[b], 40)
         for b in range(B)]
    )
    streams = encode_batch(symbols, indexes, cdfs, lengths, offsets)
    tables = EntropyTables(cdfs, lengths, offsets)
    lut = tables.symbol_lut()
    dec = BatchRansDecoder(streams)
    out = dec.decode_stream(indexes, cdfs, lengths, offsets, lut=lut)
    np.testing.assert_array_equal(out, symbols)


def test_selectable_coder_registry():
    """Reference surface (compressai/__init__.py:22-62): selectable coder
    backend; streams interchangeable across backends."""
    import icm_tpu
    from icm_tpu import coding

    avail = icm_tpu.available_entropy_coders()
    assert "rans-py" in avail
    orig = icm_tpu.get_entropy_coder()
    try:
        rng = np.random.default_rng(7)
        cdfs, lengths, offsets = _random_tables(rng)
        idx = rng.integers(0, len(lengths), 64).astype(np.int32)
        sym = _random_symbols(rng, 64, lengths, offsets, idx)

        icm_tpu.set_entropy_coder("rans-py")
        assert coding.get_entropy_coder() == "rans-py"
        assert not coding.native_available()  # py backend active
        s_py = RansEncoder().encode_with_indexes(sym, idx, cdfs, lengths, offsets)

        if "ans" in avail:  # native lib present: alias + cross-decode
            icm_tpu.set_entropy_coder("ans")
            assert coding.get_entropy_coder() == "rans"
            s_nat = RansEncoder().encode_with_indexes(
                sym, idx, cdfs, lengths, offsets
            )
            assert s_nat == s_py  # byte-identical backends
            dec = RansDecoder()
            out = dec.decode_with_indexes(s_py, idx, cdfs, lengths, offsets)
            np.testing.assert_array_equal(np.asarray(out), sym)

        with pytest.raises(ValueError):
            icm_tpu.set_entropy_coder("nope")
    finally:
        coding.set_entropy_coder(orig)
