"""On-device lane-parallel rANS: roundtrip identity, numpy-oracle
byte-equality, escape side channel, stream continuation across calls.

The device wire is this framework's own format (the host coder keeps the
reference-interoperable one); correctness contract is encode->decode
identity plus exact agreement with the scalar numpy mirror.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icm_tpu.coding.device_rans import (
    assemble_streams,
    build_device_tables,
    decode_lanes,
    encode_lanes,
    fix_escapes,
    lane_offsets,
    np_encode,
)
from icm_tpu.entropy import EntropyTables
from icm_tpu.entropy.base import pmf_to_quantized_cdf_np


def _random_tables(rng, n_rows=7, max_support=19):
    """EntropyTables with random row lengths/shapes incl. tiny rows."""
    max_len = max_support + 2
    cdf = np.zeros((n_rows, max_len), np.int32)
    lengths = np.zeros(n_rows, np.int32)
    offsets = np.zeros(n_rows, np.int32)
    for r in range(n_rows):
        support = int(rng.integers(1, max_support))
        pmf = rng.random(support).astype(np.float32) + 1e-3
        pmf = pmf / pmf.sum() * (1.0 - 2 ** -8)
        tail = 1.0 - pmf.sum()
        row = pmf_to_quantized_cdf_np(
            np.concatenate([pmf, [tail]]).astype(np.float32)
        )
        cdf[r, : row.shape[0]] = row
        lengths[r] = row.shape[0]
        offsets[r] = int(rng.integers(-9, 3))
    return EntropyTables(
        quantized_cdf=cdf, cdf_length=lengths, offset=offsets
    )


@pytest.fixture(scope="module")
def tables():
    rng = np.random.default_rng(0)
    host = _random_tables(rng)
    return host, build_device_tables(host)


def _random_payload(rng, T, lanes, host, esc_frac=0.1):
    """(values, rows) with ~esc_frac escapes (values outside row support)."""
    n = host.num_distributions
    rows = rng.integers(0, n, size=(T, lanes)).astype(np.int32)
    lens = host.cdf_length[rows] - 2  # coded support size per element
    offs = host.offset[rows]
    u = rng.integers(0, 1 << 16, size=(T, lanes)) % np.maximum(lens, 1)
    values = (u + offs).astype(np.int32)
    esc = rng.random((T, lanes)) < esc_frac
    wild = rng.integers(-(1 << 20), 1 << 20, size=(T, lanes)).astype(np.int32)
    values = np.where(esc, offs + lens + wild, values)
    return values, rows


def _encode(values, rows, dev):
    """encode_lanes + host assembly -> (words i32 dev, off dev, dest, raw)."""
    buf, lengths, dest, raw, n_esc = jax.jit(
        lambda v, r: encode_lanes(v, r, dev)
    )(jnp.asarray(values), jnp.asarray(rows))
    ne = int(jax.device_get(n_esc))
    words = assemble_streams(np.asarray(buf), np.asarray(lengths))
    off = lane_offsets(np.asarray(lengths))
    return (
        jnp.asarray(words.astype(np.int32)),
        jnp.asarray(off),
        jnp.asarray(np.asarray(dest[:ne])),
        jnp.asarray(np.asarray(raw[:ne])),
        np.asarray(lengths),
    )


def _roundtrip(values, rows, dev):
    words, off, dest, raw, _ = _encode(values, rows, dev)
    out, _, _ = jax.jit(lambda w, o, r: decode_lanes(w, o, r, dev))(
        words, off, jnp.asarray(rows)
    )
    return np.asarray(fix_escapes(out, dest, raw))


class TestRoundtrip:
    def test_identity(self, tables):
        host, dev = tables
        rng = np.random.default_rng(1)
        values, rows = _random_payload(rng, 23, 17, host)
        np.testing.assert_array_equal(_roundtrip(values, rows, dev), values)

    def test_no_escapes(self, tables):
        host, dev = tables
        rng = np.random.default_rng(2)
        values, rows = _random_payload(rng, 31, 5, host, esc_frac=0.0)
        np.testing.assert_array_equal(_roundtrip(values, rows, dev), values)

    def test_all_escapes_int32_extremes(self, tables):
        host, dev = tables
        rng = np.random.default_rng(3)
        T, lanes = 9, 4
        rows = rng.integers(0, host.num_distributions, (T, lanes)).astype(
            np.int32
        )
        values = rng.choice(
            np.array(
                [2 ** 31 - 1, -(2 ** 31), 2 ** 20, -12345678], np.int64
            ),
            size=(T, lanes),
        ).astype(np.int32)
        np.testing.assert_array_equal(_roundtrip(values, rows, dev), values)

    def test_matches_numpy_oracle_bytes(self, tables):
        """Device emissions + side channel byte-identical to the mirror."""
        host, dev = tables
        rng = np.random.default_rng(4)
        values, rows = _random_payload(rng, 13, 6, host, esc_frac=0.2)
        words, off, dest, raw, lengths = _encode(values, rows, dev)
        ref_words, ref_lengths, ref_dest, ref_raw = np_encode(
            values, rows, host
        )
        np.testing.assert_array_equal(lengths, ref_lengths)
        np.testing.assert_array_equal(
            np.asarray(words).astype(np.uint16), ref_words
        )
        np.testing.assert_array_equal(np.asarray(dest), ref_dest)
        np.testing.assert_array_equal(np.asarray(raw), ref_raw)

    def test_continuation_across_calls(self, tables):
        """Decoding T symbols in two chunks threads (state, ptr) exactly:
        the ChARM slice loop continues each lane's stream per slice."""
        host, dev = tables
        rng = np.random.default_rng(5)
        T, lanes = 20, 3
        values, rows = _random_payload(rng, T, lanes, host)
        words, off, dest, raw, _ = _encode(values, rows, dev)
        dest_h = np.asarray(dest)
        raw_h = np.asarray(raw)
        cut = 8 * lanes
        sel = dest_h < cut
        out1, st, ptr = decode_lanes(words, off, jnp.asarray(rows[:8]), dev)
        out1 = fix_escapes(
            out1, jnp.asarray(dest_h[sel]), jnp.asarray(raw_h[sel])
        )
        out2, _, _ = decode_lanes(
            words, off, jnp.asarray(rows[8:]), dev, state=st, ptr=ptr
        )
        out2 = fix_escapes(
            out2, jnp.asarray(dest_h[~sel] - cut), jnp.asarray(raw_h[~sel])
        )
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(out1), np.asarray(out2)]), values
        )

    def test_rate_efficiency(self, tables):
        """In-range symbols cost close to their entropy (sanity: the coder
        actually compresses; 16 bits/sym would mean raw passthrough)."""
        host, dev = tables
        rng = np.random.default_rng(6)
        T, lanes = 512, 8
        # concentrate on symbol 0 of row 0 -> low entropy stream
        rows = np.zeros((T, lanes), np.int32)
        base = int(host.offset[0])
        values = np.full((T, lanes), base, np.int32)
        spice = rng.random((T, lanes)) < 0.05
        values = np.where(spice, base + 1, values)
        _, _, _, _, lengths = _encode(values, rows, dev)
        cdf = host.quantized_cdf[0]
        p0 = (cdf[1] - cdf[0]) / 65536.0
        p1 = (cdf[2] - cdf[1]) / 65536.0
        ideal_bits = T * -(0.95 * np.log2(p0) + 0.05 * np.log2(p1))
        actual_bits = float(lengths.mean() - 2) * 16
        assert actual_bits < ideal_bits * 1.35 + 64
