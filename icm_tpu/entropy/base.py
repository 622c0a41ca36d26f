"""Shared entropy-model utilities.

Quantization semantics match the reference ``EntropyModel.quantize`` /
``dequantize`` (reference: ``compressai/entropy_models/entropy_models.py:
126-165``): three modes — additive uniform noise (training), round-to-mean
(dequantize) and integer symbols (coding).

CDF table construction matches the integer semantics of the reference
``_CXX.pmf_to_quantized_cdf`` (reference: ``setup.py:71-80``; the C++
source is not vendored there, only the prebuilt .so — the semantics are the
well-known CompressAI mass-stealing quantizer, reimplemented here from the
algorithm and verified by round-trip coding tests). The C++ fast path in
``icm_tpu/coding`` must produce byte-identical tables to
:func:`pmf_to_quantized_cdf_np`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EntropyTables:
    """Host-side quantized CDF tables consumed by the rANS coder.

    Mirrors the reference registered buffers ``_quantized_cdf`` (n, L+2),
    ``_cdf_length`` (n,), ``_offset`` (n,) (reference:
    ``entropy_models.py:97-100``).
    """

    quantized_cdf: np.ndarray  # int32 (n, max_length + 2)
    cdf_length: np.ndarray  # int32 (n,)
    offset: np.ndarray  # int32 (n,)

    @property
    def num_distributions(self) -> int:
        return int(self.quantized_cdf.shape[0])

    def symbol_lut(self, bucket_bits: int = 8) -> np.ndarray:
        """(n, 2**bucket_bits) uint16 bucket table for fast rANS decode:
        entry b holds the largest symbol s with cdf[s] <= (b << shift),
        where shift = 16 - bucket_bits; the decoder finishes with a short
        linear scan inside the (cache-resident) CDF row. A full 2**16
        direct LUT is 128KB/row and thrashes cache on random cum values;
        the 512B/row bucket table stays in L1. Built lazily and cached."""
        cached = getattr(self, "_lut_cache", None)
        if cached is not None:
            return cached
        n = self.num_distributions
        shift = 16 - bucket_bits
        starts = np.arange(1 << bucket_bits, dtype=np.int64) << shift
        lut = np.empty((n, 1 << bucket_bits), np.uint16)
        for i in range(n):
            L = int(self.cdf_length[i])
            row = self.quantized_cdf[i, :L].astype(np.int64)
            s = np.searchsorted(row, starts, side="right") - 1
            lut[i] = np.clip(s, 0, L - 2).astype(np.uint16)
        object.__setattr__(self, "_lut_cache", lut)
        return lut


def quantize(inputs, mode: str, means=None, *, rng=None):
    """Quantize latents. ``mode`` in {"noise", "dequantize", "symbols"}."""
    if mode == "noise":
        assert rng is not None, "noise mode requires an rng key"
        noise = jax.random.uniform(
            rng, inputs.shape, dtype=inputs.dtype, minval=-0.5, maxval=0.5
        )
        return inputs + noise
    outputs = inputs
    if means is not None:
        outputs = outputs - means
    outputs = jnp.round(outputs)
    if mode == "dequantize":
        if means is not None:
            outputs = outputs + means
        return outputs
    assert mode == "symbols", mode
    return outputs.astype(jnp.int32)


def dequantize(inputs, means=None, dtype=jnp.float32):
    if means is not None:
        return inputs.astype(means.dtype) + means
    return inputs.astype(dtype)


def pmf_to_quantized_cdf_np(pmf: np.ndarray, precision: int = 16) -> np.ndarray:
    """Quantize a float PMF into an integer CDF summing to ``1 << precision``.

    Vectorized single-row version; every interval is guaranteed non-zero
    width by stealing mass from the smallest stealable interval, matching
    the CompressAI C++ semantics the reference links against.
    """
    pmf = np.asarray(pmf, dtype=np.float32)
    if pmf.ndim != 1:
        raise ValueError("pmf must be 1-D")
    if np.any(pmf < 0) or not np.all(np.isfinite(pmf)):
        raise ValueError("Invalid pmf: negative or non-finite values")

    n = pmf.shape[0]
    cdf = np.zeros(n + 1, dtype=np.uint32)
    # round-half-away (C++ lround semantics; np.round would round half-even)
    freqs = np.floor(pmf.astype(np.float64) * (1 << precision) + 0.5).astype(
        np.uint32
    )
    cdf[1:] = freqs
    total = int(cdf.sum())
    if total == 0:
        raise ValueError("Invalid pmf: zero total mass")
    # renormalize to exactly 2**precision
    cdf = ((np.uint64(1 << precision) * cdf.astype(np.uint64)) // np.uint64(total)).astype(
        np.uint32
    )
    cdf = np.cumsum(cdf, dtype=np.uint32)
    cdf[-1] = 1 << precision

    # fix zero-width intervals by stealing from the smallest freq > 1
    for i in range(n):
        if cdf[i] == cdf[i + 1]:
            freqs_now = cdf[1:].astype(np.int64) - cdf[:-1].astype(np.int64)
            stealable = np.where(freqs_now > 1)[0]
            if stealable.size == 0:
                raise ValueError("Cannot normalize pmf: no stealable mass")
            best_steal = stealable[np.argmin(freqs_now[stealable])]
            if best_steal < i:
                cdf[best_steal + 1 : i + 1] -= 1
            else:
                cdf[i + 1 : best_steal + 1] += 1

    assert cdf[0] == 0 and cdf[-1] == (1 << precision)
    return cdf.astype(np.int32)


def pmf_to_cdf_rows(
    pmf: np.ndarray,
    tail_mass: np.ndarray,
    pmf_length: np.ndarray,
    max_length: int,
    precision: int = 16,
) -> np.ndarray:
    """Build a (n, max_length + 2) CDF table from per-row PMFs.

    Row ``i`` uses ``pmf[i, :pmf_length[i]]`` plus its tail mass as the
    final (bypass) symbol; mirrors the reference ``EntropyModel._pmf_to_cdf``
    (reference: ``entropy_models.py:172-180``).
    """
    from ..coding import pmf_to_quantized_cdf_rows as _native_rows

    native = _native_rows(pmf, tail_mass, pmf_length, precision)
    if native is not None:
        return native

    n = pmf.shape[0]
    cdf = np.zeros((n, max_length + 2), dtype=np.int32)
    for i in range(n):
        L = int(pmf_length[i])
        prob = np.concatenate([pmf[i, :L], np.atleast_1d(tail_mass[i])])
        row = pmf_to_quantized_cdf_np(prob, precision)
        cdf[i, : row.shape[0]] = row
    return cdf
