"""Conditional Gaussian entropy model (mean/scale hyperprior).

Behavioral parity with the reference ``GaussianConditional`` (reference:
``compressai/entropy_models/entropy_models.py:525-666``): erfc-based
standardized cumulative, scale lower bound 0.11, log-spaced 64-level scale
table (reference ``cnn.py:14-20``), scale-bucketed index building, and
``update()`` building per-scale-level CDF tables.

TPU-native notes: the module is stateless (no params); likelihoods are pure
elementwise math that XLA fuses into the surrounding graph. ``build_indexes``
uses a vectorized searchsorted instead of the reference's per-level loop.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import scipy.special
import scipy.stats

from ..ops import lower_bound
from .base import EntropyTables, pmf_to_cdf_rows, quantize

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def get_scale_table(
    min_scale: float = SCALES_MIN,
    max_scale: float = SCALES_MAX,
    levels: int = SCALES_LEVELS,
) -> np.ndarray:
    """Log-spaced scale table (reference ``cnn.py:19-20``)."""
    return np.exp(
        np.linspace(math.log(min_scale), math.log(max_scale), levels)
    ).astype(np.float32)


def _standardized_cumulative(x):
    # 0.5 * erfc(-x / sqrt(2)); erfc maximizes numerical precision
    return 0.5 * jax.lax.erfc(-(2 ** -0.5) * x)


class GaussianConditional(nn.Module):
    scale_bound: float = 0.11
    tail_mass: float = 1e-9
    likelihood_bound: float = 1e-9

    def _likelihood(self, inputs, scales, means=None):
        values = inputs - means if means is not None else inputs
        scales = lower_bound(scales, jnp.asarray(self.scale_bound, scales.dtype))
        values = jnp.abs(values)
        upper = _standardized_cumulative((0.5 - values) / scales)
        lower = _standardized_cumulative((-0.5 - values) / scales)
        return upper - lower

    @nn.compact
    def __call__(self, inputs, scales, means=None, training: bool = True):
        # entropy math stays at least f32 under any activation-dtype
        # policy (promote, don't downcast — f64 parity runs stay f64)
        dt = jnp.promote_types(inputs.dtype, jnp.float32)
        inputs = inputs.astype(dt)
        scales = scales.astype(dt)
        if means is not None:
            means = means.astype(dt)
        if training:
            outputs = quantize(inputs, "noise", rng=self.make_rng("noise"))
        else:
            outputs = quantize(inputs, "dequantize", means)
        likelihood = self._likelihood(outputs, scales, means)
        if self.likelihood_bound > 0:
            likelihood = lower_bound(
                likelihood, jnp.asarray(self.likelihood_bound, likelihood.dtype)
            )
        return outputs, likelihood


def build_indexes(scales, scale_table, scale_bound: float = SCALES_MIN):
    """Bucket scales into scale-table indexes (vectorized).

    Parity: reference ``GaussianConditional.build_indexes``
    (``entropy_models.py:661-666``): index = number of table entries
    (excluding the last) strictly below the bounded scale.
    """
    scale_table = jnp.asarray(scale_table)
    scales = jnp.maximum(scales, jnp.asarray(scale_bound, scales.dtype))
    # reference: start at len-1, subtract 1 for each table[:-1] >= scale.
    # method='compare_all': the default 'scan' lowers to an XLA while loop
    # that measured 51 ms per 1M-element call on TPU v5e (it was the
    # single largest op in the AR decode timeline); the broadcast compare
    # against this 63-entry table is ~0.5 ms for the same shapes.
    return jnp.searchsorted(
        scale_table[:-1], scales, side="left", method="compare_all"
    ).astype(jnp.int32)


def gc_build_tables(
    scale_table: np.ndarray, tail_mass: float = 1e-9, precision: int = 16
) -> EntropyTables:
    """Host-side: build per-scale-level CDF tables.

    Parity: reference ``GaussianConditional.update``
    (``entropy_models.py:599-624``).
    """
    scale_table = np.asarray(scale_table, np.float64)
    multiplier = -scipy.stats.norm.ppf(tail_mass / 2)
    pmf_center = np.ceil(scale_table * multiplier).astype(np.int32)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    samples = np.abs(
        np.arange(max_length, dtype=np.int32)[None, :] - pmf_center[:, None]
    ).astype(np.float32)
    samples_scale = scale_table.astype(np.float32)[:, None]

    def std_cum(x):
        return 0.5 * scipy.special.erfc(-(2 ** -0.5) * x)

    upper = std_cum((0.5 - samples) / samples_scale)
    lower = std_cum((-0.5 - samples) / samples_scale)
    pmf = (upper - lower).astype(np.float32)
    tail = (2 * lower[:, 0]).astype(np.float32)

    cdf = pmf_to_cdf_rows(pmf, tail, pmf_length, max_length, precision)
    return EntropyTables(
        quantized_cdf=cdf,
        cdf_length=(pmf_length + 2).astype(np.int32),
        offset=(-pmf_center).astype(np.int32),
    )
