"""Fully-factorized entropy bottleneck (Ballé et al., hyperprior z-channel).

Behavioral parity with the reference ``EntropyBottleneck`` (reference:
``compressai/entropy_models/entropy_models.py:293-522``): per-channel
monotone MLP density ``_logits_cumulative``, learned quantiles with an aux
loss pulling them to the tail-mass targets, noise/dequantize forward, and
``update()`` building per-channel quantized CDF tables.

TPU-native design notes:
- channel-last (NHWC) layout; the per-channel MLP is evaluated as batched
  einsums over all channels at once (the reference loops via batched
  matmul too, but permutes to channel-first).
- the density MLP is tiny (filters (3,3,3,3)) — XLA fuses the whole
  likelihood computation into a couple of kernels; no Pallas needed here.
- CDF table building samples the density on device but quantizes on host
  (`eb_build_tables`), since tables only feed the host rANS coder.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lower_bound
from .base import EntropyTables, pmf_to_cdf_rows, quantize


class EntropyBottleneck(nn.Module):
    channels: int
    tail_mass: float = 1e-9
    init_scale: float = 10.0
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    likelihood_bound: float = 1e-9

    def setup(self):
        dims = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        C = self.channels

        matrices, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            init = float(np.log(np.expm1(1.0 / scale / dims[i + 1])))
            matrices.append(
                self.param(
                    f"matrix{i}",
                    lambda rng, shape, v=init: jnp.full(shape, v, jnp.float32),
                    (C, dims[i + 1], dims[i]),
                )
            )
            biases.append(
                self.param(
                    f"bias{i}",
                    lambda rng, shape: jax.random.uniform(
                        rng, shape, jnp.float32, -0.5, 0.5
                    ),
                    (C, dims[i + 1], 1),
                )
            )
            if i < len(self.filters):
                factors.append(
                    self.param(
                        f"factor{i}",
                        lambda rng, shape: jnp.zeros(shape, jnp.float32),
                        (C, dims[i + 1], 1),
                    )
                )
        self._matrices, self._biases, self._factors = matrices, biases, factors

        self.quantiles = self.param(
            "quantiles",
            lambda rng, shape: jnp.tile(
                jnp.array([-self.init_scale, 0.0, self.init_scale], jnp.float32),
                (shape[0], 1, 1),
            ),
            (C, 1, 3),
        )

    # --- density -----------------------------------------------------------
    def _logits_cumulative(self, inputs, stop_gradient: bool):
        """inputs: (C, 1, N) -> logits of the cumulative density, same shape."""
        logits = inputs
        for i in range(len(self.filters) + 1):
            matrix = self._matrices[i]
            bias = self._biases[i]
            if stop_gradient:
                matrix = jax.lax.stop_gradient(matrix)
                bias = jax.lax.stop_gradient(bias)
            logits = jnp.einsum(
                "cij,cjn->cin", jax.nn.softplus(matrix), logits
            ) + bias
            if i < len(self.filters):
                factor = self._factors[i]
                if stop_gradient:
                    factor = jax.lax.stop_gradient(factor)
                logits = logits + jnp.tanh(factor) * jnp.tanh(logits)
        return logits

    def _likelihood(self, values):
        """values: (C, 1, N)."""
        lower = self._logits_cumulative(values - 0.5, stop_gradient=False)
        upper = self._logits_cumulative(values + 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        return jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower)
        )

    def medians(self):
        return self.quantiles[:, :, 1:2]

    # --- training forward --------------------------------------------------
    @nn.compact
    def __call__(self, x, training: bool = True):
        """x: (..., C) channel-last. Returns (x_tilde, likelihoods), same shape.

        Parity: reference ``EntropyBottleneck.forward``
        (``entropy_models.py:446-489``) with the NCHW→(C,1,N) permutation
        replaced by a channel-last reshape/transpose.
        """
        # entropy math stays at least f32 under any activation-dtype
        # policy (promote, don't downcast — f64 parity runs stay f64)
        x = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        in_shape = x.shape
        C = in_shape[-1]
        assert C == self.channels, (C, self.channels)
        # (..., C) -> (C, 1, N)
        values = jnp.moveaxis(x.reshape(-1, C), -1, 0)[:, None, :]

        medians = self.medians()
        if training:
            outputs = quantize(values, "noise", rng=self.make_rng("noise"))
        else:
            outputs = quantize(values, "dequantize", medians)

        likelihood = self._likelihood(outputs)
        if self.likelihood_bound > 0:
            likelihood = lower_bound(
                likelihood, jnp.asarray(self.likelihood_bound, likelihood.dtype)
            )

        # back to (..., C)
        outputs = jnp.moveaxis(outputs[:, 0, :], 0, -1).reshape(in_shape)
        likelihood = jnp.moveaxis(likelihood[:, 0, :], 0, -1).reshape(in_shape)
        return outputs, likelihood

    def aux_loss(self):
        """Quantile aux loss (reference ``EntropyBottleneck.loss``,
        ``entropy_models.py:395-398``)."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        t = float(np.log(2.0 / self.tail_mass - 1.0))
        target = jnp.array([-t, 0.0, t], jnp.float32)
        return jnp.abs(logits - target).sum()

    # --- table-building support (called under .apply) ----------------------
    def pmf_meta(self):
        """Jittable step 1: quantile-derived ranges (reference
        ``EntropyBottleneck.update``, entropy_models.py:354-374)."""
        q = self.quantiles
        medians = q[:, 0, 1]
        minima = jnp.clip(jnp.ceil(medians - q[:, 0, 0]).astype(jnp.int32), 0)
        maxima = jnp.clip(jnp.ceil(q[:, 0, 2] - medians).astype(jnp.int32), 0)
        offset = -minima
        pmf_start = medians - minima.astype(medians.dtype)
        pmf_length = maxima + minima + 1
        return pmf_start, pmf_length, offset

    def pmf_rows(self, pmf_start, max_length: int):
        """Jittable step 2 (static max_length): sample the density
        (reference entropy_models.py:376-388)."""
        samples = jnp.arange(max_length, dtype=jnp.float32)
        samples = samples[None, None, :] + pmf_start[:, None, None]
        lower = self._logits_cumulative(samples - 0.5, stop_gradient=True)
        upper = self._logits_cumulative(samples + 0.5, stop_gradient=True)
        sign = -jnp.sign(lower + upper)
        pmf = jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower)
        )[:, 0, :]
        tail_mass = (
            jax.nn.sigmoid(lower[:, 0, 0]) + jax.nn.sigmoid(-upper[:, 0, -1])
        )
        return pmf, tail_mass

    def pmf_data(self):
        """(pmf, tail_mass, pmf_length, offset) — eager convenience
        combining pmf_meta + pmf_rows."""
        pmf_start, pmf_length, offset = self.pmf_meta()
        max_length = int(jax.device_get(pmf_length.max()))
        pmf, tail_mass = self.pmf_rows(pmf_start, max_length)
        return pmf, tail_mass, pmf_length, offset


def eb_tables_from_pmf_data(pmf, tail_mass, pmf_length, offset, precision=16):
    """Quantize device-computed pmf rows into host CDF tables."""
    pmf = np.asarray(jax.device_get(pmf), np.float32)
    tail_mass = np.asarray(jax.device_get(tail_mass), np.float32)
    pmf_length = np.asarray(jax.device_get(pmf_length), np.int32)
    offset = np.asarray(jax.device_get(offset), np.int32)
    max_length = int(pmf_length.max())
    cdf = pmf_to_cdf_rows(pmf, tail_mass, pmf_length, max_length, precision)
    return EntropyTables(
        quantized_cdf=cdf,
        cdf_length=pmf_length + 2,
        offset=offset,
    )


def eb_build_tables(
    module: EntropyBottleneck, variables, precision: int = 16
) -> EntropyTables:
    """Host-side: build quantized CDF tables for the rANS coder."""
    pmf, tail_mass, pmf_length, offset = module.apply(
        variables, method=EntropyBottleneck.pmf_data
    )
    return eb_tables_from_pmf_data(pmf, tail_mass, pmf_length, offset, precision)
