"""Compression model base: the ChARM coding protocol.

Parity with the reference ``CompressionModel`` (reference:
``compressai/models/base.py:6-70``) plus a unification the reference never
made: every codec in the family (cnn, stf, stf5..stf8, the CRC/ICM models)
runs the same autoregressive loop —

    y, z = analyze(x);  z_hat = STE(z)
    state = ctx_prepare(z_hat)            # hyper synthesis (+ zigzag split)
    for i in slices:                      # channel or zigzag order
        mu, scale = slice_context(i, state, support(i, decoded))
        code y_i | refine with LRP
    x_hat = synthesize(assemble(decoded))

The reference re-implements this loop inline in every model file
(``cnn.py:141-189``, ``stf.py:582-670``, ``stf6.py:763-880``, ...); here it
is written ONCE (``__call__`` below for training/entropy-estimation, and
``codec.CharmCodec`` for the real-bitstream path) and models supply the
protocol methods. Because forward and coder share the same per-slice
functions, the encoder/decoder context replication needed for bitexact
AR decoding holds by construction.

In this functional framework the CDF tables are *not* module buffers —
``codec.build_codec_tables`` returns a host-side ``CodecTables`` bundle
consumed by compress/decompress (the rANS coder runs on host; tables never
enter the jitted graph).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..entropy import EntropyTables
from ..ops import ste_round


@dataclasses.dataclass(frozen=True)
class CodecTables:
    """Host-side coder state built by ``build_codec_tables``.

    Mirrors the reference's post-training ``update()`` products
    (``_quantized_cdf``/``_cdf_length``/``_offset`` buffers + scale table,
    reference ``entropy_models.py:97-100``, ``cnn.py:133-138``).
    """

    gaussian: Optional[EntropyTables]
    scale_table: Optional[np.ndarray]
    bottlenecks: Dict[str, EntropyTables]


class CompressionModel(nn.Module):
    """Base class; subclasses implement the ChARM protocol:

    - ``analyze(x, training=False) -> (y, z)``
    - ``synthesize(y_hat, training=False) -> x_hat``
    - ``ctx_prepare(z_hat) -> state`` (pytree; jittable)
    - ``latent_slices(y) -> [y_slice]`` (jittable)
    - ``ctx_slices -> int`` (static count of AR steps)
    - ``ctx_support(i, decoded: list) -> list`` (pure python windowing)
    - ``slice_context(i, state, support) -> (mu, scale, mean_support)``
    - ``slice_lrp(i, mean_support, y_hat_slice) -> lrp``
    - ``ctx_assemble([y_hat_slice]) -> y_hat``
    - ``eb_medians() -> (C,)``; ``eb_pmf_data() -> {name: pmf tuple}``

    plus ``entropy_bottleneck`` / ``gaussian_conditional`` submodules.
    """

    def __call__(self, x, training: bool = True):
        y, z = self.analyze(x, training=training)
        _, z_likelihoods = self.entropy_bottleneck(z, training=training)

        # STE-rounded z for the hyper path (reference cnn.py:150-152)
        z_offset = self.eb_medians()
        z_hat = ste_round(z - z_offset) + z_offset

        state = self.ctx_prepare(z_hat)
        y_slices = self.latent_slices(y)
        y_hat_slices: List[Any] = []
        y_likelihood = []
        for i in range(self.ctx_slices):
            support = self.ctx_support(i, y_hat_slices)
            mu, scale, mean_support = self.slice_context(i, state, support)
            _, lik = self.gaussian_conditional(
                y_slices[i], scale, mu, training=training
            )
            y_likelihood.append(lik)
            y_hat_slice = ste_round(y_slices[i] - mu) + mu
            y_hat_slice = y_hat_slice + self.slice_lrp(i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        y_hat = self.ctx_assemble(y_hat_slices)
        y_likelihoods = jnp.concatenate(y_likelihood, axis=-1)
        x_hat = self.synthesize(y_hat, training=training)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }

    # --- defaults shared by the whole family -------------------------------
    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    def eb_medians(self):
        return self.entropy_bottleneck.medians()[:, 0, 0]

    def eb_dict(self):
        """name -> EntropyBottleneck submodule (override in multi-layer
        models)."""
        return {"entropy_bottleneck": self.entropy_bottleneck}

    def eb_pmf_data(self):
        return {k: m.pmf_data() for k, m in self.eb_dict().items()}

    def eb_pmf_meta(self):
        """Jittable: {name: (pmf_start, pmf_length, offset)}."""
        return {k: m.pmf_meta() for k, m in self.eb_dict().items()}

    def eb_pmf_rows(self, starts: dict, max_lengths: dict):
        """Jittable (static max_lengths): {name: (pmf, tail_mass)}."""
        return {
            k: m.pmf_rows(starts[k], max_lengths[k])
            for k, m in self.eb_dict().items()
        }


def prefix_support(max_support: int):
    """First-K support (reference cnn.py:162: ``y_hat_slices[:K]``;
    K < 0 means all)."""

    def fn(i: int, decoded: list) -> list:
        return decoded if max_support < 0 else decoded[:max_support]

    return fn


def sliding_support(max_support: int):
    """Last-K sliding window (reference stf6.py:806:
    ``decoded if K > i else decoded[i-K:]``)."""

    def fn(i: int, decoded: list) -> list:
        return decoded if max_support > i else decoded[i - max_support :]

    return fn


def fetch_params(tree):
    """One batched host fetch of a parameter subtree.

    The stack/unstack param-migration helpers (zigzag_coder.py, cnn.py,
    stf_family.py) do their reshaping in numpy; calling ``np.asarray``
    leaf-by-leaf on device arrays pays one *serial* device->host round
    trip per parameter, which on a remote-TPU link dominates codec
    construction (measured 184-212 s per ZigzagScanWire for stf13 —
    NOTES_ROUND4.md). ``jax.device_get`` issues async copies for every
    leaf before blocking, so the link round trip is paid once for the
    whole subtree. Host-resident trees pass through unchanged.
    """
    import jax

    return jax.device_get(tree)
