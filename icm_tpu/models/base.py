"""Compression model base.

Parity with the reference ``CompressionModel`` (reference:
``compressai/models/base.py:6-70``): aggregates entropy-bottleneck aux
losses and rebuilds CDF tables post-training. In this functional framework
the CDF tables are *not* module buffers — ``update()`` returns a host-side
``CodecTables`` bundle consumed by compress/decompress (the rANS coder runs
on host; tables never enter the jitted graph).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import flax.linen as nn
import numpy as np

from ..entropy import EntropyTables


@dataclasses.dataclass(frozen=True)
class CodecTables:
    """Host-side coder state built by ``update()``.

    ``gaussian``: tables for the (shared) GaussianConditional, plus its
    scale table. ``bottlenecks``: name -> tables for each EntropyBottleneck.
    """

    gaussian: Optional[EntropyTables]
    scale_table: Optional[np.ndarray]
    bottlenecks: Dict[str, EntropyTables]


class CompressionModel(nn.Module):
    """Base class for all codecs.

    Subclasses define ``__call__`` returning
    ``{"x_hat": ..., "likelihoods": {"y": ..., "z": ...}}`` and an
    ``aux_loss`` method summing their EntropyBottlenecks' quantile losses.
    """

    def aux_loss(self):  # pragma: no cover - overridden
        raise NotImplementedError
