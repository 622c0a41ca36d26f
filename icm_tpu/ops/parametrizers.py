"""Non-negative reparametrization used by GDN.

Behavioral parity with the reference ``NonNegativeParametrizer`` (reference:
``compressai/ops/parametrizers.py:23-49``): parameters are stored as
``v = sqrt(max(x + pedestal, pedestal))`` and decoded as
``lower_bound(v)**2 - pedestal`` with ``pedestal = reparam_offset**2`` and
``reparam_offset = 2**-18``. Keeps GDN's beta/gamma strictly positive with
stable gradients near zero.
"""

import jax.numpy as jnp

from .bound import lower_bound


class NonNegativeParametrizer:
    def __init__(self, minimum: float = 0.0, reparam_offset: float = 2 ** -18):
        self.minimum = float(minimum)
        self.reparam_offset = float(reparam_offset)
        self.pedestal = self.reparam_offset ** 2
        self._bound = (self.minimum + self.reparam_offset ** 2) ** 0.5

    def init(self, x):
        """Map an initial value into the reparametrized domain."""
        return jnp.sqrt(jnp.maximum(x + self.pedestal, self.pedestal))

    def __call__(self, x):
        out = lower_bound(x, jnp.asarray(self._bound, dtype=x.dtype))
        return out * out - self.pedestal
